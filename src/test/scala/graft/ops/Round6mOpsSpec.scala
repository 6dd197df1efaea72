package graft.ops

import graft.olist.SparkTestBase

/** Round-6 batch M: energy distance, dedup PRF eval. */
class Round6mOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("emb-energy-distance: clustered labels separate, isotropic labels do not") {
    val rows = run("emb-energy-distance").collect()
    val byDs = rows.map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(byDs.keySet == Set("clustered", "isotropic"))
    assert(byDs("clustered") > 100 * math.max(1L, math.abs(byDs("isotropic"))),
      s"clustered energy must dwarf isotropic: $byDs")
    rows.foreach { r =>
      assert(r.getLong(4) == r.getLong(1) * 2 - r.getLong(2) - r.getLong(3),
        "energy is the exact integer combination of the three means")
      assert(r.getLong(1) > 0 && r.getLong(2) > 0 && r.getLong(3) > 0)
    }
  }

  test("dedup-eval-prf: counts reconcile and ratios are exact") {
    val rows = run("dedup-eval-prf").collect()
    assert(rows.length == 1)
    val r = rows.head
    val (nT, nP, tp, fp, fn) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(tp + fn == nT, "truth = TP + FN")
    assert(tp + fp == nP, "pred = TP + FP")
    val (p, rec, f1) = (r.getLong(5), r.getLong(6), r.getLong(7))
    assert(p == (if (nP == 0) 0 else tp * 1000 / nP))
    assert(rec == (if (nT == 0) 0 else tp * 1000 / nT))
    assert(f1 == (if (p + rec == 0) 0 else 2 * p * rec / (p + rec)))
    assert(nT > 0, "fixture must contain true near-dup pairs")
  }
}
