package graft.ops

import graft.olist.SparkTestBase

/** Round-5 batch L: CMS width/accuracy curve, Zipf fit. */
class Round5lOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-cms-width-curve: overestimate is monotone non-increasing in width, never negative") {
    val rows = run("agg-cms-width-curve").collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(16L, 64L, 256L))
    rows.foreach { r =>
      assert(r.getLong(4) >= 0, "CMS never underestimates")
      assert(r.getLong(3) <= r.getLong(2), "n_over bounded by n_keys")
    }
    val avg = rows.map(_.getLong(5))
    assert(avg(0) >= avg(1) && avg(1) >= avg(2), s"wider sketch must not be less accurate: $avg")
    // with so few keys that even w=16 is collision-free the curve is flat zero;
    // otherwise it must actually fall across the 16x width step
    if (avg(0) > 0) assert(avg(0) > avg(2), "curve must actually fall across 16x width")
    // same key population measured at every width
    assert(rows.map(_.getLong(2)).distinct.length == 1)
  }

  test("text-zipf-fit: frequency ranking yields a non-positive slope and sane r2") {
    val r = run("text-zipf-fit").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(0) >= 10, "enough ranked terms to fit")
    assert(row.getLong(1) > 0 && row.getLong(2) > 0)
    assert(row.getLong(0) <= row.getLong(2), "fit frame bounded by vocabulary")
    assert(row.getLong(3) <= 0, "frequency must not increase with rank")
    assert(row.getLong(5) >= 0 && row.getLong(5) <= 1000, "r2 in [0,1]")
  }
}
