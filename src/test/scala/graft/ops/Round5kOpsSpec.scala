package graft.ops

import graft.olist.SparkTestBase

/** Round-5 batch K: KMV theta-sketch set algebra, Z-order layout. */
class Round5kOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-kmv-intersect: estimates bracket exacts, identities hold") {
    val r = run("agg-kmv-intersect").collect()
    assert(r.length == 1)
    val row = r.head
    val (exactA, estA) = (row.getLong(1), row.getLong(2))
    val (exactU, estU) = (row.getLong(5), row.getLong(6))
    val (exactI, estI) = (row.getLong(7), row.getLong(8))
    assert(exactI == exactA + row.getLong(3) - exactU, "inclusion-exclusion on exacts")
    assert(estA >= (exactA * 4) / 10 && estA <= exactA * 5 / 2, s"est_a $estA vs $exactA")
    assert(estU >= (exactU * 4) / 10 && estU <= exactU * 5 / 2, s"est_u $estU vs $exactU")
    if (exactI >= 64)
      assert(estI >= exactI / 5 && estI <= exactI * 3, s"est_i $estI vs $exactI")
    assert(estU >= estA.min(row.getLong(4)), "union estimate >= max audience estimate floor")
  }

  test("sink-zorder-layout: z-order bounds both dims, linear leaves one unpruned") {
    val rows = run("sink-zorder-layout").collect()
    assert(rows.nonEmpty)
    val byLayout = rows.groupBy(_.getString(0))
    assert(byLayout.keySet == Set("zorder", "linear"))
    // coverage: both layouts partition the same rowset
    val nLin = byLayout("linear").map(_.getLong(2)).sum
    val nZ = byLayout("zorder").map(_.getLong(2)).sum
    assert(nLin == nZ && nZ == Tables.lineitem(spark, sf).count())
    rows.foreach { r =>
      assert(r.getLong(3) >= 0 && r.getLong(4) <= 255, "gx in bucket range")
      assert(r.getLong(6) >= 0 && r.getLong(7) <= 255, "gy in bucket range")
    }
    def avgSpan(layout: String, idx: Int) = {
      val rs = byLayout(layout); rs.map(_.getLong(idx)).sum.toDouble / rs.length
    }
    // linear layout prunes gx hard but leaves gy at (nearly) full span;
    // z-order bounds BOTH dimensions well below full span
    assert(avgSpan("linear", 8) > 200, "linear leaves gy unpruned")
    assert(avgSpan("zorder", 8) < 130, "zorder bounds gy per file")
    assert(avgSpan("zorder", 5) < 130, "zorder bounds gx per file")
  }
}
