package graft.ops

import graft.olist.SparkTestBase

/** Round-6 batch J: Hilbert layout, KS drift, partition evolution. */
class Round6jOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("sort-hilbert-vs-zorder: Hilbert's locality invariants hold exactly") {
    val rows = run("sort-hilbert-vs-zorder").collect()
    val byOrd = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(byOrd.keySet == Set("hilbert", "zorder"))
    // the defining Hilbert property: every consecutive cell is adjacent
    assert(byOrd("hilbert")._1 == 255L && byOrd("hilbert")._2 == 1L,
      s"hilbert must step distance exactly 1 through all 256 cells, got ${byOrd("hilbert")}")
    assert(byOrd("zorder")._1 > byOrd("hilbert")._1,
      "z-order must pay more total distance than hilbert")
    assert(byOrd("zorder")._2 > 1, "z-order has jump discontinuities")
    rows.foreach(r => assert(r.getLong(3) == 16, "the 4x4 probe box has 16 cells"))
  }

  test("dq-ks-drift: KS distance is a valid statistic with a threshold verdict") {
    val rows = run("dq-ks-drift").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    val ks = r.getLong(2)
    assert(ks >= 0 && ks <= 1000000L, "D in [0,1] ppm")
    assert(r.getString(3) == (if (ks > 100000) "DRIFT" else "SAME"),
      "verdict must follow the emitted statistic")
  }

  test("sink-partition-evolution: epochs partition disjointly, blended read covers both") {
    val rows = run("sink-partition-evolution").collect()
    val byEpoch = rows.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byEpoch.keySet ==
      Set("epoch1_by_month", "epoch2_by_year", "blended_by_month"))
    val (p1, n1) = byEpoch("epoch1_by_month")
    val (p2, n2) = byEpoch("epoch2_by_year")
    val (pb, nb) = byEpoch("blended_by_month")
    assert(nb == n1 + n2, "the normalized union must serve every row of both epochs")
    assert(p1 > p2, "month partitioning is finer than year partitioning")
    assert(pb >= p1, "blended month count covers at least epoch1's months")
  }
}
