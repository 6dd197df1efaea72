package graft.ops

import graft.olist.SparkTestBase

/** Round-6 batch F: temperature mixing, binary retrieval, shard index. */
class Round6fOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("text-temperature-mix: each temperature's allocation sums exactly to the budget and flattens with alpha") {
    val rows = run("text-temperature-mix").collect()
    val byAlpha = rows.groupBy(_.getString(0))
    assert(byAlpha.keySet == Set("0.25", "0.50", "1.00"))
    byAlpha.foreach { case (alpha, rs) =>
      assert(rs.map(_.getLong(4)).sum == 100000L,
        s"alpha=$alpha Hamilton allocation must sum exactly to the budget")
    }
    // flattening: lower temperature narrows the allocation spread
    def spread(alpha: String): Long = {
      val allocs = byAlpha(alpha).map(_.getLong(4))
      allocs.max - allocs.min
    }
    assert(spread("0.25") <= spread("0.50") && spread("0.50") <= spread("1.00"),
      s"allocation spread must shrink as alpha drops: ${spread("0.25")}, ${spread("0.50")}, ${spread("1.00")}")
  }

  test("emb-binary-retrieval: hamming top-3 graded against exact cosine per query") {
    val rows = run("emb-binary-retrieval").collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L until 10L), "one row per query")
    rows.foreach { r =>
      assert(r.getLong(1) == 3L, "hamming shortlist is exactly top-3")
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 3, "matches bounded by k")
      assert(r.getLong(3) == r.getLong(2) * 1000000L / 3, "recall is the exact integer ratio")
    }
  }

  test("mm-shard-index: every probed offset round-trips byte-identically") {
    val rows = run("mm-shard-index").collect()
    assert(rows.nonEmpty, "probe set must not be empty")
    rows.foreach { r =>
      assert(r.getInt(4) == 1,
        s"random access via (shard ${r.getLong(1)}, offset ${r.getLong(2)}) must reproduce doc ${r.getLong(0)}")
      assert(r.getLong(2) >= 0 && r.getLong(2) < 40000,
        "offset is shard-relative (a doc can straddle past one boundary, never two)")
    }
  }
}
