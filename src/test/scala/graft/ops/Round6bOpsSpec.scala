package graft.ops

import graft.olist.SparkTestBase

/** Round-6 batch B: DotProductRewrite exercised by a graded query, and
  * audit-log compaction. */
class Round6bOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("emb-plane-projection: DotProductRewrite fires — codegen dot_product in the plan, no interpreted fold") {
    val df = run("emb-plane-projection")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("dot_product("),
      s"optimizer must rewrite the HOF fold to the native DotProduct expression:\n$optimized")
    assert(!optimized.contains("zip_with"),
      "no interpreted zip_with/aggregate fold may survive the rewrite")
    // and the rewritten expression reaches the PHYSICAL plan (pre-AQE
    // initial plan text — query stages don't re-print expressions)
    val physical = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(physical.contains("dot_product("),
      "the codegen DotProduct node must be what executes")
  }

  test("emb-plane-projection: plane histogram is consistent") {
    val rows = run("emb-plane-projection").collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L to 3L), "one row per plane")
    val n = graft.ops.Tables.embeddings(spark, sf).count()
    rows.foreach { r =>
      val (pos, neg) = (r.getLong(1), r.getLong(2))
      assert(pos + neg <= n, "signs partition the corpus (zeros allowed out)")
      assert(pos > 0 && neg > 0, s"plane ${r.getLong(0)} must actually split the corpus")
    }
  }

  test("sink-audit-compact: latest state per table, in-flight run not resurrected") {
    val rows = run("sink-audit-compact").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4)))
    assert(rows.toSeq == Seq(
      ("customer", 3L, "SUCCESS", Some(3008L), 5L),
      ("lineitem", 3L, "STARTED", None, 4L),
      ("orders", 3L, "FAILED", None, 5L)),
      s"compacted snapshot must keep the latest run's state verbatim, got ${rows.toSeq}")
  }
}
