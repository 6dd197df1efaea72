package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for batch Y (cache table, moving median). */
class Round4aeOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("sql-cache-table: the cached relation scans in-memory") {
    val df = run("sql-cache-table")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("InMemoryRelation"))
    assert(df.count() > 0)
    spark.sql("UNCACHE TABLE IF EXISTS graft_cached_rev")
  }

  test("win-moving-median: median is a member of its 7-frame, robust to one spike") {
    val got = run("win-moving-median").cache()
    assert(got.count() > 0)
    // median of centi-values stays inside the global value envelope
    assert(got.filter(col("med7_cents") < 1 || col("med7_cents") > 4910000L).count() == 0)
  }
}
