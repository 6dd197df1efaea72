package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for batch W (CLUSTER BY, KPI panel, churn,
  * stickiness). */
class Round4acOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("sql-cluster-by: DISTRIBUTE BY lands as RepartitionByExpression in the plan") {
    val df = run("sql-cluster-by")
    val analyzed = df.queryExecution.analyzed.toString
    assert(analyzed.contains("RepartitionByExpression"))
    assert(df.count() > 0)
  }

  test("agg-kpi-panel: ratios consistent with their own numerators") {
    val r = run("agg-kpi-panel").collect()(0)
    val (no, nc, rev, ni) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(r.getLong(4) == rev / no)
    assert(r.getLong(5) == ni * 1000000L / no)
    assert(r.getLong(6) == rev / nc)
  }

  test("agg-churn: churned never exceeds active, final month churns fully") {
    val got = run("agg-churn").collect()
    got.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
    // the last month has no successor: everyone churns by definition
    assert(got.last.getLong(3) == 1000000L)
  }

  test("agg-stickiness: ratio in (0, 1e6], MAU >= any day's DAU") {
    val got = run("agg-stickiness").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(4) > 0 && r.getLong(4) <= 1000000L)
      assert(r.getLong(3) <= r.getLong(1)) // mau <= sum_dau (users recur)
    }
  }
}
