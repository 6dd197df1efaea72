package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for batch Z (cohort LTV, semi/anti syntax,
  * interval merge). */
class Round4afOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-cohort-ltv: cumulative LTV is monotone within each cohort") {
    val got = run("agg-cohort-ltv").cache()
    assert(got.count() > 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("cohort").orderBy("age")
    val bad = got.withColumn("prev", lag("cum_cents", 1).over(w))
      .filter(col("prev").isNotNull && col("cum_cents") < col("prev"))
    assert(bad.count() == 0)
  }

  test("sql-semi-anti: the two halves partition the customer base") {
    val got = run("sql-semi-anti").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = Tables.customer(spark, sf).count()
    assert(got("has_urgent") + got("no_urgent") == total)
  }

  test("win-interval-merge: episodes never overlap within a customer") {
    val got = run("win-interval-merge").cache()
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy("ep")
    val bad = got.withColumn("prev_end", lag("episode_end", 1).over(w))
      .filter(col("prev_end").isNotNull && col("episode_start") <= col("prev_end"))
    assert(bad.count() == 0)
    // episodes cover every order exactly once
    val n = got.agg(sum("n_orders")).collect()(0).getLong(0)
    assert(n == Tables.orders(spark, sf).count())
  }
}
