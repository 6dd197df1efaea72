package graft.functions

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** The custom typed Aggregator must match a decimal-cast sum exactly and
  * ignore nulls like SQL SUM. */
class CentsSumSpec extends SparkTestBase {

  test("cents_sum equals decimal sum and skips nulls") {
    CentsSum.register(spark)
    import spark.implicits._
    val df = Seq[java.lang.Double](1.005, 2.994999, null, -0.01, 185.22)
      .toDF("v")
    val got = df.agg(expr("cents_sum(v)").as("s")).head.getDouble(0)
    val want = df.agg(sum(col("v").cast("decimal(18,2)")).cast("double")).head.getDouble(0)
    assert(got == want, s"$got != $want")
  }

  test("merge order cannot change the result (repartition sweep)") {
    CentsSum.register(spark)
    import spark.implicits._
    val vals = (1 to 1000).map(i => i * 0.015)
    val results = Seq(1, 3, 7).map { p =>
      vals.toDF("v").repartition(p).agg(expr("cents_sum(v)")).head.getDouble(0)
    }
    assert(results.distinct.size == 1)
  }
}
