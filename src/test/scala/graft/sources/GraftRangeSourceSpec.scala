package graft.sources

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** The DataSource V2 connector's contract: values are the documented
  * pure function of id, the id-range pushdown narrows the scan (not a
  * post-scan Filter), column pruning reaches readSchema, and slicing
  * covers the range exactly once. */
class GraftRangeSourceSpec extends SparkTestBase {

  private def rng(rows: Long, slices: Int = 8) =
    spark.read.format("graft-range")
      .option("rows", rows).option("slices", slices).load()

  test("generates the documented deterministic rows exactly once") {
    val df = rng(1000)
    assert(df.count() == 1000)
    assert(df.select(countDistinct("id")).head.getLong(0) == 1000)
    val r = df.filter(col("id") === 123).head
    assert(r.getDouble(r.fieldIndex("val")) == GraftRangeSource.valOf(123))
    assert(r.getInt(r.fieldIndex("bucket")) == GraftRangeSource.bucketOf(123))
  }

  test("id range predicates are pushed into the scan (narrowed interval)") {
    val df = rng(100000).filter(col("id") >= 1000L && col("id") < 50000L)
    val scanDesc = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scanDesc.contains("GraftRangeScan[1000,50000)"),
      s"scan not narrowed: $scanDesc")
    assert(df.count() == 49000)
    // boundary exactness: both edges honored by the generator itself
    assert(df.agg(min("id"), max("id")).head match {
      case r => r.getLong(0) == 1000L && r.getLong(1) == 49999L
    })
  }

  test("column pruning reaches the reader schema") {
    val df = rng(5000).select("bucket")
    val scanDesc = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scanDesc.contains("cols=bucket"), s"not pruned: $scanDesc")
    assert(df.distinct().count() == 10)
  }

  test("slice boundaries neither drop nor duplicate rows") {
    for (slices <- Seq(1, 3, 32)) {
      val df = rng(10007, slices)
      assert(df.count() == 10007, s"slices=$slices")
      assert(df.select(countDistinct("id")).head.getLong(0) == 10007)
    }
  }

  test("empty range after contradictory pushdown yields zero partitions") {
    val df = rng(1000).filter(col("id") > 5000L)
    assert(df.count() == 0)
  }
}
