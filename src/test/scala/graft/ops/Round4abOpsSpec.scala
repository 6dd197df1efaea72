package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for batch V (BY ALL, weighted median, Gini,
  * IVF cell balance). */
class Round4abOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("sql-by-all: grouping matches the explicit column list") {
    val got = run("sql-by-all")
    val explicit = Tables.orders(spark, sf)
      .groupBy("o_orderstatus", "o_orderpriority").count()
    assert(got.count() == explicit.count())
  }

  test("agg-weighted-median: half the weight sits at or below the median") {
    val got = run("agg-weighted-median").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).select("p_partkey", "p_brand"),
        col("p_partkey") === col("l_partkey"))
      .select(col("p_brand"),
        expr("CAST(CAST(l_extendedprice / l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)").as("uc"),
        col("l_quantity").cast("long").as("wt")).cache()
    got.foreach { case (brand, med) =>
      val below = base.filter(col("p_brand") === brand && col("uc") <= med)
        .agg(sum("wt")).collect()(0).getLong(0)
      val total = base.filter(col("p_brand") === brand)
        .agg(sum("wt")).collect()(0).getLong(0)
      assert(below * 2 >= total)
    }
  }

  test("agg-gini: coefficient within (0, 1e6), n covers the base") {
    val r = run("agg-gini").collect()(0)
    assert(r.getLong(0) == Tables.orders(spark, sf).select("o_custkey").distinct().count())
    assert(r.getLong(2) > 0 && r.getLong(2) < 1000000L)
  }

  test("ann-cell-balance: cells partition the corpus, ratio consistent") {
    val got = run("ann-cell-balance").collect()
    val total = got.map(_.getLong(1)).sum
    assert(total == Tables.embeddings(spark, sf).count())
    val (mx, mn) = (got.map(_.getLong(1)).max, got.map(_.getLong(1)).min)
    assert(got.head.getLong(2) == mx * 1000000L / mn)
  }
}
