package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for round-9 batch I. */
class Round9iOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("text-vocab-overlap: Jaccard bounded and intersections dominated by vocab sizes") {
    val rows = run("text-vocab-overlap").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val sizes = Tables.documents(spark, sf)
      .select(col("source"), explode(split(lower(col("text")), " ")).as("t"))
      .filter(length(col("t")) > 0).distinct()
      .groupBy("source").agg(count(lit(1)).as("v")).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("v")).toMap
    rows.foreach { r =>
      val j = r.getAs[Long]("jaccard_milli")
      assert(j >= 0 && j <= 1000)
      assert(r.getAs[Long]("inter") <=
        math.min(sizes(r.getAs[String]("sa")), sizes(r.getAs[String]("sb"))))
    }
  }

  test("dq-column-diff: diff counts localize to exactly the seeded mutations") {
    val rows = run("dq-column-diff").collect()
      .map(r => r.getAs[String]("column_name") -> r.getAs[Long]("n_diff")).toMap
    val n11 = Tables.orders(spark, sf).filter(col("o_orderkey") % 11 === 0).count()
    val n13 = Tables.orders(spark, sf).filter(col("o_orderkey") % 13 === 0).count()
    assert(rows("o_orderpriority") == n11)
    assert(rows("o_totalprice") == n13)
    assert(rows("o_orderstatus") == 0 && rows("o_orderdate") == 0)
  }

  test("sample-time-split: cutoff respected and splits partition events") {
    val rows = run("sample-time-split").collect()
    assert(rows.map(_.getAs[String]("split")).sorted.sameElements(Array("test", "train")))
    val total = rows.map(_.getAs[Long]("n_events")).sum
    assert(total == Tables.events(spark, sf).count())
    // test window is only 7 days of a month-long stream: train dominates
    val byName = rows.map(r => r.getAs[String]("split") -> r.getAs[Long]("n_events")).toMap
    assert(byName("train") > byName("test"))
  }

  test("sink-column-mask: masking changes sums, never counts; names hidden for analyst") {
    val rows = run("sink-column-mask").collect()
      .map(r => r.getAs[String]("role") ->
        (r.getAs[Long]("n"), r.getAs[Double]("balance_sum"), r.getAs[Long]("names_visible"))).toMap
    val (na, sa, va) = rows("admin"); val (nn, sn, vn) = rows("analyst")
    assert(na == nn, "row counts must survive masking")
    assert(sa != sn, "coarsened balances must change the sum")
    assert(sn <= sa, "floor-bucketing can only lower the sum")
    assert(va == na && vn == 0L)
  }
}
