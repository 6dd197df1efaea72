package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for batch S (PIVOT clause, LATERAL VIEW,
  * containment, seasonality, new/returning, cumulative uniques). */
class Round4yOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("sql-pivot-clause: pivot cells reconcile with the direct group-by") {
    val got = run("sql-pivot-clause").cache()
    val direct = Tables.orders(spark, sf)
      .groupBy("o_orderpriority", "o_orderstatus")
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")).as("cents"))
    val f = direct.filter(col("o_orderstatus") === "F")
      .select(col("o_orderpriority"), col("cents"))
    val joined = got.select(col("o_orderpriority"), col("f_cents")).join(f, "o_orderpriority")
    assert(joined.filter(col("f_cents") =!= col("cents")).count() == 0)
  }

  test("sql-lateral-view: every emitted word really repeats in its doc") {
    val got = run("sql-lateral-view").collect()
    got.foreach(r => assert(r.getLong(2) >= 3))
  }

  test("dedup-containment: ppm bounded, intersection within both sizes") {
    val got = run("dedup-containment").collect()
    got.foreach { r =>
      val (na, nb, inter) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(inter <= na && inter <= nb)
      assert(r.getLong(5) <= 1000000L && r.getLong(6) <= 1000000L)
    }
  }

  test("agg-dow-seasonality: 7 ISO weekdays, indexes bracket 1e6") {
    val got = run("agg-dow-seasonality").collect()
    assert(got.map(_.getInt(0)).toSet.subsetOf((1 to 7).toSet))
    val idx = got.map(_.getLong(3))
    assert(idx.exists(_ <= 1000000L) && idx.exists(_ >= 999999L))
  }

  test("agg-new-returning: new customers across months equal the customer base") {
    val got = run("agg-new-returning")
    val totalNew = got.agg(sum("new_cust")).collect()(0).getLong(0)
    val activeCust = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(totalNew == activeCust) // every active customer is new exactly once
  }

  test("agg-cumulative-uniques: curve is monotone and ends at the user count") {
    val got = run("agg-cumulative-uniques").collect()
    val cums = got.map(_.getLong(2))
    assert(cums.zip(cums.tail).forall { case (a, b) => a < b })
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(cums.last == users)
  }
}
