package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for batch R (FIFO match, reconcile checksum,
  * interval range frame, MAD outliers, A/B gate). */
class Round4xOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-fifo-match: allocations per demand never exceed its quantity") {
    val got = run("agg-fifo-match").cache()
    assert(got.count() > 0)
    assert(got.filter(col("matched_qty") <= 0).count() == 0)
    // total matched per part <= min(total supply, total demand)
    val perPart = got.groupBy("l_partkey").agg(sum("matched_qty").as("m"))
    val streams = Tables.lineitem(spark, sf)
      .filter(col("l_partkey") % 50 === 0)
      .groupBy("l_partkey")
      .agg(sum(when(col("l_returnflag") =!= "R", col("l_quantity").cast("long")).otherwise(0L)).as("sup"),
        sum(when(col("l_returnflag") === "R", col("l_quantity").cast("long")).otherwise(0L)).as("dem"))
    val bad = perPart.join(streams, "l_partkey")
      .filter(col("m") =!= least(col("sup"), col("dem")))
    assert(bad.count() == 0) // FIFO fills exactly min(supply, demand)
  }

  test("dq-reconcile-checksum: checksum detects a single-cent perturbation") {
    val a = run("dq-reconcile-checksum").collect()
    // recompute with one row perturbed: checksums must differ for that group
    val p = 2147483647L
    val perturbed = Tables.orders(spark, sf)
      .select(col("o_orderstatus"), col("o_orderkey"),
        (expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)") +
          when(col("o_orderkey") === 7, 1L).otherwise(0L)).as("cents"))
      .groupBy("o_orderstatus")
      .agg(sum((col("o_orderkey") % p) * (col("cents") % p) % p).as("checksum"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val orig = a.map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(orig.exists { case (k, v) => perturbed(k) != v })
    assert(orig.count { case (k, v) => perturbed(k) != v } == 1)
  }

  test("win-range-interval: trailing sum >= own cents, equals it for isolated orders") {
    val got = run("win-range-interval").cache()
    assert(got.filter(col("trail7_cents") < col("cents")).count() == 0)
  }

  test("dq-mad-outliers: med and mad are members/deviations of the user's set") {
    val got = run("dq-mad-outliers").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getInt(1) > 0)        // n (size() is INT)
      assert(r.getLong(3) >= 0)      // mad
      assert(r.getLong(4) >= 0 && r.getLong(4) < r.getInt(1)) // outliers < n
    }
  }

  test("agg-abtest-gate: proportions consistent, gate matches the identity") {
    val r = run("agg-abtest-gate").collect()(0)
    val (n1, c1, n2, c2) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(c1 <= n1 && c2 <= n2)
    val lhs = BigInt(c1 * n2 - c2 * n1).pow(2) * BigInt(n1 + n2)
    val rhs = BigInt(4) * n1 * n2 * (c1 + c2) * (n1 + n2 - c1 - c2)
    assert(r.getBoolean(6) == (lhs > rhs))
  }
}
