package graft.ops

import graft.olist.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-12 batch A invariants: theta-sketch set algebra over yearly
  * customer cohorts. At sf0.001 every cohort has ≤121 distinct
  * customers < K=256, so the sketches run in EXACT MODE (θ = 2^52)
  * and the estimators must reduce to exact counts — the
  * degenerate-regime contract the oracle alone wouldn't isolate
  * (sf0.01's ≥885-customer cohorts exercise the estimating regime
  * through the DuckDB compare). */
class Round12aOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-theta-anotb: exact mode collapses the estimator to the exact churn") {
    val rows = run("agg-theta-anotb").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("est_anotb") == r.getAs[Long]("exact_anotb"), r)
      assert(r.getAs[Long]("err_pm") == 0L, r)
    }
    // churn sanity: some customer active in year Y skipped year Y+1
    assert(rows.exists(r => r.getAs[Long]("exact_anotb") > 0))
  }

  test("agg-theta-overlap-matrix: full 7-choose-2 matrix, exact in exact mode") {
    val rows = run("agg-theta-overlap-matrix").collect()
    assert(rows.length == 21, rows.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("est_inter") == r.getAs[Long]("exact_inter"), r)
      assert(r.getAs[Long]("err_pm") == 0L, r)
      val j = r.getAs[Long]("jaccard_pm")
      assert(j >= 0L && j <= 1000L, r)
      assert(r.getAs[Long]("exact_inter") > 0L, r) // cohorts genuinely overlap
    }
  }

  test("theta difference + intersection = |A| (partition identity, per pair)") {
    // |A \ B| + |A ∩ B| = |A| exactly — the set-algebra identity that
    // would catch an off-by-θ membership bug the per-column compares
    // can miss (checked on the exact columns, so it holds in both
    // sketch regimes)
    val anotb = run("agg-theta-anotb").collect()
      .map(r => (r.getAs[Int]("year_a"), r.getAs[Int]("year_b")) -> r.getAs[Long]("exact_anotb"))
      .toMap
    val inter = run("agg-theta-overlap-matrix").collect()
      .map(r => (r.getAs[Int]("year_a"), r.getAs[Int]("year_b")) -> r.getAs[Long]("exact_inter"))
      .toMap
    val sizes = Tables.orders(spark, sf)
      .groupBy(year(col("o_orderdate")).as("y"))
      .agg(countDistinct("o_custkey").as("n")).collect()
      .map(r => r.getAs[Int]("y") -> r.getAs[Long]("n")).toMap
    for (((a, b), d) <- anotb) {
      val i = inter.getOrElse(if (a < b) (a, b) else (b, a), 0L)
      assert(d + i == sizes(a), s"($a,$b): $d + $i != ${sizes(a)}")
    }
  }

  test("sink-bucket-prune equals the plain filtered aggregate") {
    val pruned = run("sink-bucket-prune")
    val plain = Tables.orders(spark, sf)
      .filter(col("o_orderkey").isin(1L, 7L, 32L, 33L, 64L, 128L))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
    assert(pruned.except(plain).isEmpty && plain.except(pruned).isEmpty)
  }
}
