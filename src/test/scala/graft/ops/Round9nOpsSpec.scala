package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for round-9 batch N. */
class Round9nOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-spearman-corr: rho is a valid correlation and n matches lineitem") {
    val r = run("agg-spearman-corr").head()
    val rho = r.getAs[Double]("spearman_rho")
    assert(rho >= -1.0 && rho <= 1.0)
    assert(r.getAs[Long]("n") == Tables.lineitem(spark, sf).count())
  }

  test("dq-psi-drift: one row per bin, shares near-normalized, terms sign-correct") {
    val rows = run("dq-psi-drift").collect()
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Long]("bin")).toSeq == (0L until 10L))
    // ppm shares are floored so each side sums to ≤ 1e6, within 1 ppm/bin
    val paSum = rows.map(_.getAs[Long]("pa_ppm")).sum
    assert(paSum > 1000000L - 10 && paSum <= 1000000L)
    // a PSI term is positive iff share moved AND in the log-ratio direction
    rows.foreach { r =>
      val (pa, pb) = (r.getAs[Long]("pa_ppm"), r.getAs[Long]("pb_ppm"))
      val t = r.getAs[Double]("psi_term")
      if (pa != pb) assert(t >= 0.0, "each (p−q)·ln(p/q) term is non-negative")
    }
  }

  test("win-theil-sen: median slope sits between min and max, pair count is k-choose-2") {
    val r = run("win-theil-sen").head()
    val k = r.getAs[Long]("n_days")
    assert(r.getAs[Long]("n_pairs") == k * (k - 1) / 2)
    assert(r.getAs[Double]("sen_slope") >= r.getAs[Double]("slope_min"))
    assert(r.getAs[Double]("sen_slope") <= r.getAs[Double]("slope_max"))
  }

  test("dq-cramers-v: V in [0,1], chi2 non-negative, n matches orders") {
    val r = run("dq-cramers-v").head()
    assert(r.getAs[Double]("cramers_v") >= 0.0 && r.getAs[Double]("cramers_v") <= 1.0)
    assert(r.getAs[Double]("chi2") >= 0.0)
    assert(r.getAs[Long]("n") == Tables.orders(spark, sf).count())
  }
}
