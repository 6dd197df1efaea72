package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-8 batch T. */
class Round8kOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-synthetic-control: effect reconciles, donors complete") {
    val r = run("agg-synthetic-control").head()
    assert(r.getAs[Long]("n_donors") == 24L)
    assert(r.getAs[Long]("effect_usd") ==
      r.getAs[Long]("treated_post_usd") - r.getAs[Long]("synthetic_post_usd"))
    assert(r.getAs[Long]("top_donor") >= 1L && r.getAs[Long]("top_donor") <= 24L)
    assert(r.getAs[Double]("pre_rmse_usd") >= 0.0)
  }

  test("agg-mcf-recurrent: nondecreasing, starts at ~1 order per customer") {
    val rows = run("agg-mcf-recurrent").collect()
    assert(rows.nonEmpty && rows.length <= 25)
    val mcf = rows.sortBy(_.getAs[Int]("tenure_month")).map(_.getAs[Double]("mcf"))
    assert(mcf.zip(mcf.tail).forall { case (a, b) => b >= a })
    // t=0 increment is first-orders/customers: every customer has one,
    // plus possible same-month repeats -> mcf(0) >= ~1
    assert(mcf.head >= 0.99)
    val risks = rows.map(_.getAs[Long]("n_at_risk"))
    assert(risks.forall(_ > 0))
  }

  test("agg-arch-lm-test: statistics finite and consistent") {
    val r = run("agg-arch-lm-test").head()
    assert(r.getAs[Long]("n_obs") > 24)
    val rho = r.getAs[Double]("rho_e2")
    assert(rho >= -1.0 && rho <= 1.0)
    val lm = r.getAs[Double]("lm_stat")
    assert(lm >= 0.0)
    // LM = n * rho^2 up to rounding
    assert(math.abs(lm - r.getAs[Long]("n_obs") * rho * rho) < 0.1)
  }

  test("dq-price-ending-fingerprint: histogram accounting consistent") {
    val r = run("dq-price-ending-fingerprint").head()
    assert(r.getAs[Long]("n_endings_seen") <= 100L)
    assert(r.getAs[Long]("mode_ending") >= 0L && r.getAs[Long]("mode_ending") <= 99L)
    val share = r.getAs[Double]("mode_share")
    assert(share > 0.0 && share <= 1.0)
    assert(r.getAs[Double]("chi2") >= 0.0)
  }
}
