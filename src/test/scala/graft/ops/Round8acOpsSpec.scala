package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-8 batch AL (finance factors). */
class Round8acOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-momentum-factor: spread reconciles with baskets") {
    val r = run("agg-momentum-factor").head()
    val spread = r.getAs[Double]("winners_fwd_growth") -
      r.getAs[Double]("losers_fwd_growth")
    assert(math.abs(spread - r.getAs[Double]("momentum_spread")) < 1e-3)
    assert(r.getAs[Boolean]("momentum_present") ==
      (r.getAs[Double]("momentum_spread") > 0.0))
  }

  test("agg-winners-curse-correction: correction shrinks the edge") {
    val r = run("agg-winners-curse-correction").head()
    assert(r.getAs[Double]("curse_correction_usd") > 0.0)
    assert(r.getAs[Double]("corrected_edge_usd") <
      r.getAs[Double]("observed_edge_usd"))
    // the winner beats the grand mean by construction
    assert(r.getAs[Double]("observed_edge_usd") > 0.0)
  }

  test("agg-tangency-portfolio: tangency Sharpe dominates both legs") {
    val r = run("agg-tangency-portfolio").head()
    val st = r.getAs[Double]("sharpe_tangency")
    val s0 = r.getAs[Double]("sharpe_nation0")
    val s1 = r.getAs[Double]("sharpe_nation1")
    // the tangency portfolio's squared Sharpe >= each leg's
    assert(st * st >= s0 * s0 - 1e-4)
    assert(st * st >= s1 * s1 - 1e-4)
  }

  test("agg-calmar-ratio: pieces reconcile") {
    val r = run("agg-calmar-ratio").head()
    val dd = r.getAs[Double]("max_drawdown")
    assert(dd >= 0.0 && dd < 1.0)
    if (dd > 0.0)
      assert(math.abs(r.getAs[Double]("cagr") / dd -
        r.getAs[Double]("calmar_ratio")) < 0.05)
  }
}
