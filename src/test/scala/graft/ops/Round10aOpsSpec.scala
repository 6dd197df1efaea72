package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-10 batch A (rank tests +
  * structural-break econometrics). */
class Round10aOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-brunner-munzel: relative effect in [0,1], positive df") {
    val r = run("agg-brunner-munzel").head()
    assert(r.getAs[Long]("n_x") > 0 && r.getAs[Long]("n_y") > 0)
    val p = r.getAs[Double]("p_hat")
    assert(p >= 0.0 && p <= 1.0)
    assert(r.getAs[Double]("df_welch") > 1.0)
  }

  test("agg-jonckheere-terpstra: U within bounds, null expectation positive") {
    val r = run("agg-jonckheere-terpstra").head()
    assert(r.getAs[Long]("n_total") > 0)
    assert(r.getAs[Double]("jt_u") >= 0.0)
    assert(r.getAs[Double]("e_u") > 0.0)
    // priorities are assigned independently of price: no real trend
    assert(math.abs(r.getAs[Double]("z_stat")) < 6.0)
  }

  test("dq-kuiper-drift: V = D+ + D-, both one-sided parts nonnegative") {
    val r = run("dq-kuiper-drift").head()
    val (dp, dm) = (r.getAs[Double]("d_plus"), r.getAs[Double]("d_minus"))
    assert(dp >= 0.0 && dm >= 0.0)
    assert(math.abs(r.getAs[Double]("kuiper_v") - (dp + dm)) < 2e-6)
    assert(r.getAs[Double]("v_crit") > 0.0)
  }

  test("agg-mood-median-test: below-median side holds at least half") {
    val r = run("agg-mood-median-test").head()
    val below = r.getAs[Long]("below_a") + r.getAs[Long]("below_n") +
      r.getAs[Long]("below_r")
    val n = r.getAs[Long]("n_total")
    assert(below >= n / 2 && below <= n, "<=-median side must hold >= N/2 rows")
    assert(r.getAs[Double]("chi2_stat") >= 0.0)
  }

  test("agg-chow-break: segments partition the series") {
    val r = run("agg-chow-break").head()
    assert(r.getAs[Long]("n_pre") + r.getAs[Long]("n_post") ==
      r.getAs[Long]("n_days"))
    assert(r.getAs[Long]("n_pre") > 0 && r.getAs[Long]("n_post") > 0)
    assert(r.getAs[Double]("chow_f") >= 0.0)
  }

  test("agg-quandt-andrews: argmax break inside the trimmed corpus span") {
    val r = run("agg-quandt-andrews").head()
    assert(r.getAs[Double]("sup_f") >= 0.0)
    val t = r.getAs[Long]("break_t")
    assert(t > 1095 && t < 3600, s"break day $t must fall in the 1995-2001 span")
  }

  test("agg-newey-west: HAC and iid SEs positive, ratio finite") {
    val r = run("agg-newey-west").head()
    assert(r.getAs[Double]("se_iid") > 0.0)
    assert(r.getAs[Double]("se_newey_west") > 0.0)
    assert(r.getAs[Double]("hac_inflation") > 0.0)
  }

  test("agg-crow-amsaa: power-law parameters positive over full horizon") {
    val r = run("agg-crow-amsaa").head()
    assert(r.getAs[Long]("n_months") > 12)
    assert(r.getAs[Double]("beta") > 0.0)
    assert(r.getAs[Double]("lambda") > 0.0)
  }
}
