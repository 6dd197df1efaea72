package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-8 batch AM (forecast evaluation). */
class Round8adOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-forecast-combination: MAEs positive, verdicts consistent") {
    val r = run("agg-forecast-combination").head()
    assert(r.getAs[Long]("n_months") >= 12L)
    Seq("mae_naive", "mae_snaive", "mae_drift", "mae_combo").foreach { c =>
      assert(r.getAs[Long](c) > 0L)
    }
    val best = Seq("mae_naive", "mae_snaive", "mae_drift")
      .map(r.getAs[Long](_)).min
    assert(r.getAs[Boolean]("combo_beats_best") ==
      (r.getAs[Long]("mae_combo") <= best))
  }

  test("agg-forecast-mse-decomposition: shares sum to one") {
    val r = run("agg-forecast-mse-decomposition").head()
    assert(math.abs(r.getAs[Double]("shares_sum") - 1.0) < 0.01)
    Seq("bias_share", "regression_share", "disturbance_share").foreach { c =>
      assert(r.getAs[Double](c) >= -1e-6)
    }
  }

  test("agg-diebold-mariano: statistic consistent with verdict") {
    val r = run("agg-diebold-mariano").head()
    val dm = r.getAs[Double]("dm_stat")
    assert(r.getAs[Boolean]("difference_significant") == (math.abs(dm) > 1.96))
  }

  test("agg-directional-accuracy: rates are proportions") {
    val r = run("agg-directional-accuracy").head()
    val hr = r.getAs[Double]("hit_rate")
    val ns = r.getAs[Double]("no_skill_rate")
    assert(hr >= 0.0 && hr <= 1.0)
    assert(ns > 0.0 && ns < 1.0)
  }
}
