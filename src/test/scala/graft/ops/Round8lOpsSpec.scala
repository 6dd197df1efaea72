package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-8 batch U. */
class Round8lOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("sample-rolling-origin-cv: expanding train, full horizons") {
    val rows = run("sample-rolling-origin-cv").collect()
    assert(rows.length == 5)
    val trains = rows.sortBy(_.getAs[Int]("fold")).map(_.getAs[Long]("train_months"))
    assert(trains.zip(trains.tail).forall { case (a, b) => b == a + 6 })
    rows.foreach { r =>
      assert(r.getAs[Long]("test_months") == 3L)
      assert(r.getAs[Long]("mae_usd") >= 0L)
      assert(r.getAs[Long]("smape_milli") >= 0L &&
        r.getAs[Long]("smape_milli") <= 2000L)
    }
  }

  test("dq-embedding-drift: 64 dims, worst dim consistent with max") {
    val r = run("dq-embedding-drift").head()
    assert(r.getAs[Long]("n_dims") == 64L)
    assert(r.getAs[Long]("dims_shifted") <= 64L)
    assert(math.abs(math.abs(r.getAs[Double]("worst_z")) -
      r.getAs[Double]("max_abs_z")) < 1e-3)
    assert(r.getAs[Double]("mean_abs_z") <= r.getAs[Double]("max_abs_z"))
  }

  test("agg-pinball-loss-eval: forecasts ordered, coverage monotone") {
    val rows = run("agg-pinball-loss-eval").collect()
    assert(rows.map(_.getAs[Int]("tau_pct")).toSeq == Seq(10, 50, 90))
    val fs = rows.map(_.getAs[Long]("forecast_usd"))
    assert(fs(0) <= fs(1) && fs(1) <= fs(2))
    val cov = rows.map(_.getAs[Double]("coverage"))
    assert(cov(0) <= cov(1) && cov(1) <= cov(2))
    rows.foreach(r => assert(r.getAs[Long]("mean_pinball_usd") >= 0L))
  }

  test("agg-newsvendor-quantile: the critical ratile never loses to the mean") {
    val rows = run("agg-newsvendor-quantile").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      // stocking at the optimal quantile is at least as cheap as at the
      // mean on the SAME demand history (exact empirical optimality)
      assert(r.getAs[Long]("cost_qstar") <= r.getAs[Long]("cost_mean"))
      assert(r.getAs[Long]("q_star") > 0L)
    }
    // high underage cost pushes the stock level up
    val q91 = rows.find(r => r.getAs[Int]("cu") == 9).get.getAs[Long]("q_star")
    val q13 = rows.find(r => r.getAs[Int]("cu") == 1 &&
      r.getAs[Int]("co") == 3).get.getAs[Long]("q_star")
    assert(q91 >= q13)
  }
}
