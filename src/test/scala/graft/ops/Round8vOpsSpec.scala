package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-8 batch AE. */
class Round8vOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-pollaczek-khinchine: stable queue, nonnegative wait") {
    val r = run("agg-pollaczek-khinchine").head()
    val rho = r.getAs[Double]("rho")
    assert(rho > 0.0 && rho < 1.0)
    assert(r.getAs[Boolean]("stable"))
    assert(r.getAs[Double]("pk_wait_days") >= 0.0)
    // with rho<1, the P-K wait is finite and below a gross bound
    assert(r.getAs[Double]("pk_wait_days") < 100.0)
  }

  test("dq-berkson-bias: selection lowers the correlation") {
    val rows = run("dq-berkson-bias").collect()
    assert(rows.length == 2)
    val byPop = rows.map(r => r.getAs[String]("population") -> r).toMap
    val all = byPop("all_orders").getAs[Double]("corr_value_items")
    val sel = byPop("selected_by_collider").getAs[Double]("corr_value_items")
    // conditioning on the collider pushes the correlation DOWN
    assert(sel < all)
    assert(byPop("selected_by_collider").getAs[Long]("n") <
      byPop("all_orders").getAs[Long]("n"))
  }

  test("dq-will-rogers: the migration raises both tier means") {
    val r = run("dq-will-rogers").head()
    assert(r.getAs[Boolean]("both_means_rose"))
    assert(r.getAs[Double]("high_mean_before_usd") >
      r.getAs[Double]("low_mean_before_usd"))
  }

  test("agg-metcalfe-fit: r-squareds are valid proportions") {
    val r = run("agg-metcalfe-fit").head()
    Seq("r2_sarnoff_n", "r2_odlyzko_nlogn", "r2_metcalfe_n2").foreach { c =>
      val v = r.getAs[Double](c)
      assert(v >= 0.0 && v <= 1.0)
    }
    assert(r.getAs[Long]("n_months") > 24L)
  }
}
