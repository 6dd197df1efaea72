package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-8 batch AB. */
class Round8sOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-bullwhip-effect: variances positive, ratios well-formed") {
    val r = run("agg-bullwhip-effect").head()
    assert(r.getAs[Double]("daily_var") > 0.0)
    assert(r.getAs[Double]("weekly_var") > 0.0)
    assert(r.getAs[Double]("bullwhip_ratio") > 0.0)
    assert(r.getAs[Double]("cv2_ratio") > 0.0)
    // weekly mean exceeds the daily mean; at most 7x (sparse fixture
    // calendars sit well below the dense-calendar 7)
    val ratio = r.getAs[Double]("weekly_mean") / r.getAs[Double]("daily_mean")
    assert(ratio > 1.0 && ratio < 7.5)
  }

  test("agg-sax-motifs: word accounting closes") {
    val r = run("agg-sax-motifs").head()
    assert(r.getAs[String]("top_motif").length == 3)
    assert(r.getAs[String]("top_motif").forall("abcd".contains(_)))
    assert(r.getAs[Long]("top_motif_count") <= r.getAs[Long]("n_windows"))
    assert(r.getAs[Long]("distinct_words") <= 64L)
    val share = r.getAs[Double]("motif_share")
    assert(share > 0.0 && share <= 1.0)
  }

  test("agg-gravity-model: mass elasticities positive") {
    val r = run("agg-gravity-model").head()
    // bigger origin/destination books move more revenue - the gravity
    // signature; the synthetic ring distance may carry no signal
    assert(r.getAs[Double]("mass_origin_elasticity") > 0.0)
    assert(r.getAs[Double]("mass_dest_elasticity") > 0.0)
  }

  test("agg-cobb-douglas-fit: returns-to-scale is the beta sum") {
    val r = run("agg-cobb-douglas-fit").head()
    val bc = r.getAs[Double]("beta_customers")
    val bo = r.getAs[Double]("beta_orders")
    assert(math.abs(bc + bo - r.getAs[Double]("returns_to_scale")) < 1e-6)
    assert(r.getAs[Long]("n_months") > 24L)
  }
}
