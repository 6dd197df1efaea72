package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-8 batch Y (meta-analysis family). */
class Round8pOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-meta-dersimonian-laird: RE never narrower than FE") {
    val r = run("agg-meta-dersimonian-laird").head()
    assert(r.getAs[Long]("k_studies") == 25L)
    assert(r.getAs[Long]("df") == 24L)
    assert(r.getAs[Double]("q_stat") >= 0.0)
    assert(r.getAs[Double]("tau2_usd2") >= 0.0)
    val i2 = r.getAs[Double]("i2")
    assert(i2 >= 0.0 && i2 < 1.0)
    // random-effects CI is at least as wide as fixed-effects
    assert(r.getAs[Double]("ci_widening") >= 1.0 - 1e-9)
    assert(r.getAs[Double]("fe_mean_usd") > 0.0)
    assert(r.getAs[Double]("re_mean_usd") > 0.0)
  }

  test("agg-fishers-method: statistics well-formed") {
    val r = run("agg-fishers-method").head()
    assert(r.getAs[Long]("k_studies") == 25L)
    assert(r.getAs[Long]("fisher_df") == 50L)
    // -2 sum(ln p) is nonnegative by construction
    assert(r.getAs[Double]("fisher_chi2") >= 0.0)
  }

  test("agg-cohens-d-panel: g shrinks d, buckets consistent") {
    val rows = run("agg-cohens-d-panel").collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      val dd = r.getAs[Double]("cohens_d")
      val g = r.getAs[Double]("hedges_g")
      assert(math.abs(g) <= math.abs(dd) + 1e-9)
      val mag = r.getAs[String]("magnitude")
      val expected = if (math.abs(dd) < 0.2) "negligible"
        else if (math.abs(dd) < 0.5) "small"
        else if (math.abs(dd) < 0.8) "medium" else "large"
      assert(mag == expected)
    }
  }

  test("agg-egger-regression: t-statistic consistent with the flag") {
    val r = run("agg-egger-regression").head()
    assert(r.getAs[Long]("k_studies") == 25L)
    val t = r.getAs[Double]("intercept_t")
    assert(r.getAs[Boolean]("bias_suspected") == (math.abs(t) > 2.07))
  }
}
