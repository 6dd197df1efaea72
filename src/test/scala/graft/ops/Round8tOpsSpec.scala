package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-8 batch AC. */
class Round8tOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-lmdi-decomposition: effects close with negligible residual") {
    val r = run("agg-lmdi-decomposition").head()
    assert(r.getAs[Long]("k_nations") >= 20L)
    // LMDI's defining property: activity + intensity == total change
    assert(r.getAs[Double]("residual_share") < 0.001)
  }

  test("agg-shift-share: three effects close to actual growth per nation") {
    val rows = run("agg-shift-share").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val closure = r.getAs[Double]("national_effect_usd") +
        r.getAs[Double]("mix_effect_usd") +
        r.getAs[Double]("competitive_effect_usd")
      val actual = r.getAs[Double]("actual_growth_usd")
      assert(math.abs(closure - actual) <=
        math.max(1.0, 1e-6 * math.abs(actual)))
    }
  }

  test("agg-location-quotient: specialization cells exceed parity") {
    val rows = run("agg-location-quotient").collect()
    assert(rows.length == 10)
    val lqs = rows.map(_.getAs[Double]("location_quotient"))
    assert(lqs.zip(lqs.tail).forall { case (a, b) => a >= b })
    assert(lqs.head > 1.0)
  }

  test("agg-interrupted-time-series: changes reconcile with segments") {
    val r = run("agg-interrupted-time-series").head()
    assert(r.getAs[Long]("n_pre_months") > 12L)
    assert(r.getAs[Long]("n_post_months") > 12L)
    assert(math.abs(r.getAs[Double]("slope_post_usd") -
      r.getAs[Double]("slope_pre_usd") -
      r.getAs[Double]("slope_change_usd")) < 0.02)
  }
}
