package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-8 batch AH. */
class Round8yOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-panel-fixed-effects: elasticity near 1, r2 valid") {
    val r = run("agg-panel-fixed-effects").head()
    assert(r.getAs[Long]("n_obs") > 500L)
    // every nation's log revenue co-moves with the market it sums into
    assert(r.getAs[Double]("within_elasticity") > 0.0)
    val r2 = r.getAs[Double]("within_r2")
    assert(r2 >= 0.0 && r2 <= 1.0)
  }

  test("win-rsi-indicator: last year only, signals consistent") {
    val rows = run("win-rsi-indicator").collect()
    assert(rows.nonEmpty && rows.length <= 12)
    rows.foreach { r =>
      val rsi = r.getAs[Double]("rsi")
      assert(rsi >= 0.0 && rsi <= 100.0)
      val expect = if (rsi > 70.0) "overbought"
        else if (rsi < 30.0) "oversold" else "neutral"
      assert(r.getAs[String]("signal") == expect)
    }
  }

  test("agg-almon-lag: peak weight matches the quadratic at the peak") {
    val r = run("agg-almon-lag").head()
    val j = r.getAs[Int]("peak_lag")
    assert(j >= 0 && j <= 5)
    val w = r.getAs[Double]("b0") + r.getAs[Double]("b1") * j +
      r.getAs[Double]("b2") * j * j
    assert(math.abs(w - r.getAs[Double]("peak_weight_usd_per_order")) < 0.01)
  }

  test("mm-freeze-frame-detect: accounting bounded") {
    val r = run("mm-freeze-frame-detect").head()
    assert(r.getAs[Long]("docs_with_freeze") <= r.getAs[Long]("n_docs"))
    assert(r.getAs[Long]("longest_freeze_run") >= 1L)
    val share = r.getAs[Double]("frozen_frame_share")
    assert(share >= 0.0 && share <= 1.0)
  }
}
