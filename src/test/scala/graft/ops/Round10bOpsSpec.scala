package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-10 batch B (inventory + marketing
  * science). */
class Round10bOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-safety-stock: one row per brand, reorder point covers buffer") {
    val rows = run("agg-safety-stock").collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      assert(r.getAs[Double]("safety_stock") >= 0.0)
      assert(r.getAs[Double]("reorder_point") >= r.getAs[Double]("safety_stock"))
      assert(r.getAs[Double]("mean_lead_days") > 0.0)
    }
  }

  test("agg-fill-rate-esc: service and fill rate both rise with z") {
    val rows = run("agg-fill-rate-esc").collect()
    assert(rows.length == 4)
    val cs = rows.map(_.getAs[Double]("cycle_service"))
    val fr = rows.map(_.getAs[Double]("fill_rate"))
    assert(cs.zip(cs.tail).forall { case (a, b) => a < b })
    assert(fr.zip(fr.tail).forall { case (a, b) => a < b })
    assert(fr.forall(f => f > 0.5 && f <= 1.0))
    assert(rows.map(_.getAs[Double]("expected_shortage")).forall(_ >= 0.0))
  }

  test("agg-sbg-churn: fitted parameters on the grid, curve probabilities valid") {
    val r = run("agg-sbg-churn").head()
    assert(r.getAs[Long]("cohort_size") > 0)
    val (a, b) = (r.getAs[Double]("alpha"), r.getAs[Double]("beta"))
    assert(a >= 0.25 && a <= 5.0 && b >= 0.25 && b <= 5.0)
    assert(r.getAs[Double]("sse") >= 0.0)
    val s12 = r.getAs[Double]("predicted_s12")
    assert(s12 > 0.0 && s12 < 1.0)
  }

  test("agg-msprt: parity split is a true null, p bounded") {
    val r = run("agg-msprt").head()
    assert(r.getAs[Long]("n_a") > 0 && r.getAs[Long]("n_b") > 0)
    val p = r.getAs[Double]("always_valid_p")
    assert(p > 0.0 && p <= 1.0)
    assert(r.getAs[Double]("lambda_mixture") > 0.0)
  }
}
