package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-8 batch AD (probability classics). */
class Round8uOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-secretary-rule: success in the 1/e ballpark") {
    val r = run("agg-secretary-rule").head()
    assert(r.getAs[Long]("n_hired_runs") <= 32L)
    assert(r.getAs[Long]("n_best") <= r.getAs[Long]("n_hired_runs"))
    val rate = r.getAs[Double]("success_rate")
    // 32 permutations: generous band around 1/e
    assert(rate > 0.1 && rate < 0.7)
  }

  test("agg-inspection-paradox: length-biased mean dominates") {
    val r = run("agg-inspection-paradox").head()
    assert(r.getAs[Long]("n_gaps") > 0)
    assert(r.getAs[Double]("inspected_mean_gap_days") >=
      r.getAs[Double]("mean_gap_days"))
    assert(r.getAs[Double]("paradox_factor") >= 1.0)
  }

  test("dq-regression-to-mean: extremes drift toward the middle") {
    val rows = run("dq-regression-to-mean").collect()
    assert(rows.length == 2)
    val byCohort = rows.map(r => r.getAs[String]("cohort") -> r).toMap
    val top = byCohort("top5_1996")
    val bot = byCohort("bottom5_1996")
    assert(top.getAs[Double]("z_1996") > 0.0)
    assert(bot.getAs[Double]("z_1996") < 0.0)
    // the RTM prediction shrinks the extreme toward zero
    assert(math.abs(top.getAs[Double]("z_1997_rtm_predicted")) <=
      math.abs(top.getAs[Double]("z_1996")) + 1e-9)
  }

  test("agg-friendship-paradox: neighbors out-degree the nodes") {
    val rows = run("agg-friendship-paradox").collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Double]("friend_mean_degree") >=
        r.getAs[Double]("mean_degree"))
      assert(r.getAs[Double]("paradox_factor") >= 1.0)
    }
  }
}
