package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-8 batch Q. */
class Round8hOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-ridge-path: lambda=0 equals OLS, norms shrink monotonically") {
    val rows = run("agg-ridge-path").collect()
    assert(rows.map(_.getAs[Double]("lambda")).toSeq == Seq(0.0, 0.1, 0.5, 2.0))
    val ratios = rows.map(_.getAs[Double]("l2_vs_ols"))
    assert(math.abs(ratios.head - 1.0) < 1e-9)
    assert(ratios.zip(ratios.tail).forall { case (a, b) => b <= a })
    assert(ratios.last < 1.0)
  }

  test("agg-box-cox-grid: exactly one winner at ll_rel 0, rest negative") {
    val rows = run("agg-box-cox-grid").collect()
    assert(rows.length == 5)
    assert(rows.count(_.getAs[Boolean]("is_best")) == 1)
    rows.foreach { r =>
      val rel = r.getAs[Double]("ll_rel")
      if (r.getAs[Boolean]("is_best")) assert(rel == 0.0) else assert(rel < 0.0)
    }
  }

  test("sample-horvitz-thompson: estimate lands near truth, rate sane") {
    val r = run("sample-horvitz-thompson").head()
    assert(r.getAs[Long]("n_sampled") > 0)
    assert(r.getAs[Long]("n_sampled") <= r.getAs[Long]("n_pop"))
    // PPS with E[n]≈3000 on a 1500-order fixture caps most pi at <1;
    // HT should still land within a few percent of the truth
    assert(math.abs(r.getAs[Double]("rel_err_pct")) < 10.0)
  }

  test("graph-adamic-adar: scores sorted desc, pairs canonical") {
    val rows = run("graph-adamic-adar").collect()
    assert(rows.length == 15)
    val scores = rows.map(_.getAs[Double]("adamic_adar"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("s1") < r.getAs[Long]("s2"))
      assert(r.getAs[Long]("common_parts") >= 1)
    }
  }
}
