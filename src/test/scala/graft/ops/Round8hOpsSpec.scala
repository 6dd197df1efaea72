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

  test("sample-ht-design-effect: pps beats uniform on a skewed total") {
    val r = run("sample-ht-design-effect").head()
    assert(r.getAs[Long]("n_pps") > 0 && r.getAs[Long]("n_uni") > 0)
    assert(r.getAs[Long]("n_pps") <= r.getAs[Long]("n_pop"))
    // HT is unbiased; both estimates should land within se*4 of truth
    val truth = r.getAs[Long]("true_usd").toDouble
    assert(math.abs(r.getAs[Long]("ht_pps_usd") - truth) <
      4 * r.getAs[Double]("se_pps_usd") + 0.05 * truth)
    assert(math.abs(r.getAs[Long]("ht_uni_usd") - truth) <
      4 * r.getAs[Double]("se_uni_usd") + 0.05 * truth)
    // the whole point: value-proportional inclusion shrinks HT variance
    assert(r.getAs[Double]("design_effect") > 1.0)
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
