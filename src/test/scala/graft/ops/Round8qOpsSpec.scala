package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-8 batch Z2. */
class Round8qOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-littlewood-rule: protection level is a real demand value") {
    val r = run("agg-littlewood-rule").head()
    assert(r.getAs[Long]("n_months") > 0)
    assert(r.getAs[Long]("protection_level") > 0)
    assert(r.getAs[Long]("months_spilled") <= r.getAs[Long]("n_months"))
    assert(r.getAs[Double]("critical_ratio") > 0.0)
  }

  test("dq-proportion-ci-wilson: wilson never wider-and-worse than wald") {
    val r = run("dq-proportion-ci-wilson").head()
    assert(r.getAs[Long]("k_nations") == 25L)
    assert(r.getAs[Long]("wald_covers") <= 25L)
    assert(r.getAs[Long]("wilson_covers") <= 25L)
    assert(r.getAs[Double]("wald_avg_width") > 0.0)
    assert(r.getAs[Double]("wilson_avg_width") > 0.0)
  }

  test("agg-mark-recapture: chapman estimate lands near the truth") {
    val r = run("agg-mark-recapture").head()
    assert(r.getAs[Long]("m") <= r.getAs[Long]("n1"))
    assert(r.getAs[Long]("m") <= r.getAs[Long]("n2"))
    // ~20% captures on 1500 orders -> overlap ~60; Chapman should land
    // within ~3 SE of the truth
    val err = math.abs(r.getAs[Long]("n_chapman") - r.getAs[Long]("n_true"))
    assert(err < 4 * r.getAs[Double]("se_chapman") + 0.05 * r.getAs[Long]("n_true"))
  }

  test("text-chao1-ngram-richness: estimator bounds observed from above") {
    val r = run("text-chao1-ngram-richness").head()
    assert(r.getAs[Long]("chao1_richness") >= r.getAs[Long]("d_obs"))
    assert(r.getAs[Long]("f1") + r.getAs[Long]("f2") <= r.getAs[Long]("d_obs"))
    val cov = r.getAs[Double]("gt_coverage")
    assert(cov >= 0.0 && cov <= 1.0)
  }
}
