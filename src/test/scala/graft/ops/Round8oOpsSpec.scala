package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-8 batch X. */
class Round8oOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("dq-bimodality-units: injected unit mix raises the coefficient") {
    val rows = run("dq-bimodality-units").collect()
    assert(rows.length == 2)
    val byPanel = rows.map(r => r.getAs[String]("panel") -> r).toMap
    val clean = byPanel("clean").getAs[Double]("bimodality_coeff")
    val mixed = byPanel("unit_mixed").getAs[Double]("bimodality_coeff")
    assert(mixed > clean)
    assert(byPanel("unit_mixed").getAs[Boolean]("bimodal_flag"))
  }

  test("gen-gaussian-hash: self-verification within tolerance") {
    val r = run("gen-gaussian-hash").head()
    assert(r.getAs[Long]("n_draws") == 20000L)
    assert(math.abs(r.getAs[Double]("mean")) < 0.03)
    assert(math.abs(r.getAs[Double]("variance") - 1.0) < 0.05)
    val tail = r.getAs[Double]("tail_3sigma_share")
    assert(tail > 0.0005 && tail < 0.008)
  }

  test("agg-capm-beta: betas bracket 1, r2 in range") {
    val rows = run("agg-capm-beta").collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0)
    }
    // market is the weighted combination: some nations above, some below
    val betas = rows.map(_.getAs[Double]("beta"))
    assert(betas.exists(_ > 0.5))
  }

  test("text-oov-coverage: oov decreases as the vocab budget grows") {
    val rows = run("text-oov-coverage").collect()
    assert(rows.length == 4)
    val sorted = rows.sortBy(_.getAs[Int]("k_target"))
    val oov = sorted.map(_.getAs[Double]("oov_rate"))
    assert(oov.zip(oov.tail).forall { case (a, b) => b <= a })
    sorted.foreach { r =>
      assert(r.getAs[Long]("k_actual") >= r.getAs[Int]("k_target"))
      val o = r.getAs[Double]("oov_rate")
      assert(o >= 0.0 && o <= 1.0)
    }
  }
}
