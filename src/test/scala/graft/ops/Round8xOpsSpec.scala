package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-8 batch AG (training planning). */
class Round8xOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("sample-dpo-pairs: chosen and rejected differ, gap enforced") {
    val rows = run("sample-dpo-pairs").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("chosen_doc") != r.getAs[Long]("rejected_doc"))
      assert(r.getAs[Long]("quality_gap_milli") >= 100L)
    }
  }

  test("sample-repeat-value-decay: diminishing returns are monotone") {
    val rows = run("sample-repeat-value-decay").collect()
    assert(rows.length == 5)
    val sorted = rows.sortBy(_.getAs[Int]("epochs"))
    val eff = sorted.map(_.getAs[Long]("effective_tokens"))
    assert(eff.zip(eff.tail).forall { case (a, b) => b > a })
    val marg = sorted.map(_.getAs[Double]("marginal_epoch_value"))
    assert(marg.zip(marg.tail).forall { case (a, b) => b < a })
    // first epoch is nearly full value
    val u = sorted.head.getAs[Long]("u_tokens")
    assert(math.abs(eff.head - u).toDouble / u < 0.05)
  }

  test("agg-chinchilla-allocation: budgets scale params by sqrt(10)") {
    val rows = run("agg-chinchilla-allocation").collect()
    assert(rows.length == 4)
    val sorted = rows.sortBy(_.getAs[Double]("flops"))
    val params = sorted.map(_.getAs[Long]("params_opt"))
    params.zip(params.tail).foreach { case (a, b) =>
      val ratio = b.toDouble / a
      assert(ratio > 3.0 && ratio < 3.4) // sqrt(10) ~ 3.16
    }
    sorted.foreach { r =>
      assert(r.getAs[Long]("tokens_opt") == 20L * r.getAs[Long]("params_opt")
        || math.abs(r.getAs[Long]("tokens_opt") -
          20L * r.getAs[Long]("params_opt")) <= 20L)
      assert(r.getAs[Double]("epochs_needed") > 0.0)
    }
  }

  test("agg-wright-learning-curve: learning rate is 2^b") {
    val r = run("agg-wright-learning-curve").head()
    assert(r.getAs[Long]("n_months") > 24L)
    val b = r.getAs[Double]("wright_b")
    val lr = r.getAs[Double]("learning_rate_per_doubling")
    assert(math.abs(lr - math.pow(2.0, b)) < 0.01)
  }
}
