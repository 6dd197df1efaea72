package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-8 batch AJ (inference metrics). */
class Round8aaOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("text-self-bleu: precisions are proportions, min<=avg<=max") {
    val r = run("text-self-bleu").head()
    assert(r.getAs[Long]("n_probes") > 0)
    val (mn, av, mx) = (r.getAs[Double]("self_bleu2_min"),
      r.getAs[Double]("self_bleu2_avg"), r.getAs[Double]("self_bleu2_max"))
    assert(mn >= 0.0 && mx <= 1.0)
    assert(mn <= av + 1e-9 && av <= mx + 1e-9)
  }

  test("sample-best-of-n-curve: expected best grows, gains monotone") {
    val rows = run("sample-best-of-n-curve").collect()
    assert(rows.map(_.getAs[Int]("n_samples")).toSeq == Seq(1, 2, 4, 8))
    val e = rows.map(_.getAs[Double]("expected_best_reward_milli"))
    assert(e.zip(e.tail).forall { case (a, b) => b >= a - 1e-9 })
    val g = rows.map(_.getAs[Double]("gain_vs_single"))
    assert(math.abs(g.head - 1.0) < 1e-6)
    assert(g.last >= g.head)
  }

  test("emb-moe-router-balance: shares and aux loss well-formed") {
    val r = run("emb-moe-router-balance").head()
    assert(r.getAs[Long]("experts_used") + r.getAs[Long]("dead_experts") == 8L)
    assert(r.getAs[Double]("max_load") >= r.getAs[Double]("min_load"))
    // 8*sum(f^2) is minimized at 1.0 for perfect balance
    assert(r.getAs[Double]("aux_balance_loss") >= 1.0 - 1e-9)
  }

  test("text-kv-prefix-cache-savings: accounting closes") {
    val r = run("text-kv-prefix-cache-savings").head()
    assert(r.getAs[Long]("n_prefixes") <= r.getAs[Long]("n_docs"))
    assert(r.getAs[Long]("tokens_saved") <= r.getAs[Long]("total_tokens"))
    assert(r.getAs[Long]("tokens_saved") ==
      8L * (r.getAs[Long]("n_docs") - r.getAs[Long]("n_prefixes")))
    val share = r.getAs[Double]("savings_share")
    assert(share >= 0.0 && share < 1.0)
  }
}
