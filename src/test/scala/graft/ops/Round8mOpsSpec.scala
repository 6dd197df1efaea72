package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-8 batch V. */
class Round8mOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("dq-clipping-detect: shares consistent with histogram") {
    val r = run("dq-clipping-detect").head()
    assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_rows"))
    val maxShare = r.getAs[Double]("max_atom_share")
    assert(maxShare > 0.0 && maxShare <= 1.0)
    // verdict must agree with its own definition
    val expected = maxShare > 2.0 * r.getAs[Double]("mean_atom_share") - 1e-9
    assert(r.getAs[Boolean]("clipping_suspected") == expected ||
      math.abs(maxShare - 2.0 * r.getAs[Double]("mean_atom_share")) < 1e-5)
  }

  test("agg-huber-m-estimator: robust estimate between median-ish and mean") {
    val r = run("agg-huber-m-estimator").head()
    assert(r.getAs[Double]("sigma_usd") > 0.0)
    assert(r.getAs[Long]("downweighted") >= 0L)
    assert(r.getAs[Double]("downweighted_share") <= 1.0)
    // on near-symmetric data the M-estimate stays close to the mean
    // (robustness costs nothing when there is nothing to resist)
    assert(math.abs(r.getAs[Double]("huber_usd") - r.getAs[Double]("mean_usd"))
      < r.getAs[Double]("sigma_usd"))
  }

  test("sample-switchback-design: balance near half, exposure bounded") {
    val r = run("sample-switchback-design").head()
    assert(r.getAs[Long]("n_windows") > 50L)
    val wb = r.getAs[Double]("window_balance")
    assert(wb > 0.3 && wb < 0.7)
    assert(r.getAs[Long]("n_switches") <= r.getAs[Long]("n_windows"))
    // boundary-exposed rows are a subset of first-day rows (~1/7)
    assert(r.getAs[Double]("carryover_exposed_share") < 0.2)
  }

  test("agg-team-draft-interleaving: credit accounting closes") {
    val r = run("agg-team-draft-interleaving").head()
    assert(r.getAs[Long]("list_len") == 20L)
    assert(r.getAs[Long]("clicks_a") + r.getAs[Long]("clicks_b") ==
      r.getAs[Long]("clicks_total"))
    assert(r.getAs[Long]("from_a") <= 20L)
    val w = r.getAs[String]("winner")
    assert(Set("A", "B", "tie").contains(w))
  }
}
