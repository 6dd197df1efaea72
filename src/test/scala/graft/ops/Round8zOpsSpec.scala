package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-8 batch AI (distance family). */
class Round8zOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("dq-binning-advisor: rules ordered sensibly on a 50-value domain") {
    val r = run("dq-binning-advisor").head()
    assert(r.getAs[Long]("iqr") > 0L)
    assert(r.getAs[Long]("sturges_bins") >= 5L)
    assert(r.getAs[Long]("scott_bins") >= 1L)
    assert(r.getAs[Long]("fd_bins") >= 1L)
  }

  test("agg-cox-stuart-trend: z consistent with verdict") {
    val r = run("agg-cox-stuart-trend").head()
    assert(r.getAs[Long]("rises") <= r.getAs[Long]("m_pairs"))
    val z = r.getAs[Double]("z_stat")
    assert(r.getAs[Boolean]("trend_detected") == (math.abs(z) > 1.96))
  }

  test("dq-distribution-distance-panel: metric inequalities hold") {
    val r = run("dq-distribution-distance-panel").head()
    val tv = r.getAs[Double]("total_variation")
    val h = r.getAs[Double]("hellinger")
    assert(tv >= 0.0 && tv <= 1.0)
    assert(h >= 0.0 && h <= 1.0)
    // H^2 <= TV <= sqrt(2) H
    assert(h * h <= tv + 1e-9)
    assert(tv <= math.sqrt(2.0) * h + 1e-9)
    assert(r.getAs[Double]("bhattacharyya") >= 0.0)
  }

  test("agg-wasserstein-1d: bounded by the domain span") {
    val r = run("agg-wasserstein-1d").head()
    val w1 = r.getAs[Double]("wasserstein_1")
    assert(w1 >= 0.0)
    assert(w1 <= r.getAs[Long]("domain_size").toDouble)
  }
}
