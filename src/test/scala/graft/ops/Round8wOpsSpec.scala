package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-8 batch AF (empirical laws). */
class Round8wOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-lotka-law: exponent positive, fit valid") {
    val r = run("agg-lotka-law").head()
    assert(r.getAs[Long]("n_histogram_points") >= 3L)
    val r2 = r.getAs[Double]("r2")
    assert(r2 >= 0.0 && r2 <= 1.0)
  }

  test("agg-bradford-zones: equal revenue thirds need growing cohorts") {
    val rows = run("agg-bradford-zones").collect()
    assert(rows.length == 3)
    val sorted = rows.sortBy(_.getAs[Int]("zone"))
    val shares = sorted.map(_.getAs[Double]("revenue_share"))
    assert(math.abs(shares.sum - 1.0) < 0.01)
    val counts = sorted.map(_.getAs[Long]("n_suppliers"))
    // scattering: each zone needs at least as many suppliers as the last
    assert(counts(0) <= counts(1) && counts(1) <= counts(2))
  }

  test("agg-gibrat-law: slope finite, verdict consistent") {
    val r = run("agg-gibrat-law").head()
    assert(r.getAs[Long]("k_nations") >= 20L)
    val slope = r.getAs[Double]("growth_size_slope")
    assert(r.getAs[Boolean]("gibrat_holds") == (math.abs(slope) < 0.1))
  }

  test("agg-engel-curve: slope/verdict consistency") {
    val r = run("agg-engel-curve").head()
    assert(r.getAs[Long]("n_buckets") >= 2L)
    val slope = r.getAs[Double]("working_leser_slope")
    assert(r.getAs[Boolean]("low_priority_is_necessity") == (slope < 0.0))
  }
}
