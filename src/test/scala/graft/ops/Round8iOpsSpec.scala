package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-8 batch R. */
class Round8iOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("text-skipgram-pairs: weights sorted desc, offsets bounded") {
    val rows = run("text-skipgram-pairs").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val ws = rows.map(_.getAs[Long]("w_milli"))
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      // each pair's avg weight per occurrence is in [333, 1000]
      val per = r.getAs[Long]("w_milli").toDouble / r.getAs[Long]("n_pairs")
      assert(per >= 333.0 && per <= 1000.0)
    }
  }

  test("sample-curriculum-schedule: pool grows monotonically to full corpus") {
    val rows = run("sample-curriculum-schedule").collect()
    assert(rows.length == 10)
    val pools = rows.sortBy(_.getAs[Int]("step")).map(_.getAs[Long]("pool_docs"))
    assert(pools.zip(pools.tail).forall { case (a, b) => a <= b })
    val last = rows.maxBy(_.getAs[Int]("step"))
    assert(last.getAs[Long]("competence_milli") == 1000L)
    assert(last.getAs[Double]("char_share") == 1.0)
  }

  test("text-hash-collision-audit: bucket accounting consistent") {
    val r = run("text-hash-collision-audit").head()
    assert(r.getAs[Long]("buckets_used") <= 4096L)
    assert(r.getAs[Long]("buckets_used") <= r.getAs[Long]("n_vocab"))
    // birthday-law expectation should be in the right ballpark
    val exp = r.getAs[Double]("expected_used")
    val used = r.getAs[Long]("buckets_used").toDouble
    assert(math.abs(used - exp) / exp < 0.2)
    val share = r.getAs[Double]("collision_share")
    assert(share >= 0.0 && share <= 1.0)
  }

  test("agg-negative-binomial-fit: zero-class prediction brackets reality") {
    val r = run("agg-negative-binomial-fit").head()
    assert(r.getAs[Double]("dispersion_index") > 0.0)
    assert(r.getAs[Double]("mean_orders") > 0.0)
    val zObs = r.getAs[Long]("zeros_observed").toDouble
    val zNb = r.getAs[Double]("zeros_nb_pred")
    val zPo = r.getAs[Double]("zeros_poisson_pred")
    // NB must not predict fewer zeros than Poisson when overdispersed
    if (r.getAs[Double]("dispersion_index") > 1.0) assert(zNb >= zPo)
    assert(zNb >= 0.0 && zNb <= r.getAs[Long]("n_customers"))
    assert(zObs <= r.getAs[Long]("n_customers"))
  }
}
