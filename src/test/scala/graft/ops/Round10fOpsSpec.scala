package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-10 batch F (post-hoc rank tests,
  * linkage EM, seeded betweenness). */
class Round10fOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-dunns-test: 10 pairs, p-values proper, null holds") {
    val rows = run("agg-dunns-test").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val p = r.getAs[Double]("p_two_sided")
      assert(p >= 0.0 && p <= 1.0)
      assert(r.getAs[Long]("n_g") > 0 && r.getAs[Long]("n_h") > 0)
    }
  }

  test("agg-page-trend: L within its arithmetic bounds") {
    val r = run("agg-page-trend").head()
    val b = r.getAs[Long]("n_blocks")
    assert(b >= 4, "at least four complete years in the corpus")
    val l = r.getAs[Long]("l_stat")
    // per block, L ranges from 20 (reversed) to 30 (perfectly rising)
    assert(l >= 20 * b && l <= 30 * b)
    assert(r.getAs[Double]("e_l") == 25.0 * b)
  }

  test("dq-linkage-em: probabilities proper, EM separates m from u") {
    val r = run("dq-linkage-em").head()
    assert(r.getAs[Long]("n_pairs") > 0)
    val p = r.getAs[Double]("p_match")
    assert(p > 0.0 && p < 1.0)
    Seq("segment", "balance", "checkdigit").foreach { f =>
      val m = r.getAs[Double](s"m_$f"); val u = r.getAs[Double](s"u_$f")
      assert(m > 0.0 && m < 1.0 && u > 0.0 && u < 1.0, s"$f: m=$m u=$u")
    }
  }

  test("graph-betweenness-sampled: positive broker scores, sorted") {
    val rows = run("graph-betweenness-sampled").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val bs = rows.map(_.getAs[Double]("betweenness"))
    assert(bs.zip(bs.tail).forall { case (a, b) => a >= b })
    assert(bs.forall(_ > 0.0))
    rows.foreach(r => assert(r.getAs[Long]("n_seed_paths") >= 1 &&
      r.getAs[Long]("n_seed_paths") <= 4 * 5))
  }

  test("graph-eccentricity-sweep: 4 seeds, diameter bound consistent") {
    val rows = run("graph-eccentricity-sweep").collect()
    assert(rows.length == 4)
    val dlb = rows.map(_.getAs[Long]("diameter_lb")).distinct
    assert(dlb.length == 1)
    rows.foreach { r =>
      assert(r.getAs[Long]("ecc_capped") <= 6)
      assert(r.getAs[Long]("ecc_capped") <= dlb.head)
      assert(r.getAs[Long]("n_reached") >= 1)
      val share = r.getAs[Double]("reach_share")
      assert(share > 0.0 && share <= 1.0)
    }
  }
}
