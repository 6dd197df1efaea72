package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-8 batch W. */
class Round8nOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-borda-condorcet: at most one condorcet winner, points bounded") {
    val rows = run("agg-borda-condorcet").collect()
    assert(rows.nonEmpty && rows.length <= 5)
    assert(rows.count(_.getAs[Boolean]("condorcet_winner")) <= 1)
    val pts = rows.map(_.getAs[Long]("borda_points"))
    assert(pts.zip(pts.tail).forall { case (a, b) => a >= b })
    pts.foreach(p => assert(p >= 1L && p <= 30L))
  }

  test("agg-kelly-criterion: overbetting halves growth, then kills it") {
    val r = run("agg-kelly-criterion").head()
    assert(r.getAs[Double]("sigma2") > 0.0)
    val gf = r.getAs[Double]("growth_full")
    val gh = r.getAs[Double]("growth_half")
    val gd = r.getAs[Double]("growth_double")
    // g(f*) = mu^2/2v > 0; g(f*/2) = 3/4 g(f*); g(2f*) = 0
    assert(gf >= gh && gh > 0.0 || gf == 0.0)
    assert(math.abs(gd) < 1e-6)
    assert(math.abs(gh - 0.75 * gf) < 1e-4)
  }

  test("agg-topsis-scorecard: closeness in (0,1), sorted desc") {
    val rows = run("agg-topsis-scorecard").collect()
    assert(rows.length == 10)
    val cs = rows.map(_.getAs[Double]("closeness"))
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      val c = r.getAs[Double]("closeness")
      assert(c >= 0.0 && c <= 1.0)
      assert(r.getAs[Double]("d_ideal") >= 0.0)
      assert(r.getAs[Double]("d_anti") >= 0.0)
    }
  }

  test("agg-bradley-terry: strengths normalized, ranks follow wins broadly") {
    val rows = run("agg-bradley-terry").collect()
    assert(rows.length == 5)
    val mean = rows.map(_.getAs[Double]("bt_strength")).sum / 5
    assert(math.abs(mean - 1.0) < 0.01)
    rows.foreach(r => assert(r.getAs[Double]("bt_strength") > 0.0))
    // with a full round-robin design, the strength order matches win order
    val byStrength = rows.map(_.getAs[String]("priority")).toSeq
    val byWins = rows.sortBy(r => (-r.getAs[Long]("pair_wins"),
      r.getAs[String]("priority"))).map(_.getAs[String]("priority")).toSeq
    assert(byStrength == byWins)
  }
}
