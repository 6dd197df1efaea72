package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-10 batch D (corpus statistics). */
class Round10dOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("text-good-turing: smoothed ladder rises, unseen mass a proper fraction") {
    val r = run("text-good-turing").head()
    assert(r.getAs[Long]("n_tokens") > r.getAs[Long]("n_types"))
    // the sf0.001 synthetic corpus has a ~31-type vocabulary and no
    // hapaxes, so P0 can legitimately be 0 (no Zipf-shape assumption)
    val p0 = r.getAs[Double]("p0_unseen")
    assert(p0 >= 0.0 && p0 < 1.0)
    val rs = (1 to 5).map(i => r.getAs[Double](s"rstar_$i"))
    assert(rs.zip(rs.tail).forall { case (a, b) => a < b })
    assert(rs.head > 0.0)
  }

  test("text-mattr: one row per language, MATTR in (0, 1]") {
    val rows = run("text-mattr").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getAs[Double]("mattr")
      assert(m > 0.0 && m <= 1.0)
      assert(r.getAs[Long]("n_windows") > 0)
    }
  }

  test("text-juilland-d: 20 terms, both dispersion measures in range") {
    val rows = run("text-juilland-d").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val dd = r.getAs[Double]("juilland_d")
      val dp = r.getAs[Double]("gries_dp")
      assert(dd >= 0.0 && dd <= 1.0, s"D out of range: $dd")
      assert(dp >= 0.0 && dp <= 1.0, s"DP out of range: $dp")
    }
    val fs = rows.map(_.getAs[Long]("freq"))
    assert(fs.zip(fs.tail).forall { case (a, b) => a >= b })
  }

  test("text-textrank: 15 keywords, positive scores, sorted") {
    val rows = run("text-textrank").collect()
    assert(rows.length == 15)
    val ss = rows.map(_.getAs[Double]("textrank"))
    assert(ss.zip(ss.tail).forall { case (a, b) => a >= b })
    assert(ss.forall(_ > 0.0))
    rows.foreach(r => assert(r.getAs[String]("term").length >= 4))
  }
}
