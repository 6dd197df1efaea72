package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-9 batch R. */
class Round9rOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-sprt-boundary: LLR trail is cumulative and decisions follow the bound") {
    val rows = run("agg-sprt-boundary").collect()
    assert(rows.nonEmpty)
    val bound = math.log(0.95 / 0.05)
    rows.foreach { r =>
      val llr = r.getAs[Double]("cum_llr")
      val dec = r.getAs[String]("decision")
      if (llr >= bound) assert(dec == "accept_h1")
      else if (llr <= -bound) assert(dec == "accept_h0")
      else assert(dec == "continue")
      assert(r.getAs[Long]("x") <= r.getAs[Long]("n"))
    }
    // the fixture's ~20% share sits on H0's side: the trail must end decided
    assert(rows.last.getAs[String]("decision") == "accept_h0")
  }

  test("agg-otsu-threshold: both classes populated, variance positive") {
    val r = run("agg-otsu-threshold").head()
    assert(r.getAs[Long]("n_below") > 0 && r.getAs[Long]("n_above") > 0)
    assert(r.getAs[Double]("between_var_norm") > 0)
    assert(r.getAs[Long]("otsu_bin") >= 0 && r.getAs[Long]("otsu_bin") < 256)
  }

  test("graph-ppr-seed: seed ranks first and scores are proximity-ordered") {
    val rows = run("graph-ppr-seed").collect()
    assert(rows.length == 15)
    assert(rows.head.getAs[String]("node") == "s1",
      "the unconditional restart keeps the seed on top")
    val scores = rows.map(_.getAs[Double]("ppr"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(scores.forall(_ >= 0))
  }

  test("src-csv-header-drift: legacy batch is all-null on the drifted column") {
    val rows = run("src-csv-header-drift").collect()
    assert(rows.length == 2)
    val byBatch = rows.map(r => r.getAs[Int]("batch") -> r).toMap
    assert(byBatch(1).getAs[Long]("null_priority") == byBatch(1).getAs[Long]("n_rows"),
      "batch 1 never had the priority column")
    assert(byBatch(2).getAs[Long]("null_priority") == 0,
      "batch 2's priority survives the by-name union")
  }
}
