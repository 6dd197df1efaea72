package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-9 batch T. */
class Round9tOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("win-rank-movers: movers sorted by absolute delta, ranks positive") {
    val rows = run("win-rank-movers").collect()
    assert(rows.length == 10)
    val deltas = rows.map(r => math.abs(r.getAs[Long]("rank_delta")))
    assert(deltas.zip(deltas.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("r_early") >= 1 && r.getAs[Long]("r_late") >= 1)
      assert(r.getAs[Long]("rank_delta") ==
        r.getAs[Long]("r_early") - r.getAs[Long]("r_late"))
    }
  }

  test("agg-dispersion-index: one row per event type, dispersion positive") {
    val rows = run("agg-dispersion-index").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Double]("dispersion") > 0)
      assert(r.getAs[Long]("n_events") >= r.getAs[Long]("n_days"))
    }
  }

  test("sink-clone-shallow-deep: clones identical, shallow shares all files") {
    val r = run("sink-clone-shallow-deep").head()
    assert(r.getAs[Boolean]("clones_identical"))
    assert(r.getAs[Long]("n_src") == r.getAs[Long]("n_shallow"))
    assert(r.getAs[Long]("n_src") == r.getAs[Long]("n_deep"))
    assert(r.getAs[Int]("shallow_files_shared") == 4)
    assert(r.getAs[Long]("shallow_bytes_copied_flag") == 0)
  }

  test("agg-median-of-means: MoM close to the plain mean on clean data") {
    val r = run("agg-median-of-means").head()
    assert(r.getAs[Long]("n_buckets") == 16)
    assert(r.getAs[Long]("min_bucket_n") > 0)
    val (pm, mom) = (r.getAs[Double]("plain_mean"), r.getAs[Double]("mom_estimate"))
    assert(math.abs(pm - mom) / pm < 0.25,
      s"without injected corruption the two estimators agree loosely ($pm vs $mom)")
  }
}
