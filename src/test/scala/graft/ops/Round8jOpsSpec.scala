package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-8 batch S. */
class Round8jOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("ann-rng-diversify: pruning only removes, never adds") {
    val rows = run("ann-rng-diversify").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("edges_kept") <= r.getAs[Long]("edges_knn"))
      assert(r.getAs[Long]("edges_kept") >= r.getAs[Long]("nodes"))
      val share = r.getAs[Double]("pruned_share")
      assert(share >= 0.0 && share < 1.0)
    }
    // on clustered data the RNG rule should prune SOMETHING somewhere
    assert(rows.map(_.getAs[Long]("edges_knn")).sum >
      rows.map(_.getAs[Long]("edges_kept")).sum)
  }

  test("layout-sort-key-advisor: exactly one best, bounds sane") {
    val rows = run("layout-sort-key-advisor").collect()
    assert(rows.length == 4)
    assert(rows.count(_.getAs[Boolean]("best")) >= 1)
    val first = rows.head
    assert(first.getAs[Boolean]("best"))
    rows.foreach { r =>
      assert(r.getAs[Long]("total_runs_bound") ==
        r.getAs[Long]("runs_partkey") + r.getAs[Long]("runs_quantity") +
          r.getAs[Long]("runs_discount"))
    }
  }

  test("mm-letterbox-detect: detector reconstructs every injected border") {
    val rows = run("mm-letterbox-detect").collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("detector_correct"))
      assert(r.getAs[Int]("crop_top") == r.getAs[Int]("border_injected"))
      assert(r.getAs[Long]("active_rows") ==
        16L - 2 * r.getAs[Int]("border_injected"))
      assert(r.getAs[Boolean]("letterboxed") == (r.getAs[Int]("crop_top") > 0))
    }
    // the hash-driven injection should produce a mix of both classes
    assert(rows.exists(_.getAs[Boolean]("letterboxed")))
    assert(rows.exists(!_.getAs[Boolean]("letterboxed")))
  }

  test("agg-markov-attribution: shares sum to 1, removal never helps") {
    val rows = run("agg-markov-attribution").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getAs[Double]("p_conv_removed") <=
        r.getAs[Double]("p_conv_full") + 1e-9)
      assert(r.getAs[Double]("removal_effect") >= 0.0)
    }
    val shareSum = rows.map(_.getAs[Double]("attribution_share")).sum
    assert(math.abs(shareSum - 1.0) < 0.01)
  }
}
