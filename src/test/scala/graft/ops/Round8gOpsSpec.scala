package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-8 batches O and P. */
class Round8gOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("emb-matryoshka-recall: full-dim recall is exactly 1, all in (0,1]") {
    val rows = run("emb-matryoshka-recall").collect()
    assert(rows.map(_.getAs[Int]("m")).toSeq == Seq(8, 16, 32, 64))
    val byM = rows.map(r => r.getAs[Int]("m") -> r.getAs[Double]("recall_at5")).toMap
    assert(byM(64) == 1.0)
    byM.values.foreach(v => assert(v > 0.0 && v <= 1.0))
  }

  test("sample-hard-negative: 3 negatives per anchor, labels differ") {
    val rows = run("sample-hard-negative").collect()
    val perAnchor = rows.groupBy(_.getAs[Long]("anchor"))
    perAnchor.foreach { case (_, g) =>
      assert(g.length == 3)
      assert(g.map(_.getAs[Int]("rk")).sorted.toSeq == Seq(1, 2, 3))
      g.foreach(r =>
        assert(r.getAs[Int]("neg_label") != r.getAs[Int]("alabel")))
      // ranks ordered by distance
      val byRk = g.sortBy(_.getAs[Int]("rk")).map(_.getAs[Long]("d2"))
      assert(byRk.zip(byRk.tail).forall { case (a, b) => a <= b })
    }
  }

  test("agg-isotonic-minimax: fitted curve has zero violations") {
    val r = run("agg-isotonic-minimax").head()
    assert(r.getAs[Long]("fit_violations") == 0L)
    assert(r.getAs[Long]("n_segments") <= r.getAs[Long]("n_months"))
    assert(r.getAs[Double]("fit_first_dollars") <= r.getAs[Double]("fit_last_dollars"))
  }

  test("agg-ransac-line: inlier share positive and bounded") {
    val r = run("agg-ransac-line").head()
    assert(r.getAs[Long]("best_inliers") >= 2L)
    val pct = r.getAs[Double]("inlier_pct")
    assert(pct > 0.0 && pct <= 100.0)
  }

  test("agg-fisher-lda: confusion matrix partitions the orders") {
    val r = run("agg-fisher-lda").head()
    val total = r.getAs[Long]("tp") + r.getAs[Long]("fp") +
      r.getAs[Long]("tn") + r.getAs[Long]("fn")
    assert(total == r.getAs[Long]("n_orders"))
    val acc = r.getAs[Double]("accuracy")
    assert(acc >= 0.0 && acc <= 1.0)
  }

  test("agg-regression-discontinuity: jump equals intercept difference") {
    val r = run("agg-regression-discontinuity").head()
    assert(r.getAs[Long]("n_left") > 0 && r.getAs[Long]("n_right") > 0)
    val jump = r.getAs[Double]("icept_right_usd") - r.getAs[Double]("icept_left_usd")
    assert(math.abs(jump - r.getAs[Double]("rd_jump_usd")) < 0.02)
  }

  test("sample-caliper-matching: matches within caliper, rate bounded") {
    val r = run("sample-caliper-matching").head()
    assert(r.getAs[Long]("n_matched") <= r.getAs[Long]("n_treated"))
    val rate = r.getAs[Double]("match_rate")
    assert(rate > 0.0 && rate <= 1.0)
    assert(r.getAs[Double]("mean_abs_gap_usd") <= 10.0)
    assert(r.getAs[Long]("n_distinct_controls") <= r.getAs[Long]("n_matched"))
  }

  test("agg-dtw-monthly: row recurrence matches the textbook DP exactly") {
    import org.apache.spark.sql.functions._
    val mon = Tables.orders(spark, sf)
      .filter(year(col("o_orderdate")).isin(1996, 1997))
      .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
        .cast("long").as("rev"))
      .collect().map(r => (r.getAs[Int]("y"), r.getAs[Int]("m")) -> r.getAs[Long]("rev"))
      .toMap
    val a = (1 to 12).map(m => mon((1996, m)))
    val b = (1 to 12).map(m => mon((1997, m)))
    // textbook O(n^2) DP, exact Long arithmetic
    val d = Array.fill(12, 12)(0L)
    for (i <- 0 until 12; j <- 0 until 12) {
      val c = math.abs(a(i) - b(j))
      d(i)(j) = c + ((i, j) match {
        case (0, 0) => 0L
        case (0, _) => d(0)(j - 1)
        case (_, 0) => d(i - 1)(0)
        case _      => math.min(d(i - 1)(j), math.min(d(i - 1)(j - 1), d(i)(j - 1)))
      })
    }
    val r = run("agg-dtw-monthly").head()
    assert(r.getAs[Long]("dtw_cents") == d(11)(11))
    assert(r.getAs[Long]("dtw_cents") <= r.getAs[Long]("lockstep_cents"))
    assert(r.getAs[Double]("warp_ratio") <= 1.0)
  }
}
