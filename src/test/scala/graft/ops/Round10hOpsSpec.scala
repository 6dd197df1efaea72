package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-8 batches J-M (RelMore174-177). */
class Round10hOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-cucconi: C >= 0, p in (0,1], rejection consistent with C") {
    val r = run("agg-cucconi").head()
    val c = r.getAs[Double]("cucconi_c")
    assert(c >= 0)
    val p = r.getAs[Double]("p_asymptotic")
    assert(p > 0 && p <= 1)
    assert(r.getAs[Boolean]("location_or_scale_shift") == (c >= 3.0))
    assert(r.getAs[Long]("n_a") > 0 && r.getAs[Long]("n_r") > 0)
  }

  test("agg-hotelling-t2: T2 >= 0 and F consistent with it") {
    val r = run("agg-hotelling-t2").head()
    assert(r.getAs[Double]("t2_stat") >= 0)
    assert(r.getAs[Double]("f_stat") >= 0)
    assert(r.getAs[Double]("f_stat") <= r.getAs[Double]("t2_stat") + 1e-9)
  }

  test("agg-levene-test / agg-bartlett-test: nonneg statistics, 3 groups") {
    val lev = run("agg-levene-test").head()
    assert(lev.getAs[Int]("k_groups") == 3)
    assert(lev.getAs[Double]("levene_f") >= 0)
    val bar = run("agg-bartlett-test").head()
    assert(bar.getAs[Int]("k_groups") == 3)
    assert(bar.getAs[Double]("bartlett_chi2") >= 0)
    assert(bar.getAs[Double]("pooled_variance") > 0)
  }

  test("sample-dsir-weights: shares in [0,1], target-like bounded by docs") {
    val rows = run("sample-dsir-weights").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("lang") != "en") // target slice is excluded
      val share = r.getAs[Double]("target_like_share")
      assert(share >= 0 && share <= 1)
      assert(r.getAs[Long]("n_target_like") <= r.getAs[Long]("n_docs"))
    }
  }

  test("mm-audio-vad-stub: active frames bounded, share consistent") {
    val r = run("mm-audio-vad-stub").head()
    val (nf, na) = (r.getAs[Long]("n_frames"), r.getAs[Long]("n_active"))
    assert(na <= nf && nf > 0)
    assert(r.getAs[Long]("max_segment_len") <= na)
    assert(math.abs(r.getAs[Double]("active_share") - na.toDouble / nf) < 1e-3)
  }

  test("sql-grouping-sets: grand total equals the sum of each grain") {
    val rows = run("sql-grouping-sets").collect()
    val detail = rows.filter(r => r.getAs[Int]("g_rf") == 0 && r.getAs[Int]("g_ls") == 0)
    val perFlag = rows.filter(r => r.getAs[Int]("g_rf") == 0 && r.getAs[Int]("g_ls") == 1)
    val total = rows.filter(r => r.getAs[Int]("g_rf") == 1 && r.getAs[Int]("g_ls") == 1)
    assert(total.length == 1)
    val t = total.head.getAs[Double]("revenue")
    assert(math.abs(detail.map(_.getAs[Double]("revenue")).sum - t) < 0.02)
    assert(math.abs(perFlag.map(_.getAs[Double]("revenue")).sum - t) < 0.02)
    assert(rows.map(_.getAs[Long]("n_lines")).max ==
      total.head.getAs[Long]("n_lines"))
  }

  test("sql-rollup-ym: three grains, year rows sum to the grand total") {
    val rows = run("sql-rollup-ym").collect()
    val years = rows.filter(r => r.getAs[Int]("g_yr") == 0 && r.getAs[Int]("g_qtr") == 1)
    val total = rows.filter(r => r.getAs[Int]("g_yr") == 1)
    assert(total.length == 1 && total.head.getAs[Int]("yr") == -1)
    assert(math.abs(years.map(_.getAs[Double]("revenue")).sum -
      total.head.getAs[Double]("revenue")) < 0.02)
  }

  test("sql-cube-year-priority: all four grains present and consistent") {
    val rows = run("sql-cube-year-priority").collect()
    def grain(gy: Int, gp: Int) =
      rows.filter(r => r.getAs[Int]("g_yr") == gy && r.getAs[Int]("g_pri") == gp)
    assert(grain(1, 1).length == 1)
    val t = grain(1, 1).head.getAs[Long]("n_orders")
    assert(grain(0, 0).map(_.getAs[Long]("n_orders")).sum == t)
    assert(grain(0, 1).map(_.getAs[Long]("n_orders")).sum == t)
    assert(grain(1, 0).map(_.getAs[Long]("n_orders")).sum == t)
  }

  test("agg-bitmap-word-distinct: bitmap count equals exact count everywhere") {
    val rows = run("agg-bitmap-word-distinct").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("bitmap_matches"))
      assert(r.getAs[Long]("days_bitmap") == r.getAs[Long]("days_exact"))
      assert(r.getAs[Long]("days_bitmap") <= r.getAs[Long]("n_orders"))
    }
  }

  test("agg-cusum-changepoint: cusum stats nonneg, alarms consistent") {
    val r = run("agg-cusum-changepoint").head()
    assert(r.getAs[Long]("n_days") > 0)
    assert(r.getAs[Double]("max_cusum_up") >= 0)
    assert(r.getAs[Double]("max_cusum_down") >= 0)
    val up = r.getAs[Long]("up_alarms")
    val first = r.getAs[String]("first_up_alarm")
    assert((up > 0) == (first != "none"))
    if (up > 0) assert(r.getAs[Double]("max_cusum_up") > 5.0)
  }

  test("agg-hll-measured: estimate within the p=9 error budget") {
    val rows = run("agg-hll-measured").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_distinct") > 0)
      assert(r.getAs[Double]("hll_estimate") > 0)
      // 1.04/sqrt(512) ~ 4.6% sigma; allow 3-sigma plus small-n slack
      assert(r.getAs[Double]("rel_err_pct") < 15.0,
        s"year ${r.getAs[Int]("yr")} err ${r.getAs[Double]("rel_err_pct")}")
    }
  }

  test("sample-pps-systematic: exactly 100 draws, multiplicity accounted") {
    val r = run("sample-pps-systematic").head()
    assert(r.getAs[Long]("n_draws") == 100)
    assert(r.getAs[Long]("n_selected") <= 100)
    assert(r.getAs[Long]("n_selected") > 0)
    assert(r.getAs[Long]("n_selected") +
      r.getAs[Long]("multi_hit_units") * (r.getAs[Long]("max_hits") - 1) >= 1)
    assert(r.getAs[Long]("first_pk") <= r.getAs[Long]("last_pk"))
    val pct = r.getAs[Double]("sel_value_pct")
    assert(pct > 0 && pct <= 100)
  }

  test("text-burstiness: bounded top-k, rates internally consistent") {
    val rows = run("text-burstiness").collect()
    assert(rows.length <= 15)
    rows.foreach { r =>
      assert(r.getAs[Long]("df") >= 50)
      assert(r.getAs[Long]("cf") >= r.getAs[Long]("df"))
      assert(r.getAs[Double]("katz_rate") >= 1.0) // E[tf|tf>0] >= 1 always
      assert(r.getAs[Double]("poisson_rate") >= 1.0)
      assert(r.getAs[Double]("burstiness") > 0)
    }
    val b = rows.map(_.getAs[Double]("burstiness"))
    assert(b.zip(b.tail).forall { case (x, y) => x >= y })
  }

  test("emb-zca-whitening: post-whitening covariance is the identity") {
    val r = run("emb-zca-whitening").head()
    assert(math.abs(r.getAs[Double]("post_xx") - 1.0) < 0.01)
    assert(math.abs(r.getAs[Double]("post_yy") - 1.0) < 0.01)
    assert(math.abs(r.getAs[Double]("post_xy")) < 0.01)
    assert(r.getAs[Double]("cov_xx") > 0 && r.getAs[Double]("cov_yy") > 0)
    assert(r.getAs[Double]("w11") > 0 && r.getAs[Double]("w22") > 0)
  }

  test("agg-countmin-measured: estimates never undercount") {
    val rows = run("agg-countmin-measured").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_n") >= r.getAs[Long]("exact_n"))
      assert(r.getAs[Long]("overestimate") >= 0)
      assert(r.getAs[Double]("over_pct") >= 0)
    }
    val ex = rows.map(_.getAs[Long]("exact_n"))
    assert(ex.zip(ex.tail).forall { case (a, b) => a >= b })
  }

  test("agg-hdr-histogram: lower bound within the 1/32 octave budget") {
    val rows = run("agg-hdr-histogram").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (exact, lb) = (r.getAs[Long]("exact_cents"), r.getAs[Long]("hdr_lower_cents"))
      assert(lb <= exact)
      assert(r.getAs[Double]("rel_err_pct") >= 0)
      assert(r.getAs[Double]("rel_err_pct") <= 100.0 / 32 + 0.01,
        s"p${r.getAs[Int]("pct")}: lb $lb exact $exact")
    }
  }

  test("join-band: matched pairs are a subset of bucket candidates") {
    val r = run("join-band").head()
    assert(r.getAs[Long]("n_pairs") <= r.getAs[Long]("n_candidates"))
    assert(r.getAs[Long]("max_pairs_one_brand") <= r.getAs[Long]("n_pairs"))
    if (r.getAs[Long]("n_pairs") > 0) {
      assert(r.getAs[Long]("n_brands_with_pairs") > 0)
      val gap = r.getAs[Double]("avg_gap_cents")
      assert(gap >= 0 && gap <= 100)
    }
  }

  test("dq-page-hinkley: prefix-min PH nonneg, alarm bar positive") {
    val r = run("dq-page-hinkley").head()
    assert(r.getAs[Long]("n_days") > 0)
    assert(r.getAs[Long]("grand_mean_cents") > 0)
    assert(r.getAs[Double]("max_ph_cents") >= 0)
    assert(r.getAs[Double]("lambda_cents") > 0)
    val alarms = r.getAs[Long]("n_alarms")
    assert((alarms > 0) == (r.getAs[String]("first_alarm") != "none"))
  }
}
