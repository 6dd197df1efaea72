package graft.plans

import graft.olist.SparkTestBase
import graft.tools.WindowAudit

/** The WindowAudit census, ENFORCED (r9 verdict item 2). Round 9's one
  * defect — layout-overlap-depth's two full-corpus `ntile(32)` global
  * sorts — shipped because the census was a printed report a human had
  * to re-adjudicate each round; its SCALING.md summary mis-classified
  * the op as bounded-frame and nobody was forced to look again. This
  * spec freezes the justified unpartitioned-window keys as an
  * allowlist: a NEW query whose plan contains a logical Window with an
  * empty partitionSpec fails `sbt test` until its frame is argued
  * bounded (SCALING.md house rule: month/date grains, value-domain
  * histograms, post-limit top-k lists, designed-constant grids) and
  * the key added here — or the window is ported to PrefixScan /
  * partitioned form like layout-overlap-depth was.
  *
  * The walk is WindowAudit.census: build-time optimizedPlan counts
  * PLUS plans captured from jobs the build itself executes (the
  * localCheckpoint blind spot — see WindowAudit's scaladoc).
  * Allowlisted keys that STOP being flagged also fail, so the list
  * tracks reality in both directions (a fixed op must shrink it).
  *
  * Census at sf0.001 over all non-stream keys: ~3 min of the suite,
  * the price of making the #1 scale anti-pattern unshippable.
  */
class UnpartitionedWindowCensusSpec extends SparkTestBase {

  /** Keys justified as bounded-frame per the round-10..14
    * adjudication. 100 = round 13's 108 minus the eight r14 ports,
    * chosen as the LARGEST remaining frames:
    * sample-psis-khat (the one true corpus-sized frame left — a
    * row_number over every order's importance weight → PrefixScan
    * rank), agg-hodges-lehmann (k(k+1)/2 Walsh pairs ≈ 2.9M rows at
    * the full 2.4k-day calendar → PrefixScan rank median-by-position),
    * dq-mann-whitney (~550k distinct whole-dollar values → exclusive
    * prefix = PrefixScan cum minus own count), text-vocab-stats
    * (|vocab|, millions on raw web text → PrefixScan rank),
    * text-oov-coverage (count-histogram cum → PrefixScan cum),
    * dq-ks-drift (two ECDF cums over ~1.1k price buckets → two
    * stacked PrefixScan cums), agg-spearman-corr (two midrank domain
    * prefixes → exclusive-cum recipe), win-sweepline-concurrency
    * (date-axis running sum → PrefixScan cum).
    * Round 13 removed seven:
    * agg-uplift-deciles (ntile(5) over PER-USER rows — the one
    * genuinely corpus-sized frame the list still hid, now a
    * withRankCumSum rank + ntileFromRank), agg-decile-report and
    * agg-lorenz-curve (grand-total/running windows over the 10 decile
    * rows → 1-row broadcast agg / 55-pair triangle self-join),
    * dq-fdr-bh (rank+count+max over 25 nations → PrefixScan rank +
    * broadcast cutoff agg), agg-auc-exact (exclusive domain prefix →
    * withRankCumSum cum minus own count), agg-wasserstein-1d (two
    * ECDF cums over the 50-value quantity domain → one triangle
    * self-join), sql-keyset-pagination (two post-limit <=150-row
    * row_numbers → PrefixScan rank stamps). The r12 five were the
    * adjacent-row date-axis frames (withNeighbor/rank-shift ports).
    *
    * Remaining families, with the numeric frame bound at sf1 (frames
    * scale with the CALENDAR or a designed constant, not the corpus):
    *  - month/quarter grain (agg-dow-seasonality, agg-dtw-monthly,
    *    win-holt-brown, …): ≤ 84 rows (7 years × 12 months);
    *  - date grain over a fixed lookback or test series: ≤ 2,406 rows
    *    (the full TPC-H calendar) — kept windowed because each needs
    *    ROLLING k-row frames (win-rolling-* k=7..30, win-rsi 14,
    *    win-hampel-filter 7, win-kaufman-er 10, win-amihud-illiq 21)
    *    or sequential-state scans (dq-page-hinkley, win-binseg-split,
    *    win-level-shift, win-seasonal-decompose)
    *    that neither withNeighbor (adjacent-row only) nor
    *    withRankCumSum (prefix aggregates only) models; the
    *    single-task sort of ≤2.4k rows is O(ms) at any corpus size;
    *  - designed grids / deciles / k-row reports (agg-box-cox-grid
    *    11, agg-skyline-2d post-limit ≤100,
    *    agg-topk-merge k=10, agg-dhondt-apportion seats≤30, …):
    *    ≤ designed k ≤ ~100;
    *  - value-domain histograms (text-zipf-fit top-200 vocab,
    *    dq-binning-advisor 32 bins, ann-cell-balance |cells|=4096,
    *    emb-pq-usage 256 codes, agg-volume-profile-poc 40 price
    *    bins, …): bounded by the declared domain, stated in each
    *    op's scaladoc. */
  private val allowlist: Set[String] = Set(
    "agg-adstock-fit", "agg-almon-lag", "agg-arch-lm-test", "agg-bass-diffusion", "agg-bcg-matrix", "agg-box-cox-grid",
    "agg-calmar-ratio", "agg-capm-beta", "agg-capture-ratios",
    "agg-champion-regret", "agg-changepoint-cusum", "agg-cointegration",
    "agg-conformal-interval", "agg-cornish-fisher-var",
    "agg-cusum-changepoint", "agg-dft-weekly-power", "agg-dhondt-apportion", "agg-dickey-fuller",
    "agg-diebold-mariano", "agg-directional-accuracy", "agg-dow-seasonality",
    "agg-dtw-monthly", "agg-erlang-c-staffing", "agg-extremal-index",
    "agg-forecast-backtest", "agg-forecast-combination",
    "agg-forecast-mse-decomposition", "agg-geo-mean-rate",
    "agg-gompertz-fit", "agg-gpd-pot", "agg-isotonic-minimax", "agg-kelly-criterion", "agg-kruskal-wallis",
    "agg-kyle-lambda", "agg-largest-remainder-apportion", "agg-life-table",
    "agg-littles-law", "agg-littlewood-rule", "agg-ljung-box",
    "agg-logrank-test", "agg-mcf-recurrent",
    "agg-median-of-means", "agg-min-variance-pair", "agg-mincer-zarnowitz",
    "agg-nelson-aalen", "agg-newsvendor-quantile", "agg-otsu-threshold",
    "agg-pinball-loss-eval", "agg-profit-curve", "agg-psm-match",
    "agg-realized-vol", "agg-revenue-beta", "agg-roll-spread",
    "agg-segment-migration", "agg-skyline-2d",
    "agg-sprt-boundary", "agg-survival-km",
    "agg-tail-dependence", "agg-team-draft-interleaving", 
    "agg-topk-merge", "agg-tornqvist-index", "agg-variance-split-stump", "agg-volume-profile-poc",
    "agg-weibull-fit", "agg-wright-learning-curve",
    "ann-cell-balance", "dedup-ivf-recall", "dq-alarm-flappiness",
    "dq-anomaly-zscore", "dq-benford", "dq-binning-advisor",
    "dq-freshness", "dq-holm-stepdown",
    "dq-join-fanout-preflight", "dq-kpss-stationarity", "dq-page-hinkley", "dq-timezone-shift",
    "dq-western-electric",
    "emb-pq-usage", "layout-sort-key-advisor", "mm-modality-balance",
    "sample-curriculum-schedule", "sample-weighted-alloc", "text-ndcg-eval",
    "text-truncation-loss", "text-zipf-fit", "win-amihud-illiq", "win-binseg-split",     "win-hampel-filter", "win-holt-brown", "win-kaufman-er",
    "win-level-shift", "win-peak-detect",
     "win-rolling-corr", "win-rolling-skew",
    "win-rolling-zscore", "win-rsi", "win-rsi-indicator",
    "win-seasonal-decompose", "win-theil-sen")

  test("unpartitioned-window census matches the justified allowlist exactly") {
    val names = WindowAudit.auditNames()
    val (rows, errors) = WindowAudit.census(spark, "/root/testdata/sf0.001", names)
    assert(errors.isEmpty, s"census could not build: ${errors.mkString("; ")}")
    val flagged = rows.filter(_.total > 0).map(_.name).toSet
    val unjustified = flagged -- allowlist
    assert(unjustified.isEmpty,
      s"NEW unpartitioned (global-sort) window in: ${unjustified.toSeq.sorted.mkString(", ")}. " +
        "Justify the frame as bounded (SCALING.md house rule) and add the key " +
        "to this allowlist, or partition the window / port it to PrefixScan.")
    val stale = allowlist -- flagged
    assert(stale.isEmpty,
      s"allowlisted keys no longer flagged (shrink the list): ${stale.toSeq.sorted.mkString(", ")}")
  }
}
