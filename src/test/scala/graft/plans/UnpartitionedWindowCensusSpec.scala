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

  /** Keys justified as bounded-frame per the round-10 adjudication
    * (125 = round 9's 126 census minus layout-overlap-depth, fixed).
    * Families: agg-* fold month/quarter/decile/designed-grid frames;
    * dq- and win- run over date-grain series (bounded by the calendar,
    * not the corpus); text-, emb- and sample- rank value-domain
    * histograms or post-limit lists; the rest are ≤k-row report
    * frames. */
  private val allowlist: Set[String] = Set(
    "agg-adstock-fit", "agg-almon-lag", "agg-arch-lm-test", "agg-auc-exact",
    "agg-bass-diffusion", "agg-bcg-matrix", "agg-box-cox-grid",
    "agg-calmar-ratio", "agg-capm-beta", "agg-capture-ratios",
    "agg-champion-regret", "agg-changepoint-cusum", "agg-cointegration",
    "agg-conformal-interval", "agg-cornish-fisher-var",
    "agg-cumulative-uniques", "agg-cusum-changepoint", "agg-decile-report",
    "agg-dft-weekly-power", "agg-dhondt-apportion", "agg-dickey-fuller",
    "agg-diebold-mariano", "agg-directional-accuracy", "agg-dow-seasonality",
    "agg-dtw-monthly", "agg-erlang-c-staffing", "agg-extremal-index",
    "agg-forecast-backtest", "agg-forecast-combination",
    "agg-forecast-mse-decomposition", "agg-geo-mean-rate",
    "agg-gompertz-fit", "agg-gpd-pot", "agg-hodges-lehmann",
    "agg-isotonic-minimax", "agg-kelly-criterion", "agg-kruskal-wallis",
    "agg-kyle-lambda", "agg-largest-remainder-apportion", "agg-life-table",
    "agg-littles-law", "agg-littlewood-rule", "agg-ljung-box",
    "agg-logrank-test", "agg-lorenz-curve", "agg-mcf-recurrent",
    "agg-median-of-means", "agg-min-variance-pair", "agg-mincer-zarnowitz",
    "agg-nelson-aalen", "agg-newsvendor-quantile", "agg-otsu-threshold",
    "agg-pinball-loss-eval", "agg-profit-curve", "agg-psm-match",
    "agg-realized-vol", "agg-revenue-beta", "agg-roll-spread",
    "agg-runs-test", "agg-segment-migration", "agg-skyline-2d",
    "agg-spearman-corr", "agg-sprt-boundary", "agg-survival-km",
    "agg-tail-dependence", "agg-team-draft-interleaving", "agg-theil-u2",
    "agg-topk-merge", "agg-tornqvist-index", "agg-uplift-deciles",
    "agg-variance-split-stump", "agg-volume-profile-poc",
    "agg-wasserstein-1d", "agg-weibull-fit", "agg-wright-learning-curve",
    "ann-cell-balance", "dedup-ivf-recall", "dq-alarm-flappiness",
    "dq-anomaly-zscore", "dq-benford", "dq-binning-advisor",
    "dq-durbin-watson", "dq-fdr-bh", "dq-freshness", "dq-holm-stepdown",
    "dq-join-fanout-preflight", "dq-kpss-stationarity", "dq-ks-drift",
    "dq-mann-whitney", "dq-page-hinkley", "dq-timezone-shift",
    "dq-turning-points", "dq-von-neumann-ratio", "dq-western-electric",
    "emb-pq-usage", "layout-sort-key-advisor", "mm-modality-balance",
    "sample-curriculum-schedule", "sample-psis-khat",
    "sample-weighted-alloc", "sql-keyset-pagination", "text-ndcg-eval",
    "text-oov-coverage", "text-truncation-loss", "text-vocab-stats",
    "text-zipf-fit", "win-amihud-illiq", "win-binseg-split", "win-drawdown",
    "win-hampel-filter", "win-holt-brown", "win-kaufman-er",
    "win-level-shift", "win-open-balance", "win-peak-detect",
    "win-record-highs", "win-rolling-corr", "win-rolling-skew",
    "win-rolling-zscore", "win-rsi", "win-rsi-indicator",
    "win-seasonal-decompose", "win-sweepline-concurrency", "win-theil-sen",
    "win-ulcer-index")

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
