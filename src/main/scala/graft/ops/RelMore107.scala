package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import Tables._

/** Round-11 batch H: Engle-Granger cointegration, embedding isotropy,
  * hash k-fold assignment, zone-map skipping simulation. */
object RelMore107 {

  /** agg-cointegration — Engle-Granger two-step cointegration test
    * between the daily order-count and daily revenue series: (1) OLS
    * y = a + b·x on exact integer daily aggregates, (2) Dickey-Fuller
    * regression (no intercept, per Engle-Granger) on the residuals.
    * Two trending series that never drift apart (t below the −3.34
    * 5% critical literal) can be modeled by their SPREAD — the
    * error-correction insight behind pairs trading and demand/revenue
    * reconciliation. agg-dickey-fuller asks "is one series a random
    * walk"; this asks "do two walks walk together". Determinism: the
    * five OLS sums are exact (DECIMAL(38,0)); residuals are formed
    * from the EXACT integer identity R_t = n·den·y_t − den·Sy −
    * num·n·x_t + num·Sx (≈5e18 ≪ 10³⁸), floor-quantized to dollars
    * via one double division of identical exact operands, and the DF
    * sums over the quantized residuals are exact again — no
    * partition-order float summation anywhere. The −3.34 critical
    * value (EG, 2 variables, 5%) is a declared constant: response-
    * surface p-values are out of scope and said so. One day-keyed
    * agg + one calendar-length window — 100 TB cost is the daily
    * rollup scan. */
  val aggCointegration: Q = (s, d) => {
    val daily = orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("dt"))
      .agg(count(lit(1)).as("x"),
        sum(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")).as("y"))
    val sums = daily.select(
      expr("CAST(x AS DECIMAL(38,0))").as("xd"),
      expr("CAST(y AS DECIMAL(38,0))").as("yd"))
      .agg(count(lit(1)).cast(DecimalType(38, 0)).as("n"),
        sum("xd").as("sx"), sum("yd").as("sy"),
        sum(expr("xd * xd")).as("sxx"), sum(expr("xd * yd")).as("sxy"))
      .select(col("n"), col("sx"), col("sy"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("den"))
    val resid = daily.crossJoin(broadcast(sums))
      .select(col("dt"), col("n"),
        (col("n") * col("den") * col("y") - col("den") * col("sy")
          - col("num") * col("n") * col("x") + col("num") * col("sx")).as("r"),
        (col("n") * col("den") * lit(100)).as("nd"),
        (col("num").cast(DoubleType) / col("den").cast(DoubleType)).as("beta"))
      .select(col("dt"), col("n"), col("beta"),
        floor(col("r").cast(DoubleType) / col("nd").cast(DoubleType))
          .cast(LongType).as("eq"))
    val wd = Window.orderBy("dt")
    val df = resid
      .withColumn("el", lag("eq", 1).over(wd))
      .filter(col("el").isNotNull)
      .select(col("n"), col("beta"),
        expr("CAST(el AS DECIMAL(38,0))").as("el"),
        expr("CAST(eq - el AS DECIMAL(38,0))").as("de"))
      .groupBy("n", "beta")
      .agg(sum(expr("el * el")).cast(DoubleType).as("se2"),
        sum(expr("el * de")).cast(DoubleType).as("sed"),
        sum(expr("de * de")).cast(DoubleType).as("sdd"),
        count(lit(1)).cast(DoubleType).as("m"))
    df.select(col("n").cast(LongType).as("n_days"),
      round(col("beta"), 6).as("beta"),
      round(col("sed") / col("se2"), 6).as("rho"),
      round((col("sed") / col("se2")) /
        sqrt(((col("sdd") - col("sed") * col("sed") / col("se2")) /
          (col("m") - 1)) / col("se2")), 4).as("t_stat"),
      ((col("sed") / col("se2")) /
        sqrt(((col("sdd") - col("sed") * col("sed") / col("se2")) /
          (col("m") - 1)) / col("se2")) < -3.34).as("cointegrated"))
  }

  val aggCointegrationSql: String =
    """WITH daily AS (
      |  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS dt,
      |         CAST(count(*) AS BIGINT) AS x,
      |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS y
      |  FROM orders GROUP BY 1),
      |sums AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n,
      |         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
      |         CAST(count(*) AS HUGEINT) * sum(CAST(x AS HUGEINT) * y)
      |           - CAST(sum(x) AS HUGEINT) * sum(CAST(y AS HUGEINT)) AS num,
      |         CAST(count(*) AS HUGEINT) * sum(CAST(x AS HUGEINT) * x)
      |           - CAST(sum(x) AS HUGEINT) * sum(CAST(x AS HUGEINT)) AS den
      |  FROM daily),
      |resid AS (
      |  SELECT dt, n, CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS beta,
      |         CAST(floor(CAST(n * den * y - den * sy - num * n * x + num * sx AS DOUBLE)
      |               / CAST(n * den * 100 AS DOUBLE)) AS BIGINT) AS eq
      |  FROM daily CROSS JOIN sums),
      |lagged AS (
      |  SELECT n, beta, CAST(el AS HUGEINT) AS el, CAST(eq - el AS HUGEINT) AS de FROM (
      |    SELECT n, beta, eq, lag(eq) OVER (ORDER BY dt) AS el FROM resid) t
      |  WHERE el IS NOT NULL),
      |dfs AS (
      |  SELECT n, beta,
      |         CAST(sum(el * el) AS DOUBLE) AS se2, CAST(sum(el * de) AS DOUBLE) AS sed,
      |         CAST(sum(de * de) AS DOUBLE) AS sdd, CAST(count(*) AS DOUBLE) AS m
      |  FROM lagged GROUP BY 1, 2)
      |SELECT CAST(n AS BIGINT) AS n_days, round(beta, 6) AS beta,
      |       round(sed / se2, 6) AS rho,
      |       round((sed / se2) / sqrt(((sdd - sed * sed / se2) / (m - 1)) / se2), 4) AS t_stat,
      |       (sed / se2) / sqrt(((sdd - sed * sed / se2) / (m - 1)) / se2) < -3.34 AS cointegrated
      |FROM dfs""".stripMargin

  /** emb-isotropy — mean-vector isotropy ratio of the embedding
    * corpus: ‖μ‖² / E‖x‖² = ΣₖSₖ² / (n·Σᵢₖxᵢₖ²), where Sₖ is the
    * per-dimension component sum. An isotropic cloud scores ≈1/n; a
    * corpus with a dominant "common direction" (the anisotropy that
    * degrades cosine retrieval — the all-but-the-top observation)
    * scores orders of magnitude higher, and the dominant dimension is
    * reported with its signed component sum so the offender is
    * actionable, not just detected. All sums are exact over
    * milli-quantized components; the two ratio outputs go through
    * ratioFloor (tie-free, identical IEEE ops in both engines). ONE
    * pass over the long-form corpus into a 64-row agg + singleton
    * audit row — at 100 TB this is a map-side-combinable scan, no
    * join, no window over data-sized input. */
  val embIsotropy: Q = (s, d) => {
    val m = embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("k", "x")))
      .select(col("vec_id"), col("k"),
        floor(col("x").cast(DoubleType) * lit(1000.0) + lit(0.5)).cast(LongType).as("mq"))
    val dims = m.groupBy("k")
      .agg(sum("mq").as("sk"), sum(expr("mq * mq")).as("ssq"),
        count_distinct(col("vec_id")).as("nv"))
      .sharedCache()
    val tot = dims.agg(
      sum(expr("CAST(sk AS DECIMAL(38,0)) * sk")).as("num"),
      sum(expr("CAST(ssq AS DECIMAL(38,0))")).as("ssq_all"),
      max("nv").as("n"))
    val dom = dims.orderBy(abs(col("sk")).desc, col("k")).limit(1)
      .select(col("k").cast(LongType).as("dom_k"), col("sk").as("dom_sum_mq"))
    tot.crossJoin(dom)
      .select(col("n").cast(LongType).as("n_vecs"),
        ratioFloor(col("num").cast(DoubleType),
          col("n").cast(DecimalType(38, 0)) * col("ssq_all"), 8).as("iso_ratio"),
        ratioFloor(lit(1.0), col("n"), 8).as("iso_floor"),
        col("dom_k"), col("dom_sum_mq"))
  }

  val embIsotropySql: String =
    """WITH m AS (
      |  SELECT vec_id,
      |         unnest(range(0, len(embedding))) AS k,
      |         CAST(floor(unnest(list_transform(embedding,
      |                    x -> CAST(x AS DOUBLE))) * 1000 + 0.5) AS BIGINT) AS mq
      |  FROM embeddings),
      |dims AS (
      |  SELECT k, CAST(sum(mq) AS BIGINT) AS sk,
      |         CAST(sum(mq * mq) AS BIGINT) AS ssq,
      |         CAST(count(DISTINCT vec_id) AS BIGINT) AS nv
      |  FROM m GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(CAST(sk AS HUGEINT) * sk) AS HUGEINT) AS num,
      |         CAST(sum(CAST(ssq AS HUGEINT)) AS HUGEINT) AS ssq_all,
      |         max(nv) AS n
      |  FROM dims),
      |dom AS (
      |  SELECT CAST(k AS BIGINT) AS dom_k, sk AS dom_sum_mq
      |  FROM dims ORDER BY abs(sk) DESC, k LIMIT 1)
      |SELECT CAST(n AS BIGINT) AS n_vecs,
      |       floor(CAST(num AS DOUBLE) * 1e8 / CAST(n * ssq_all AS DOUBLE)) / 1e8 AS iso_ratio,
      |       floor(CAST(1.0 AS DOUBLE) * 1e8 / n) / 1e8 AS iso_floor,
      |       dom_k, dom_sum_mq
      |FROM tot CROSS JOIN dom""".stripMargin

  /** sample-kfold-assign — deterministic 5-fold cross-validation
    * assignment at CUSTOMER granularity: fold = md5-byte(custkey) mod
    * 5, so every order of a customer lands in the same fold (the
    * group-integrity property that keeps per-customer signal out of
    * the held-out fold — fold-level leakage is the classic silent CV
    * inflation). The leakage property is GRADED, not assumed: the
    * max number of distinct folds any customer touches is emitted
    * (must be 1) alongside per-fold customer/order counts and order
    * share. Hash-derived (text-hash-split discipline: md5 nibbles,
    * identical text in both engines), so the assignment is stable
    * under reruns, re-partitioning, and incremental appends — no RNG
    * state to coordinate across 1000 executors. One order scan + one
    * custkey-keyed agg. */
  val sampleKfoldAssign: Q = (s, d) => {
    val folded = orders(s, d).withColumn("fold", expr(
      "((instr('0123456789abcdef', substring(md5(CAST(o_custkey AS STRING)), 1, 1)) - 1) * 16 + " +
        "(instr('0123456789abcdef', substring(md5(CAST(o_custkey AS STRING)), 2, 1)) - 1)) % 5"))
      .sharedCache()
    val leak = folded.groupBy("o_custkey")
      .agg(count_distinct(col("fold")).as("nf"))
      .agg(max("nf").as("leak_max_folds"))
    val tot = folded.agg(count(lit(1)).as("n_total"))
    folded.groupBy("fold")
      .agg(count_distinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"))
      .crossJoin(broadcast(tot)).crossJoin(broadcast(leak))
      .select(col("fold").cast(LongType).as("fold"), col("n_customers"),
        col("n_orders"), ratioFloor(col("n_orders"), col("n_total"), 6).as("order_share"),
        col("leak_max_folds"))
      .orderBy("fold")
  }

  val sampleKfoldAssignSql: String =
    """WITH folded AS (
      |  SELECT o_custkey,
      |         ((strpos('0123456789abcdef', substring(md5(CAST(o_custkey AS VARCHAR)), 1, 1)) - 1) * 16 +
      |          (strpos('0123456789abcdef', substring(md5(CAST(o_custkey AS VARCHAR)), 2, 1)) - 1)) % 5 AS fold
      |  FROM orders),
      |leak AS (
      |  SELECT CAST(max(nf) AS BIGINT) AS leak_max_folds FROM (
      |    SELECT o_custkey, count(DISTINCT fold) AS nf FROM folded GROUP BY 1) t),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM folded)
      |SELECT CAST(fold AS BIGINT) AS fold,
      |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
      |       CAST(count(*) AS BIGINT) AS n_orders,
      |       floor(CAST(count(*) AS DOUBLE) * 1e6 / n_total) / 1e6 AS order_share,
      |       leak_max_folds
      |FROM folded CROSS JOIN tot CROSS JOIN leak
      |GROUP BY fold, n_total, leak_max_folds
      |ORDER BY fold""".stripMargin

  /** layout-overscan-rows — ROW-weighted zone-map overscan under
    * two 32-file layouts of lineitem for a one-month shipdate range:
    * SORTED (files = shipdate ntiles — what a sort-on-write sink
    * produces) vs HASHED (files = orderkey hash buckets — what an
    * unsorted ingest produces). The sibling layout-zonemap-skipping
    * (RelMore55) counts FILES skipped over a 12-predicate panel;
    * this op weighs the skip by ROWS and emits the overscan ratio
    * (wasted rows / scanned rows), the quantity a scan-cost model
    * actually bills. Per layout the
    * per-file [min,max] shipdate zone maps decide which files a
    * range predicate must scan; the row emits files scanned, rows
    * scanned, and the true matching rows, so the sorted layout's
    * skipping win (≈1/32 of files vs all of them) is MEASURED. This
    * is the decision procedure behind sort-on-write at 100 TB: zone
    * maps are the only scan pruning that survives when partitioning
    * is spent on another column. The probe month is data-derived
    * (min shipdate + 1 year); ntile's remainder rule is identical in
    * both engines given the total tiebreak order. */
  val layoutZonemapSkipping: Q = (s, d) => {
    val li = lineitem(s, d).select(
      to_date(col("l_shipdate")).as("sd"), col("l_orderkey"))
    val probe = li.agg(date_add(min("sd"), 365).as("lo"), date_add(min("sd"), 395).as("hi"))
    // The sorted layout's per-file (zmin, zmax, rows) stats depend only
    // on how many rows of each DATE land in each file — rows that share
    // a shipdate are interchangeable under the (sd, orderkey, linenumber)
    // ntile order. So never materialize a row-level rank: collapse to the
    // date histogram (map-side combine, |dates| rows out), PrefixScan the
    // cumulative counts, and split each date's rank interval [rs, re]
    // across the ntile file boundaries it crosses (≤ |dates| + 31 rows
    // after the explode). Same SQL-standard remainder rule as ntile,
    // same window-SQL oracle, but the only fact-table passes are two
    // map-side-combined aggregates.
    val hist = li.groupBy("sd").agg(count(lit(1)).as("c")).sharedCache()
    val spans = graft.functions.PrefixScan.ntileSpans(
      hist, Seq(col("sd")), "c", 32L)
    val sortedZones = spans.df
      .groupBy(lit("sorted").as("layout"), col("f"))
      .agg(min("sd").as("zmin"), max("sd").as("zmax"), sum("rows_f").as("rows"))
    val hashedZones = li
      .withColumn("f", expr(
        "((instr('0123456789abcdef', substring(md5(CAST(l_orderkey AS STRING)), 1, 1)) - 1) * 16 + " +
          "(instr('0123456789abcdef', substring(md5(CAST(l_orderkey AS STRING)), 2, 1)) - 1)) % 32")
        .cast(LongType))
      .groupBy(lit("hashed").as("layout"), col("f"))
      .agg(min("sd").as("zmin"), max("sd").as("zmax"), count(lit(1)).as("rows"))
    val zones = sortedZones.unionByName(hashedZones)
      .crossJoin(broadcast(probe))
      .withColumn("scanned", col("zmax") >= col("lo") && col("zmin") < col("hi"))
    // both layouts hold the same rows, so the true match count is one
    // histogram filter, shared by both output rows
    val matchTotal = hist.crossJoin(broadcast(probe))
      .filter(col("sd") >= col("lo") && col("sd") < col("hi"))
      .agg(sum("c").as("rows_matching"))
    zones.groupBy("layout")
      .agg(count(lit(1)).as("files_total"),
        sum(when(col("scanned"), 1L).otherwise(0L)).as("files_scanned"),
        sum(when(col("scanned"), col("rows")).otherwise(0L)).as("rows_scanned"))
      .crossJoin(broadcast(matchTotal))
      .select(col("layout"), col("files_total"), col("files_scanned"),
        col("rows_scanned"), col("rows_matching"),
        ratioFloor(col("rows_scanned") - col("rows_matching"),
          col("rows_scanned"), 6).as("overscan_ratio"))
      .orderBy("layout")
  }

  val layoutZonemapSkippingSql: String =
    """WITH li AS (
      |  SELECT CAST(date_trunc('day', l_shipdate) AS DATE) AS sd, l_orderkey, l_linenumber
      |  FROM lineitem),
      |probe AS (
      |  SELECT min(sd) + 365 AS lo, min(sd) + 395 AS hi FROM li),
      |both_f AS MATERIALIZED (
      |  SELECT sd,
      |         ntile(32) OVER (ORDER BY sd, l_orderkey, l_linenumber) AS f_sorted,
      |         ((strpos('0123456789abcdef', substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 1)) - 1) * 16 +
      |          (strpos('0123456789abcdef', substring(md5(CAST(l_orderkey AS VARCHAR)), 2, 1)) - 1)) % 32 AS f_hashed
      |  FROM li),
      |assigned AS MATERIALIZED (
      |  SELECT sd, 'sorted' AS layout, CAST(f_sorted AS BIGINT) AS f FROM both_f
      |  UNION ALL
      |  SELECT sd, 'hashed' AS layout, CAST(f_hashed AS BIGINT) AS f FROM both_f),
      |zones AS (
      |  SELECT layout, f, min(sd) AS zmin, max(sd) AS zmax,
      |         CAST(count(*) AS BIGINT) AS nrows
      |  FROM assigned GROUP BY 1, 2),
      |matching AS (
      |  SELECT layout, CAST(count(*) AS BIGINT) AS rows_matching
      |  FROM assigned CROSS JOIN probe
      |  WHERE sd >= lo AND sd < hi GROUP BY 1)
      |SELECT z.layout, CAST(count(*) AS BIGINT) AS files_total,
      |       CAST(sum(CASE WHEN zmax >= lo AND zmin < hi THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
      |       CAST(sum(CASE WHEN zmax >= lo AND zmin < hi THEN nrows ELSE 0 END) AS BIGINT) AS rows_scanned,
      |       max(rows_matching) AS rows_matching,
      |       floor(CAST(sum(CASE WHEN zmax >= lo AND zmin < hi THEN nrows ELSE 0 END) - max(rows_matching) AS DOUBLE)
      |             * 1e6 / sum(CASE WHEN zmax >= lo AND zmin < hi THEN nrows ELSE 0 END)) / 1e6 AS overscan_ratio
      |FROM zones z CROSS JOIN probe JOIN matching USING (layout)
      |GROUP BY z.layout
      |ORDER BY z.layout""".stripMargin

  val queries: Map[String, Q] = Map(
    "agg-cointegration" -> aggCointegration,
    "emb-isotropy" -> embIsotropy,
    "sample-kfold-assign" -> sampleKfoldAssign,
    "layout-overscan-rows" -> layoutZonemapSkipping)

  val oracles: Map[String, String] = Map(
    "agg-cointegration" -> aggCointegrationSql,
    "emb-isotropy" -> embIsotropySql,
    "sample-kfold-assign" -> sampleKfoldAssignSql,
    "layout-overscan-rows" -> layoutZonemapSkippingSql)
}
