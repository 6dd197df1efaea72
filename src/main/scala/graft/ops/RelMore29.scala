package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import Tables._

/** Round-5 batch C: bounded-frame exponential smoothing, community
  * detection by label propagation, the SQL join-hint surface, largest-
  * remainder stratified allocation, a real iterative BPE merge trainer,
  * and the nearest-event generalization of the as-of join.
  */
object RelMore29 {

  /** win-ewma — exponentially weighted moving average of order value
    * per customer, half-life = 1 order, over a BOUNDED 8-row trailing
    * frame: weights are exact powers of two (2^7 for the current row
    * down to 2^0 at lag 7), numerator and denominator are integer sums
    * over whatever lags exist, and the single floor division happens at
    * output. The bounded frame is the scale contract: window state is
    * O(8) per customer regardless of history length, where the textbook
    * recursive EWMA (s_t = αx + (1−α)s_{t−1}) is a sequential scan that
    * cannot parallelize within a key. Weights as integer shifts — never
    * pow(0.5, k) floats — keep both engines bit-aligned (same discipline
    * as agg-decay-score). One shuffle on the customer key. */
  val winEwma: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey").orderBy("od", "o_orderkey")
    val base = orders(s, d).filter(col("o_custkey") % 97 === 0)
      .select(col("o_custkey"), col("o_orderkey"), to_date(col("o_orderdate")).as("od"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
    val lags = (0 to 7).map { k =>
      val lc = if (k == 0) col("cents") else lag(col("cents"), k).over(w)
      (lc, 1L << (7 - k))
    }
    val num = lags.map { case (lc, wt) => coalesce(lc * lit(wt), lit(0L)) }.reduce(_ + _)
    val den = lags.map { case (lc, wt) => when(lc.isNotNull, lit(wt)).otherwise(lit(0L)) }.reduce(_ + _)
    base
      .withColumn("ewma_q", floor(num.cast(DoubleType) / den).cast(LongType))
      .select(col("o_custkey"), col("o_orderkey"), col("od").as("o_date"),
        col("cents"), col("ewma_q"))
      .orderBy("o_custkey", "o_date", "o_orderkey")
  }

  val winEwmaSql: String = {
    val numTerms = (0 to 7).map { k =>
      val lc = if (k == 0) "cents" else s"lag(cents, $k) OVER w"
      s"COALESCE($lc * ${1L << (7 - k)}, 0)"
    }.mkString(" + ")
    val denTerms = (0 to 7).map { k =>
      val lc = if (k == 0) "cents" else s"lag(cents, $k) OVER w"
      s"CASE WHEN $lc IS NOT NULL THEN ${1L << (7 - k)} ELSE 0 END"
    }.mkString(" + ")
    s"""SELECT o_custkey, o_orderkey, o_date, cents,
       |       CAST(floor(CAST($numTerms AS DOUBLE) / ($denTerms)) AS BIGINT) AS ewma_q
       |FROM (SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
       |             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
       |      FROM orders WHERE o_custkey % 97 = 0)
       |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_date, o_orderkey)
       |ORDER BY o_custkey, o_date, o_orderkey""".stripMargin
  }

  /** graph-label-propagation — community detection by synchronous label
    * propagation over the part co-purchase graph (same sampled graph as
    * graph-cc-hashmin): labels start as node ids; each of 3 rounds every
    * node adopts the MODE of its neighbors' labels (ties → smallest
    * label — the determinism pin the textbook algorithm leaves to
    * chance). Each round is one join + one count aggregate + one
    * per-node argmax (shuffles keyed on node — never more than
    * |edges| rows in flight); nodes that lost all neighbors to the
    * sampling keep their label via the left join. Bounded rounds, same
    * contract as the other iterative graph ops: production iterates to
    * label-change convergence with periodic checkpoints. Unlike
    * hash-min CC (which welds every reachable node to one min), LPA
    * finds DENSE regions — the part-bundle structure merchandising
    * actually wants. */
  val graphLabelPropagation: Q = (s, d) => withShufflePartitions(s, 8) {
    // r14 opt: base lines + co-purchase pairs from the per-process
    // fixtures (GraphOps.li29Stored / pairs29Stored) instead of a
    // per-rep scan + basket self-join + two distincts
    val li = GraphOps.li29Stored(s, d)
    val pairs = GraphOps.pairs29Stored(s, d)
    val nodes = li.select(col("pk").as("node")).distinct()
    val edges = pairs.select(col("u").as("src"), col("v").as("dst"))
      .union(pairs.select(col("v").as("src"), col("u").as("dst")))
      .persist()
    // single-stage fill: in the lazy chain each round's plan contains
    // the previous round TWICE (modes subtree + the left join side), so
    // the final action reads edges from independent stages concurrently
    // (r13 bench-conditions WarnProbe attribution — block-put race)
    edges.count()
    // IterativeFixpoint.lazyChain: fixed shallow depth (3) and the step
    // reads its label state twice but both reads ride the SAME round's
    // shuffles once the single final action runs — per-round actions
    // would only add job submissions (see the helper's criteria).
    val labels = graft.functions.IterativeFixpoint.lazyChain(
      nodes.select(col("node"), col("node").as("lbl")), 3) { (lbls, _) =>
      val modes = edges
        .join(lbls.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"), col("lbl"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("node").orderBy(desc("cnt"), col("lbl"))))
        .filter(col("rk") === 1)
        .select(col("node"), col("lbl").as("new_lbl"))
      lbls.join(modes, Seq("node"), "left")
        .select(col("node"), coalesce(col("new_lbl"), col("lbl")).as("lbl"))
    }
    val out = labels.groupBy(col("lbl").as("community"))
      .agg(count(lit(1)).as("n_nodes"))
      .orderBy(desc("n_nodes"), col("community"))
      .limit(20)
      .sharedCache()
    // materialize inside the partition scope BEFORE releasing the edge
    // cache — the previous unpersist-then-return unmarked the cache while
    // the plan was still lazy, so every iteration re-ran the pair build
    out.count()
    edges.unpersist()
    out
  }

  val graphLabelPropagationSql: String = {
    val iters = (1 to 3).map { i =>
      s"""m$i AS (
         |  SELECT node, lbl AS new_lbl FROM (
         |    SELECT e.dst AS node, p.lbl, count(*) AS cnt,
         |           row_number() OVER (PARTITION BY e.dst
         |                              ORDER BY count(*) DESC, p.lbl) AS rk
         |    FROM edges e JOIN l${i - 1} p ON p.node = e.src
         |    GROUP BY e.dst, p.lbl) WHERE rk = 1),
         |l$i AS (
         |  SELECT l.node, COALESCE(m.new_lbl, l.lbl) AS lbl
         |  FROM l${i - 1} l LEFT JOIN m$i m ON m.node = l.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
       |            FROM lineitem WHERE l_orderkey % 29 = 0),
       |pairs AS (SELECT DISTINCT a.pk AS u, b.pk AS v
       |          FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
       |nodes AS (SELECT DISTINCT pk AS node FROM li),
       |edges AS (SELECT u AS src, v AS dst FROM pairs
       |          UNION SELECT v, u FROM pairs),
       |l0 AS (SELECT node, node AS lbl FROM nodes),
       |$iters
       |SELECT lbl AS community, count(*) AS n_nodes
       |FROM l3
       |GROUP BY lbl
       |ORDER BY n_nodes DESC, community
       |LIMIT 20""".stripMargin
  }

  /** sql-hints — the SQL-level physical-join-control surface: the
    * BROADCAST(n) hint forces the nation dim around the exchange and
    * the MERGE(o) hint forces the orders side through sort-merge —
    * both asserted in the physical plan by the spec. Hints are how a
    * user overrides Catalyst when statistics lie (a "small" table
    * that post-filter explodes, a "big" one that post-filter fits in
    * a broadcast) — the escape hatch that matters exactly at 100 TB
    * where a wrong join strategy is hours, not milliseconds. Hints
    * never change semantics, only strategy: the oracle is the plain
    * unhinted SQL. */
  val sqlHints: Q = (s, d) => {
    customer(s, d).createOrReplaceTempView("customer")
    nation(s, d).createOrReplaceTempView("nation")
    orders(s, d).createOrReplaceTempView("orders")
    s.sql(
      """SELECT /*+ BROADCAST(n), MERGE(o) */
        |       n.n_name,
        |       count(DISTINCT c.c_custkey) AS n_customers,
        |       count(o.o_orderkey) AS n_orders,
        |       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM customer c
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |GROUP BY n.n_name
        |ORDER BY n.n_name""".stripMargin)
  }

  val sqlHintsSql: String =
    """SELECT n.n_name,
      |       count(DISTINCT c.c_custkey) AS n_customers,
      |       count(o.o_orderkey) AS n_orders,
      |       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM customer c
      |JOIN nation n ON n.n_nationkey = c.c_nationkey
      |JOIN orders o ON o.o_custkey = c.c_custkey
      |GROUP BY n.n_name
      |ORDER BY n.n_name""".stripMargin

  private val SampleBudget = 60L

  /** sample-weighted-alloc — proportional stratified sampling with an
    * EXACT integer budget: a fixed budget of 60 documents is allocated
    * across sources proportionally to their token mass by Hamilton's
    * largest-remainder method (floor quotas, then the leftover seats go
    * to the largest remainders — the apportionment that sums exactly to
    * the budget, where independent per-stratum rounding over- or
    * under-shoots), and each stratum then contributes its quota of
    * documents by md5 hash rank — reproducible, no RNG. This is the
    * "build a 10M-doc eval slice matching the corpus mix" primitive.
    * The quota computation runs on the |strata|-sized aggregate (the
    * only global windows are over that tiny table); the per-stratum
    * pick is a key-partitioned rank — at 100 TB swap it for the
    * TopKPerKey plan with k = max quota and a post-filter. */
  val sampleWeightedAlloc: Q = (s, d) => {
    val docs = documents(s, d).select(col("source"), col("doc_id"), col("n_chars"))
    val strata = docs.groupBy("source").agg(sum(col("n_chars")).as("w"))
    val wTot = Window.partitionBy(lit(1))
    val wRem = Window.partitionBy(lit(1)).orderBy(desc("rem"), col("source"))
    val quotas = strata
      .withColumn("tw", sum(col("w")).over(wTot))
      .withColumn("base", floor(col("w") * lit(SampleBudget) / col("tw")).cast(LongType))
      .withColumn("rem", col("w") * lit(SampleBudget) % col("tw"))
      .withColumn("short", lit(SampleBudget) - sum(col("base")).over(wTot))
      .withColumn("rrk", row_number().over(wRem))
      .withColumn("quota", col("base") + when(col("rrk") <= col("short"), 1L).otherwise(0L))
      .select(col("source"), col("quota"))
    val wPick = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
    docs.select(col("source"), col("doc_id"),
        md5(col("doc_id").cast(StringType)).as("h"))
      .withColumn("rn", row_number().over(wPick))
      .join(broadcast(quotas), Seq("source"))
      .filter(col("rn") <= col("quota"))
      .select(col("source"), col("quota"), col("doc_id"), col("h"))
      .orderBy("source", "h", "doc_id")
  }

  val sampleWeightedAllocSql: String =
    s"""WITH strata AS (
       |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS w FROM documents GROUP BY 1),
       |q AS (
       |  SELECT source,
       |         CAST(floor(w * $SampleBudget / tw) AS BIGINT) AS base,
       |         w * $SampleBudget % tw AS rem,
       |         $SampleBudget - sum(CAST(floor(w * $SampleBudget / tw) AS BIGINT)) OVER () AS short,
       |         row_number() OVER (ORDER BY w * $SampleBudget % tw DESC, source) AS rrk
       |  FROM (SELECT source, w, sum(w) OVER () AS tw FROM strata)),
       |quotas AS (
       |  SELECT source, base + CASE WHEN rrk <= short THEN 1 ELSE 0 END AS quota FROM q),
       |ranked AS (
       |  SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
       |         row_number() OVER (PARTITION BY source
       |                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
       |  FROM documents)
       |SELECT r.source, quota, doc_id, h
       |FROM ranked r JOIN quotas USING (source)
       |WHERE rn <= quota
       |ORDER BY source, h, doc_id""".stripMargin

  /** text-bpe-merge — an actual iterative BPE trainer (3 merge rounds),
    * not just the pair statistic: the corpus collapses to a word-
    * frequency table first (the shuffle is |vocab|, never corpus — the
    * same reduction every production tokenizer trainer does), words
    * explode to space-joined character sequences, and each round (1)
    * counts adjacent token pairs weighted by word frequency, (2) picks
    * the most frequent pair (ties → lexicographic — the determinism pin),
    * (3) rewrites every word by literal left-to-right replacement of
    * that pair. The merge table IS the tokenizer artifact. Each round's
    * argmax is a 1-row broadcast back onto the |vocab|-bounded word
    * table; rounds are bounded like the graph ops (production: ~30k
    * merges with the same per-round shape). The word table is
    * localCheckpoint'ed after the corpus collapse and after every
    * rewrite — the RelMore39 graph-scc discipline — so round r plans
    * against a constant-size LogicalRDD leaf instead of replaying the
    * corpus explode plus all r-1 prior rewrites (lineage replay is
    * quadratic in merge count; at 30k merges it is fatal). On a real
    * cluster use checkpoint(reliable dir) for the same truncation plus
    * fault tolerance. Both engines replace non-overlapping
    * left-to-right, which is exactly greedy BPE application. */
  /** Word-length cap shared by the Spark filter regex AND the oracle's
    * pair-position range (`unnest(range(1, BpeMaxWordLen))`): the range
    * bound is only sufficient BECAUSE the regex caps words at this many
    * chars, so the two must move together (also used by RelMore30's
    * text-tokenizer-apply, the inference half of the same trainer). */
  private[ops] val BpeMaxWordLen = 12
  val textBpeMerge: Q = (s, d) => {
    var words = documents(s, d)
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word").rlike(s"^[a-z]{2,$BpeMaxWordLen}$$"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(
        concat(lit(" "),
          array_join(expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"), " "),
          lit(" ")).as("toks"),
        col("freq"))
      .groupBy("toks").agg(sum("freq").as("freq"))
      .localCheckpoint()
    var merges = Seq.empty[DataFrame]
    for (r <- 1 to 3) {
      val pairs = words
        .select(col("freq"), expr(
          "transform(sequence(1, size(split(trim(toks), ' ')) - 1), " +
            "i -> struct(element_at(split(trim(toks), ' '), i) AS l, " +
            "element_at(split(trim(toks), ' '), i + 1) AS r))").as("ps"))
        .select(col("freq"), explode(col("ps")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("pair_freq"))
      // best is 1 row: checkpointing it pins the round's argmax so the
      // final union of merge rows re-plans 3 leaf scans, not 3 pair aggs.
      val best = pairs
        .orderBy(desc("pair_freq"), col("l"), col("r")).limit(1)
        .select(lit(r).as("round"), col("l"), col("r"),
          concat(col("l"), col("r")).as("merged"), col("pair_freq"))
        .localCheckpoint()
      merges = merges :+ best
      words = words.crossJoin(broadcast(best.select(col("l"), col("r"))))
        .select(
          expr("replace(toks, ' ' || l || ' ' || r || ' ', ' ' || l || r || ' ')").as("toks"),
          col("freq"))
        .groupBy("toks").agg(sum("freq").as("freq"))
        .localCheckpoint()
    }
    merges.reduce(_ union _).orderBy("round")
  }

  val textBpeMergeSql: String = {
    def pairsOf(src: String, out: String): String =
      s"""$out AS (
         |  SELECT tk[i] AS l, tk[i + 1] AS r, CAST(sum(freq) AS BIGINT) AS pair_freq
         |  FROM (SELECT string_split(trim(toks), ' ') AS tk, freq FROM $src),
         |       (SELECT unnest(range(1, $BpeMaxWordLen)) AS i)
         |  WHERE i + 1 <= len(tk)
         |  GROUP BY 1, 2)""".stripMargin
    val rounds = (1 to 3).map { r =>
      s"""${pairsOf(s"w${r - 1}", s"p$r")},
         |b$r AS (
         |  SELECT $r AS round, l, r, l || r AS merged, pair_freq
         |  FROM p$r ORDER BY pair_freq DESC, l, r LIMIT 1),
         |w$r AS (
         |  SELECT replace(toks, ' ' || b.l || ' ' || b.r || ' ', ' ' || b.l || b.r || ' ') AS toks,
         |         CAST(sum(freq) AS BIGINT) AS freq
         |  FROM w${r - 1}, b$r b
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH wf AS (
       |  SELECT word, count(*) AS freq FROM (
       |    SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
       |  WHERE regexp_full_match(word, '[a-z]{2,$BpeMaxWordLen}')
       |  GROUP BY 1),
       |w0 AS (
       |  SELECT ' ' || array_to_string(
       |           list_transform(range(1, len(word) + 1), i -> word[i:i]), ' ') || ' ' AS toks,
       |         CAST(sum(freq) AS BIGINT) AS freq
       |  FROM wf GROUP BY 1),
       |$rounds
       |SELECT round, l, r, merged, pair_freq FROM b1
       |UNION ALL SELECT round, l, r, merged, pair_freq FROM b2
       |UNION ALL SELECT round, l, r, merged, pair_freq FROM b3
       |ORDER BY round""".stripMargin
  }

  /** join-asof-nearest — the nearest-event generalization of join-asof:
    * for every purchase, the click by the same user closest in time in
    * EITHER direction (ties → the earlier click), with the gap in exact
    * microseconds. Same single-shuffle discipline as join-asof: union
    * the streams, ONE user-keyed sort, the backward candidate from a
    * trailing last(IGNORE NULLS) and the forward candidate from a
    * leading first(IGNORE NULLS) — never a per-row range probe, never
    * a ±window self-join (which duplicates fact rows by every candidate
    * before re-aggregating them away). The point-in-time primitive of
    * feature stores where the nearest observation, not the latest, is
    * the right value (sensor alignment, quote-to-trade matching). */
  val joinAsofNearest: Q = (s, d) => {
    val ev = events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("is_p"),
        when(col("event_type") === "click", col("event_id")).as("click_id"),
        when(col("event_type") === "click", unix_micros(col("ts"))).as("click_us"))
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_p"), col("event_id"))
    val wBw = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFw = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    ev
      .withColumn("bw_id", last(col("click_id"), ignoreNulls = true).over(wBw))
      .withColumn("bw_us", last(col("click_us"), ignoreNulls = true).over(wBw))
      .withColumn("fw_id", first(col("click_id"), ignoreNulls = true).over(wFw))
      .withColumn("fw_us", first(col("click_us"), ignoreNulls = true).over(wFw))
      .filter(col("is_p") === 1)
      .withColumn("p_us", unix_micros(col("ts")))
      .withColumn("bw_gap", col("p_us") - col("bw_us"))
      .withColumn("fw_gap", col("fw_us") - col("p_us"))
      .withColumn("use_bw",
        col("bw_id").isNotNull && (col("fw_id").isNull || col("bw_gap") <= col("fw_gap")))
      .select(col("event_id").as("purchase_id"), col("user_id"),
        when(col("use_bw"), col("bw_id")).otherwise(col("fw_id")).as("nearest_click_id"),
        when(col("use_bw"), col("bw_gap")).otherwise(col("fw_gap")).as("gap_us"),
        when(col("use_bw"), lit("backward"))
          .otherwise(when(col("fw_id").isNotNull, lit("forward"))).as("direction"))
      .orderBy("purchase_id")
  }

  val joinAsofNearestSql: String =
    """SELECT purchase_id, user_id,
      |       CASE WHEN use_bw THEN bw_id ELSE fw_id END AS nearest_click_id,
      |       CASE WHEN use_bw THEN bw_gap ELSE fw_gap END AS gap_us,
      |       CASE WHEN use_bw THEN 'backward'
      |            WHEN fw_id IS NOT NULL THEN 'forward' END AS direction
      |FROM (
      |  SELECT event_id AS purchase_id, user_id, bw_id, fw_id,
      |         p_us - bw_us AS bw_gap, fw_us - p_us AS fw_gap,
      |         (bw_id IS NOT NULL AND (fw_id IS NULL OR p_us - bw_us <= fw_us - p_us)) AS use_bw
      |  FROM (
      |    SELECT user_id, event_id, is_p,
      |           epoch_us(date_trunc('microseconds', ts)) AS p_us,
      |           last_value(click_id IGNORE NULLS) OVER wbw AS bw_id,
      |           last_value(click_us IGNORE NULLS) OVER wbw AS bw_us,
      |           first_value(click_id IGNORE NULLS) OVER wfw AS fw_id,
      |           first_value(click_us IGNORE NULLS) OVER wfw AS fw_us
      |    FROM (
      |      SELECT user_id, ts, event_id,
      |             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p,
      |             CASE WHEN event_type = 'click' THEN event_id END AS click_id,
      |             CASE WHEN event_type = 'click'
      |                  THEN epoch_us(date_trunc('microseconds', ts)) END AS click_us
      |      FROM events WHERE event_type IN ('click', 'purchase'))
      |    WINDOW wbw AS (PARTITION BY user_id
      |                   ORDER BY date_trunc('microseconds', ts), is_p, event_id
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |           wfw AS (PARTITION BY user_id
      |                   ORDER BY date_trunc('microseconds', ts), is_p, event_id
      |                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |  WHERE is_p = 1)
      |ORDER BY purchase_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "win-ewma" -> winEwma,
    "graph-label-propagation" -> graphLabelPropagation,
    "sql-hints" -> sqlHints,
    "sample-weighted-alloc" -> sampleWeightedAlloc,
    "text-bpe-merge" -> textBpeMerge,
    "join-asof-nearest" -> joinAsofNearest)

  val oracles: Map[String, String] = Map(
    "win-ewma" -> winEwmaSql,
    "graph-label-propagation" -> graphLabelPropagationSql,
    "sql-hints" -> sqlHintsSql,
    "sample-weighted-alloc" -> sampleWeightedAllocSql,
    "text-bpe-merge" -> textBpeMergeSql,
    "join-asof-nearest" -> joinAsofNearestSql)
}
