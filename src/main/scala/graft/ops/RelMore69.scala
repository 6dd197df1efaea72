package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Tables._

/** Round-9 batch G: entity-resolution blocking, multiline JSON,
  * MMR reranking, offset-gap loss detection. */
object RelMore69 {

  /** join-fuzzy-block — entity-resolution by BLOCKED fuzzy matching:
    * candidate pairs are generated only WITHIN a blocking key (here:
    * the name minus its last two characters), then scored with exact
    * Levenshtein — the two-stage shape every name-matching pipeline
    * uses, because unblocked fuzzy join is O(n²) across the corpus
    * while blocked cost is Σ blockᵢ² with the block size a design
    * constant (≤100 here). Graded as the edit-distance histogram over
    * blocked pairs; the block key is part of the contract (a pair in
    * different blocks is NOT a candidate — the recall/cost trade
    * stated, not hidden). */
  val joinFuzzyBlock: Q = (s, d) => {
    val names = supplier(s, d)
      .select(col("s_suppkey").as("k"), col("s_name").as("nm"),
        expr("substring(s_name, 1, length(s_name) - 2)").as("blk"))
    names.as("a").join(names.as("b"),
        col("a.blk") === col("b.blk") && col("a.k") < col("b.k"))
      .select(levenshtein(col("a.nm"), col("b.nm")).cast(IntegerType).as("edit_dist"))
      .groupBy("edit_dist")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("edit_dist")
  }

  val joinFuzzyBlockSql: String =
    """WITH names AS (
      |  SELECT s_suppkey AS k, s_name AS nm,
      |         substring(s_name, 1, length(s_name) - 2) AS blk
      |  FROM supplier)
      |SELECT CAST(levenshtein(a.nm, b.nm) AS INT) AS edit_dist,
      |       count(*) AS n_pairs
      |FROM names a JOIN names b ON a.blk = b.blk AND a.k < b.k
      |GROUP BY 1
      |ORDER BY edit_dist""".stripMargin

  /** src-json-multiline — pretty-printed / array-wrapped JSON
    * ingestion: unlike JSONL (src-json-lines), a multiline JSON
    * document CANNOT be split at newlines, so multiLine=true makes
    * each FILE one parse unit — the same non-splittability rule as
    * gzip (src-csv-gzip), and the same remedy: parallelism = file
    * count, decided at staging time (8 array files here). Round-trip
    * proven by the per-nation aggregate. */
  val srcJsonMultiline: Q = (s, d) => {
    val dir = tmp("src-json-multiline", d)
    // stage: 8 files, each a pretty-printed JSON ARRAY of customer rows
    val staged = customer(s, d)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      .withColumn("shard", col("c_custkey") % 8)
      .groupBy("shard")
      .agg(concat(lit("[\n  "),
        concat_ws(",\n  ", array_sort(collect_list(
          to_json(struct(col("c_custkey"), col("c_nationkey"), col("c_acctbal")))))),
        lit("\n]")).as("value"))
    staged.select("value").repartition(8)
      .write.mode("overwrite").text(dir)
    val back = s.read.option("multiLine", "true")
      .schema("c_custkey LONG, c_nationkey LONG, c_acctbal DOUBLE")
      .json(dir)
    back.groupBy("c_nationkey")
      .agg(count(lit(1)).as("n"),
        outNum(sum(dec2(col("c_acctbal")))).as("balance"))
      .orderBy("c_nationkey")
  }

  val srcJsonMultilineSql: String =
    """SELECT c_nationkey, count(*) AS n,
      |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS balance
      |FROM customer
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  private val MmrK = 5
  private val MmrPool = 20

  /** emb-mmr-rerank — Maximal Marginal Relevance reranking: from the
    * brute-force top-20 for a fixed query (vec_id 1), iteratively pick
    * 5 results maximizing relevance MINUS similarity to what is
    * already picked (λ=½, so score ∝ rel − max-sim) — the standard
    * diversity rerank between retrieval and the context window.
    * Candidate generation is the scalable stage (top-k); the rerank
    * touches only the 20-row pool (pairwise 400 sims), so the
    * iterative argmax is constant work at ANY corpus size — each step
    * materialized via a bounded cached frame, no driver collect.
    * Vectors are element-quantized to integer micro before any dot
    * product, so every similarity is an exact integer-valued double in
    * both engines. */
  val embMmrRerank: Q = (s, d) => {
    graft.functions.DotProduct.register(s)
    val vecs = embeddings(s, d).select(col("vec_id"),
      expr("quantize_lattice(embedding, 1000000.0D)").as("v"))
    val q = vecs.filter(col("vec_id") === 1)
      .select(col("v").as("qv"))
    val cands = vecs.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= 1)
      .select(col("vec_id"), col("v"),
        expr("dot_product(v, qv)").as("rel"))
      .orderBy(col("rel").desc, col("vec_id").asc)
      .limit(MmrPool).sharedCache()
    val sims = cands.select(col("vec_id").as("ia"), col("v").as("va"))
      .join(cands.select(col("vec_id").as("ib"), col("v").as("vb")),
        col("ia") =!= col("ib"))
      .select(col("ia"), col("ib"), expr("dot_product(va, vb)").as("sim"))
      .sharedCache()
    var selected = cands.orderBy(col("rel").desc, col("vec_id").asc).limit(1)
      .select(col("vec_id"), col("rel"), lit(1).as("rank")).sharedCache()
    for (i <- 2 to MmrK) {
      val next = cands.join(selected.select(col("vec_id")), Seq("vec_id"), "left_anti")
        .join(sims.join(selected.select(col("vec_id").as("ib")), Seq("ib"))
            .groupBy("ia").agg(max("sim").as("max_sim")),
          col("vec_id") === col("ia"))
        .select(col("vec_id"), col("rel"), (col("rel") - col("max_sim")).as("score"))
        .orderBy(col("score").desc, col("vec_id").asc).limit(1)
        .select(col("vec_id"), col("rel"), lit(i).as("rank"))
      selected = selected.unionAll(next).sharedCache()
    }
    selected.select(col("rank"), col("vec_id"),
      col("rel").cast(LongType).as("rel_micro2"))
      .orderBy("rank")
  }

  val embMmrRerankSql: String = {
    def selUnion(n: Int) = (1 to n).map(i => s"SELECT vec_id FROM s$i").mkString(" UNION ALL ")
    val steps = (2 to MmrK).map { i =>
      s"""r$i AS (
         |  SELECT c.vec_id, c.rel, c.rel - mx.max_sim AS score
         |  FROM cands c
         |  JOIN (SELECT ia, max(sim) AS max_sim FROM sims
         |        WHERE ib IN (${selUnion(i - 1)}) GROUP BY ia) mx
         |    ON mx.ia = c.vec_id
         |  WHERE c.vec_id NOT IN (${selUnion(i - 1)})),
         |s$i AS (SELECT vec_id, rel, $i AS rank FROM r$i
         |        ORDER BY score DESC, vec_id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH vecs AS (
       |  SELECT vec_id,
       |         list_transform(embedding,
       |           x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS DOUBLE)) AS v
       |  FROM embeddings),
       |q AS (SELECT v AS qv FROM vecs WHERE vec_id = 1),
       |cands AS (
       |  SELECT vec_id, v, list_inner_product(v, qv) AS rel
       |  FROM vecs, q WHERE vec_id <> 1
       |  ORDER BY rel DESC, vec_id LIMIT $MmrPool),
       |sims AS (
       |  SELECT a.vec_id AS ia, b.vec_id AS ib, list_inner_product(a.v, b.v) AS sim
       |  FROM cands a JOIN cands b ON a.vec_id <> b.vec_id),
       |s1 AS (SELECT vec_id, rel, 1 AS rank FROM cands
       |       ORDER BY rel DESC, vec_id LIMIT 1),
       |$steps
       |SELECT rank, vec_id, CAST(rel AS BIGINT) AS rel_micro2
       |FROM (${(1 to MmrK).map(i => s"SELECT * FROM s$i").mkString(" UNION ALL ")})
       |ORDER BY rank""".stripMargin
  }

  /** dq-offset-gaps — data-loss detection on partitioned offset
    * streams (the Kafka-offset audit): events map to (partition =
    * id % 4, offset = id div 4) — dense by construction — then a
    * deterministic 1/256 of records is dropped to SIMULATE loss, and
    * the detector must find exactly the dropped offsets from the
    * survivors: per partition, Σ(lead(offset) − offset − 1) plus
    * edge gaps against the known min/max. Graded per partition:
    * survivors, detected missing, and the zero-miss invariant
    * (detected == dropped — the op validates its own detector). One
    * per-partition sort; gap arithmetic is pure projection. */
  val dqOffsetGaps: Q = (s, d) => {
    val mapped = events(s, d).select(
      (col("event_id") % 4).as("part"),
      expr("event_id div 4").as("off"))
    val bounds = mapped.groupBy("part")
      .agg(min("off").as("lo"), max("off").as("hi"), count(lit(1)).as("n_all"))
    val survivors = mapped.filter(
      substring(md5(concat(lit("drop#"), col("part").cast(StringType),
        lit("/"), col("off").cast(StringType))), 1, 2) =!= "ab")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("part").orderBy("off")
    val inner = survivors
      .withColumn("nxt", lead("off", 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy("part").agg(sum(col("nxt") - col("off") - 1).as("inner_gaps"))
    val edges = survivors.groupBy("part")
      .agg(min("off").as("slo"), max("off").as("shi"), count(lit(1)).as("n_live"))
    edges.join(inner, Seq("part")).join(bounds, Seq("part"))
      .select(col("part"), col("n_all"), col("n_live"),
        (col("inner_gaps") + (col("slo") - col("lo")) + (col("hi") - col("shi")))
          .as("detected_missing"),
        (col("n_all") - col("n_live")).as("actual_dropped"))
      .withColumn("detector_exact", col("detected_missing") === col("actual_dropped"))
      .orderBy("part")
  }

  val dqOffsetGapsSql: String =
    """WITH mapped AS (
      |  SELECT event_id % 4 AS part, event_id // 4 AS off FROM events),
      |bounds AS (
      |  SELECT part, min(off) AS lo, max(off) AS hi, count(*) AS n_all
      |  FROM mapped GROUP BY part),
      |surv AS (
      |  SELECT * FROM mapped
      |  WHERE substring(md5('drop#' || CAST(part AS VARCHAR) || '/' || CAST(off AS VARCHAR)), 1, 2) <> 'ab'),
      |inner_g AS (
      |  SELECT part, CAST(sum(nxt - off - 1) AS BIGINT) AS inner_gaps FROM (
      |    SELECT part, off, lead(off) OVER (PARTITION BY part ORDER BY off) AS nxt
      |    FROM surv) t
      |  WHERE nxt IS NOT NULL
      |  GROUP BY part),
      |edges AS (
      |  SELECT part, min(off) AS slo, max(off) AS shi, count(*) AS n_live
      |  FROM surv GROUP BY part)
      |SELECT e.part, b.n_all, e.n_live,
      |       CAST(i.inner_gaps + (e.slo - b.lo) + (b.hi - e.shi) AS BIGINT) AS detected_missing,
      |       CAST(b.n_all - e.n_live AS BIGINT) AS actual_dropped,
      |       i.inner_gaps + (e.slo - b.lo) + (b.hi - e.shi) = b.n_all - e.n_live AS detector_exact
      |FROM edges e JOIN inner_g i ON e.part = i.part JOIN bounds b ON e.part = b.part
      |ORDER BY e.part""".stripMargin

  val queries: Map[String, Q] = Map(
    "join-fuzzy-block" -> joinFuzzyBlock,
    "src-json-multiline" -> srcJsonMultiline,
    "emb-mmr-rerank" -> embMmrRerank,
    "dq-offset-gaps" -> dqOffsetGaps)

  val oracles: Map[String, String] = Map(
    "join-fuzzy-block" -> joinFuzzyBlockSql,
    "src-json-multiline" -> srcJsonMultilineSql,
    "emb-mmr-rerank" -> embMmrRerankSql,
    "dq-offset-gaps" -> dqOffsetGapsSql)
}
