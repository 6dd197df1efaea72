package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Tables._

/** Round-6 batch D: the LSH banding S-curve, manifest time travel, and
  * the EXECUTE IMMEDIATE scripting surface. */
object RelMore43 {

  private val Seeds = 12
  /** (bands, rowsPerBand) sweep — every divisor split of the 12-slot
    * signature. Label is zero-padded so string order == numeric order. */
  private val BandConfigs = Seq((12, 1), (6, 2), (4, 3), (3, 4), (2, 6), (1, 12))

  /** dedup-banding-curve — the LSH TUNING table: for every (b bands ×
    * r rows) split of the same 12-hash MinHash signature, the candidate
    * volume and the precision of those candidates (fraction whose
    * signature-estimated Jaccard ≥ 0.5). This is the S-curve every LSH
    * deployment sizes against — collision probability 1−(1−Jʳ)ᵇ —
    * measured on YOUR corpus instead of trusted from the formula:
    * 1×12 admits only near-certain dups (high precision, low recall),
    * 12×1 floods candidates at ~2% precision (the fixture shows 16 vs
    * 1356 candidates). At 100 TB the flood is the difference between a
    * bounded verify join and corpus-scale wasted work, and this table
    * is how you pick (b,r) BEFORE paying it. One shingle scan → one
    * cached signature → ONE stack() pass emits all 28 band rows across
    * configs; candidate generation stays band-bucket-joined per config
    * (never corpus²), exactly like dedup-minhash-lsh
    * (TextDedup.scala:64). */
  val dedupBandingCurve: Q = (s, d) => {
    // sig via the shared TextDedup builder (r11): hex_slice_long LONG
    // slots keep the aggregate in HashAggregate (min(STRING) forced a
    // SortAggregate full sort of the occurrence table) and the three
    // MinHash front doors can no longer drift apart.
    val sig = TextDedup.minhashSigStored(s, d).sharedCache()
    val stackArgs = (for ((b, r) <- BandConfigs; j <- 0 until b) yield {
      val slots = (1 to r).map(i => s"m${j * r + i}").mkString(", ")
      f"'$b%02dx$r%02d', $j, md5(concat_ws(',', $slots))"
    }).mkString(", ")
    val nGen = BandConfigs.map(_._1).sum
    val bands = sig.selectExpr("doc_id", s"stack($nGen, $stackArgs) AS (cfg, band, bk)")
    val pairs = bands.select(col("cfg"), col("doc_id").as("doc_a"), col("band"), col("bk"))
      .join(bands.select(col("cfg"), col("doc_id").as("doc_b"), col("band"), col("bk")),
        Seq("cfg", "band", "bk"))
      .filter(col("doc_a") < col("doc_b"))
      .select("cfg", "doc_a", "doc_b").distinct()
    val matchExpr = (1 to Seeds).map(j => s"IF(a.m$j = b.m$j, 1, 0)").mkString(" + ")
    pairs
      .join(sig.as("a"), col("doc_a") === col("a.doc_id"))
      .join(sig.as("b"), col("doc_b") === col("b.doc_id"))
      .select(col("cfg"), expr(matchExpr).cast(LongType).as("matches"))
      .groupBy("cfg")
      .agg(count(lit(1)).as("n_candidates"),
        sum(when(col("matches") >= Seeds / 2, 1L).otherwise(0L)).as("n_confident"))
      .select(col("cfg"), col("n_candidates"), col("n_confident"),
        expr("CASE WHEN n_candidates = 0 THEN 0" +
          " ELSE (n_confident * 1000000) div n_candidates END").as("precision_ppm"))
      .orderBy("cfg")
  }

  val dedupBandingCurveSql: String = {
    val mins = (1 to Seeds)
      .map(j => s"min(substring(h, ${(j - 1) * 5 + 1}, 5)) AS m$j").mkString(",\n         ")
    val sep = " || ',' || "
    val bandSelects = (for ((b, r) <- BandConfigs; j <- 0 until b) yield {
      val key = (1 to r).map(i => s"m${j * r + i}").mkString(sep)
      f"SELECT doc_id, '$b%02dx$r%02d' AS cfg, $j AS band, md5($key) AS bk FROM sig"
    }).mkString("\n  UNION ALL ")
    val matches = (1 to Seeds)
      .map(j => s"CASE WHEN a.m$j = b.m$j THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH words AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |  WHERE len(string_split(text, ' ')) >= 3),
       |shingles AS (
       |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
       |  FROM words, LATERAL (SELECT unnest(generate_series(1, len(w) - 2)) AS i) t),
       |hashed AS (SELECT doc_id, md5(sh) || md5('#' || sh) AS h FROM shingles),
       |sig AS (SELECT doc_id, $mins FROM hashed GROUP BY doc_id),
       |bands AS (
       |  $bandSelects),
       |pairs AS (
       |  SELECT DISTINCT x.cfg, x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.cfg = y.cfg AND x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id),
       |est AS (
       |  SELECT p.cfg, ($matches) AS matches
       |  FROM pairs p JOIN sig a ON a.doc_id = p.doc_a JOIN sig b ON b.doc_id = p.doc_b)
       |SELECT cfg, CAST(count(*) AS BIGINT) AS n_candidates,
       |       CAST(sum(CASE WHEN matches >= ${Seeds / 2} THEN 1 ELSE 0 END) AS BIGINT) AS n_confident,
       |       CASE WHEN count(*) = 0 THEN 0
       |            ELSE (CAST(sum(CASE WHEN matches >= ${Seeds / 2} THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
       |                 // CAST(count(*) AS BIGINT) END AS precision_ppm
       |FROM est GROUP BY cfg ORDER BY cfg""".stripMargin
  }

  /** sink-time-travel — versioned reads over the manifest commit
    * protocol: every commit writes an immutable manifest listing
    * exactly its data files (v2 = v1's files + the new delta dirs —
    * appends never rewrite old files) plus a HEAD pointer; "AS OF v"
    * is just resolving manifest-v and scanning its file list. This is
    * the poor-man's Iceberg/Delta snapshot isolation on plain object
    * storage, extending sink-manifest-atomic (RelMore14.scala:221)
    * from publish-once to history: old manifests keep old versions
    * readable forever (until expiry compaction), concurrent readers
    * pin a manifest and never see a torn append. Output grades both
    * versions' row counts and integer key checksums plus which one
    * HEAD currently points at. Manifest I/O is driver-side metadata
    * (bytes, not data); all data movement is executor-side parquet. */
  val sinkTimeTravel: Q = (s, d) => {
    import java.nio.file.{Files, Paths}
    val base = tmp("sink-time-travel", d)
    Files.createDirectories(Paths.get(base))
    val dir1 = s"$base/delta-001"
    val dir2 = s"$base/delta-002"
    val o = orders(s, d).select(col("o_orderkey"), col("o_orderstatus"))
    o.filter(col("o_orderkey") % 3 === 0).write.mode(SaveMode.Overwrite).parquet(dir1)
    // commit v1, then append a second delta and commit v2
    Files.writeString(Paths.get(base, "manifest-v1.txt"), dir1)
    o.filter(col("o_orderkey") % 3 === 1).write.mode(SaveMode.Overwrite).parquet(dir2)
    Files.writeString(Paths.get(base, "manifest-v2.txt"), s"$dir1\n$dir2")
    Files.writeString(Paths.get(base, "HEAD"), "v2")
    val head = Files.readString(Paths.get(base, "HEAD")).trim
    def asOf(v: String): DataFrame =
      Files.readString(Paths.get(base, s"manifest-$v.txt")).trim.split("\n")
        .map(s.read.parquet(_)).reduce(_ unionByName _)
    Seq("v1", "v2").map { v =>
      asOf(v).agg(count(lit(1)).as("n_rows"), sum("o_orderkey").as("key_checksum"))
        .select(lit(v).as("version"), col("n_rows"), col("key_checksum"),
          lit(if (v == head) 1 else 0).cast(IntegerType).as("is_head"))
    }.reduce(_ unionAll _).orderBy("version")
  }

  val sinkTimeTravelSql: String =
    """SELECT 'v1' AS version, CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(sum(o_orderkey) AS BIGINT) AS key_checksum, CAST(0 AS INT) AS is_head
      |FROM orders WHERE o_orderkey % 3 = 0
      |UNION ALL
      |SELECT 'v2', CAST(count(*) AS BIGINT),
      |       CAST(sum(o_orderkey) AS BIGINT), CAST(1 AS INT)
      |FROM orders WHERE o_orderkey % 3 IN (0, 1)
      |ORDER BY version""".stripMargin

  /** sql-execute-immediate — the SQL-scripting surface: session
    * variables (DECLARE / SET VAR) holding both a parameter value and
    * the query TEXT itself, executed via EXECUTE IMMEDIATE ... USING.
    * This is how orchestration layers run dynamically-assembled SQL
    * (the reference's stored-procedure surface) without string-concat
    * injection — parameters bind as typed placeholders, the statement
    * text is data. Sibling of sql-parameterized (RelMore33.scala:24),
    * which binds through the session API instead. */
  val sqlExecuteImmediate: Q = (s, d) => {
    orders(s, d).createOrReplaceTempView("orders_ei")
    s.sql("DECLARE OR REPLACE VARIABLE ei_status STRING DEFAULT 'F'")
    s.sql("SET VAR ei_status = 'O'")
    s.sql("DECLARE OR REPLACE VARIABLE ei_sql STRING")
    s.sql("SET VAR ei_sql = 'SELECT o_orderpriority, count(*) AS n, " +
      "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue " +
      "FROM orders_ei WHERE o_orderstatus = ? " +
      "GROUP BY o_orderpriority ORDER BY o_orderpriority'")
    s.sql("EXECUTE IMMEDIATE ei_sql USING ei_status")
  }

  val sqlExecuteImmediateSql: String =
    """SELECT o_orderpriority, count(*) AS n,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders WHERE o_orderstatus = 'O'
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  val queries: Map[String, Q] = Map(
    "dedup-banding-curve" -> dedupBandingCurve,
    "sink-time-travel" -> sinkTimeTravel,
    "sql-execute-immediate" -> sqlExecuteImmediate)

  val oracles: Map[String, String] = Map(
    "dedup-banding-curve" -> dedupBandingCurveSql,
    "sink-time-travel" -> sinkTimeTravelSql,
    "sql-execute-immediate" -> sqlExecuteImmediateSql)
}
