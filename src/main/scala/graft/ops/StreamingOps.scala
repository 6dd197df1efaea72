package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import Tables._

/** Structured Streaming surface (additive — the reference is pure batch,
  * SURVEY §2.10). The events table is replayed through a real streaming
  * source with Trigger.AvailableNow (process-everything-then-stop), a
  * memory sink, and — for the windowed op — event-time tumbling windows
  * with a watermark. The same topology pointed at a live directory/Kafka
  * is the production deployment; AvailableNow makes it deterministic and
  * batch-equivalent, which is what the oracle checks.
  */
object StreamingOps {

  /** Copy-to-temp + atomic rename: a plain REPLACE_EXISTING copy is a
    * truncate-then-write, so a concurrent reader of the same staged
    * file could see a half-written parquet. A POSIX rename is atomic
    * and an already open handle keeps the old inode, so readers see
    * either the old or the new file, never a torn one. (Staging dirs
    * are additionally pid-namespaced via Tables.tmp, so the writer is
    * the only process in the directory — the rename guards against
    * intra-process concurrency and keeps the invariant local.) */
  private def stageAtomically(src: String, dest: java.io.File): Unit = {
    // dot-prefixed so the FileStreamSource's listing ignores the
    // in-flight temp file (hidden-file convention); pid+thread suffix
    // is unique across processes AND threads
    val tmpFile = new java.io.File(dest.getParentFile,
      "." + dest.getName + ".tmp-" + ProcessHandle.current().pid() +
        "-" + Thread.currentThread().getId)
    java.nio.file.Files.copy(java.nio.file.Paths.get(src), tmpFile.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    java.nio.file.Files.move(tmpFile.toPath, dest.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Scope a state-partition count to one streaming execution. The number
    * of state stores a stateful query creates is frozen at checkpoint
    * creation from spark.sql.shuffle.partitions, and EVERY micro-batch
    * pays one state-store commit (snapshot/delta file + fsync) per
    * partition per stateful operator — for a join that is 4 stores per
    * partition. State partitions must therefore be sized to the stateful
    * KEY CARDINALITY of the stream, not to the session default: at this
    * fixture's volume (≤100k events) 32 partitions is pure commit
    * overhead, while a 100 TB/day deployment of the same topology would
    * raise the number with cluster size. The session value is restored
    * in a finally so batch queries are untouched. */
  private def withStatePartitions[T](s: SparkSession, n: Int)(f: => T): T =
    Tables.withShufflePartitions(s, n)(f)

  private def streamEvents(s: SparkSession, d: String, withTs: Boolean): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // FileStreamSource wants a directory to monitor: stage the single
    // parquet file into one (a live deployment would point this at the
    // landing directory / object-store prefix directly). Tables.tmp →
    // pid-namespaced, so no cross-process interference.
    val srcDir = new java.io.File(Tables.tmp("stream-src", d))
    srcDir.mkdirs()
    val staged = new java.io.File(srcDir, "events.parquet")
    // always refresh: an exists() guard would silently keep serving a
    // stale copy if the dataset at the same path were regenerated, and
    // the copy is cheap relative to the query (checkpoints are wiped per
    // run, so replay always starts from the staged file as it is now)
    stageAtomically(s"$d/events.parquet", staged)
    // Derive the stream schema from the staged file instead of hard-coding
    // the ts encoding: the fixture has shipped both int64-nanos and
    // timestamp[us], and an explicit LongType schema over micros data does
    // not throw — it silently collapses all timestamps 1000× (Jan 2024 →
    // 43 minutes of 1970), which detonates every event-time window.
    val inferred = s.read.parquet(staged.getAbsolutePath).schema
    val schema = if (withTs) inferred
                 else StructType(inferred.filterNot(_.name == "ts"))
    val df = s.readStream.schema(schema).parquet(srcDir.getAbsolutePath)
    if (withTs) {
      val out = Tables.normalizeEventTs(df.withColumn("event_ts", col("ts")), "event_ts")
        .drop("ts")
      // Sanity tripwire on the staged file (batch-side, cheap single-row
      // scan): a unit drift that survives the dtype dispatch would shift
      // timestamps by ~1000× — catch it before it produces plausible but
      // wrong windows.
      val probe = Tables.normalizeEventTs(
        s.read.parquet(staged.getAbsolutePath).limit(1)).select(col("ts")).collect()
      probe.headOption.map(_.getTimestamp(0)).foreach { t0 =>
        require(t0.after(java.sql.Timestamp.valueOf("2000-01-01 00:00:00")) &&
          t0.before(java.sql.Timestamp.valueOf("2100-01-01 00:00:00")),
          s"events.ts sanity check failed: first ts=$t0 is outside " +
            "[2000,2100) — probable timestamp-unit drift in the fixture encoding")
      }
      out
    } else df
  }

  private def runToTable(s: SparkSession, agg: DataFrame, name: String,
                         d: String, mode: String = "complete"): DataFrame = {
    s.streams.active.filter(q => Option(q.name).contains(name)).foreach(_.stop())
    // checkpoint namespaced by dataset dir (Tables.tmp invariant): a
    // concurrent run at another scale factor must not delete this run's
    // live offset log / state store
    val ckpt = Tables.tmp(s"ckpt-$name", d)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    val q = agg.writeStream
      .format("memory").queryName(name)
      .outputMode(mode)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // Update-mode memory sinks append one row per touched key per
    // micro-batch, so the read-back table is only the final state if
    // ALL input landed in one data batch (true today: single staged
    // file, no maxFilesPerTrigger). Make that invariant explicit —
    // a future multi-file staging or trigger limit must fail loudly
    // here instead of silently duplicating keys.
    if (mode == "update") {
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      require(dataBatches <= 1,
        s"$name: update-mode memory sink consumed $dataBatches data micro-batches; " +
          "the single-batch invariant is violated and per-key rows would duplicate")
    }
    s.table(name)
  }

  /** stream-agg-counts — streaming groupBy over the event stream,
    * AvailableNow replay: per-type counts and exact decimal totals. */
  val streamAggCounts: Q = (s, d) => withStatePartitions(s, 4) {
    val agg = streamEvents(s, d, withTs = false)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        outNum(sum(dec2(col("value")))).as("total_value"))
    runToTable(s, agg, "stream_agg_counts", d).orderBy("event_type")
  }

  val streamAggCountsSql: String =
    """SELECT event_type, count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** stream-window-hourly — event-time tumbling 1-hour windows with a
    * watermark (the late-data contract a live pipeline needs; under
    * AvailableNow replay in complete mode every window is emitted, so
    * the result equals the batch date_trunc aggregation). */
  val streamWindowHourly: Q = (s, d) => withStatePartitions(s, 4) {
    val agg = streamEvents(s, d, withTs = true)
      .withWatermark("event_ts", "1 hour")
      .groupBy(window(col("event_ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"))
    runToTable(s, agg, "stream_window_hourly", d).orderBy("window_start", "event_type")
  }

  val streamWindowHourlySql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
      |       event_type, count(*) AS n_events
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY window_start, event_type""".stripMargin

  /** stream-sliding-window — OVERLAPPING event-time windows (2-hour
    * width, 1-hour slide): every event belongs to exactly TWO windows,
    * so state carries width/slide copies of each aggregate — the
    * window-type matrix completion next to tumbling
    * (stream-window-hourly) and session (stream-session-window)
    * windows. Under AvailableNow complete-mode replay the result
    * equals the batch union of both per-event window assignments,
    * which is what the oracle spells. */
  val streamSlidingWindow: Q = (s, d) => withStatePartitions(s, 4) {
    val agg = streamEvents(s, d, withTs = true)
      .withWatermark("event_ts", "1 hour")
      .groupBy(window(col("event_ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"))
    runToTable(s, agg, "stream_sliding_window", d).orderBy("window_start", "event_type")
  }

  val streamSlidingWindowSql: String =
    """SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
      |       event_type, count(*) AS n_events
      |FROM (
      |  SELECT event_type, date_trunc('hour', ts) AS ws FROM events
      |  UNION ALL
      |  SELECT event_type, date_trunc('hour', ts) - INTERVAL 1 HOUR FROM events)
      |GROUP BY 1, 2
      |ORDER BY window_start, event_type""".stripMargin

  /** stream-stateful-count — arbitrary stateful processing via
    * mapGroupsWithState (the KeyValueGroupedDataset custom-state API the
    * reference's batch world has no analogue for): per-user running
    * state of (event count, value cents). Cents are exact longs so the
    * state merge is order-independent; AvailableNow replay makes the
    * final state equal the batch aggregate, which is what the oracle
    * checks. */
  val streamStatefulCount: Q = (s, d) => withStatePartitions(s, 4) {
    import s.implicits._
    import org.apache.spark.sql.streaming.GroupState
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val typed = streamEvents(s, d, withTs = false)
      .select(col("user_id"),
        (dec2(col("value")) * 100).cast(LongType).as("cents"))
      .as[(Long, Long)]
    val counted = typed
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[(Long, Long)]) =>
          val (n0, c0) = state.getOption.getOrElse((0L, 0L))
          var n = n0; var c = c0
          rows.foreach { r => n += 1; c += r._2 }
          state.update((n, c))
          (user, n, c / 100.0)
      }
      .toDF("user_id", "n_events", "total_value")
    runToTable(s, counted, "stream_stateful_count", d, mode = "update")
      .orderBy("user_id")
  }

  val streamStatefulCountSql: String =
    """SELECT user_id, count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** stream-dedup-ids — streaming exact dedup (dropDuplicates state over
    * the id column). The events file is staged TWICE into the source dir
    * so the stream genuinely carries duplicates; the dedup state must
    * collapse them back to the batch per-type counts. */
  val streamDedupIds: Q = (s, d) => withStatePartitions(s, 4) {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val srcDir = new java.io.File(Tables.tmp("stream-src-dup", d))
    srcDir.mkdirs()
    // always refresh (same staleness guard as streamEvents)
    Seq("events_a.parquet", "events_b.parquet").foreach { n =>
      stageAtomically(s"$d/events.parquet", new java.io.File(srcDir, n))
    }
    val schema = new StructType()
      .add("event_id", LongType).add("event_type", StringType)
    val deduped = s.readStream.schema(schema).parquet(srcDir.getAbsolutePath)
      .dropDuplicates("event_id")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"))
    runToTable(s, deduped, "stream_dedup_ids", d).orderBy("event_type")
  }

  val streamDedupIdsSql: String =
    """SELECT event_type, count(*) AS n_events
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** stream-join-static — stream-static enrichment join: the live event
    * stream joins a batch-loaded dimension (customer segment keyed by
    * user id) inside the streaming query, then aggregates per segment.
    * This is the canonical enrichment topology (stream joins dim, dim
    * re-resolved per micro-batch so slowly-changing dims are picked up);
    * under AvailableNow replay it equals the batch join, which is what
    * the oracle checks. The dim side is dimension-sized → Catalyst
    * broadcasts it into each micro-batch. */
  val streamJoinStatic: Q = (s, d) => withStatePartitions(s, 4) {
    val dim = customer(s, d).select(
      col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
    val agg = streamEvents(s, d, withTs = false)
      .join(dim, Seq("user_id"), "inner")
      .groupBy("segment")
      .agg(count(lit(1)).as("n_events"),
        outNum(sum(dec2(col("value")))).as("total_value"))
    runToTable(s, agg, "stream_join_static", d).orderBy("segment")
  }

  val streamJoinStaticSql: String =
    """SELECT c_mktsegment AS segment, count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY segment""".stripMargin

  /** stream-sink-files — the production sink: a stateless streaming
    * transform (filter + projection) appended to a parquet directory
    * with a checkpoint. The file sink's commit log gives exactly-once
    * file-level semantics — a re-run with the same checkpoint adds
    * nothing, a crash mid-batch leaves uncommitted files invisible to
    * readers of the sink (the log, not the directory listing, is the
    * source of truth). The graded output reads the sink back and
    * aggregates; AvailableNow replay makes it equal the batch query.
    * Sink + checkpoint are wiped per run so the replay is
    * deterministic regardless of prior state. */
  val streamSinkFiles: Q = (s, d) => withStatePartitions(s, 4) {
    val sink = Tables.tmp("stream-sink-files", d)
    val ckpt = Tables.tmp("ckpt-stream-sink-files", d)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(sink))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    val transformed = streamEvents(s, d, withTs = false)
      .filter(col("value") >= 100.0)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val q = transformed.writeStream
      .format("parquet")
      .option("path", sink)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.read.parquet(sink)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        outNum(sum(dec2(col("value")))).as("total_value"))
      .orderBy("event_type")
  }

  val streamSinkFilesSql: String =
    """SELECT event_type, count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events
      |WHERE value >= 100.0
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** stream-foreachbatch-upsert — the production warehouse-sink
    * pattern: foreachBatch merges each micro-batch into a keyed target
    * table (upsert: per-user latest event wins), the topology every
    * streaming-into-lakehouse deployment runs where the sink needs
    * MERGE semantics a file sink can't give. The events file is staged
    * twice with one file per micro-batch, so batch 2 re-delivers every
    * key into a non-empty target — the merge's idempotency under
    * redelivery (the exactly-once-effective contract foreachBatch
    * must provide, since it is at-least-once by itself) is actually
    * exercised, not vacuously true. The per-key winner is
    * argmax(event_ts, event_id), a total order, so the final target is
    * invariant to the batch split and equals the batch window oracle.
    * State commits ride GenerationStore (r12): each merge writes its
    * full next generation to a private dir and an atomic
    * manifest-pointer move publishes it — a crash at any byte boundary
    * leaves the previous generation readable (the old delete-then-move
    * swap had a window with no target at all). The latest-wins merge
    * is idempotent, so the store's batchId replay guard is belt and
    * braces here (contrast stream-mv-incremental, where it's
    * load-bearing). */
  val streamForeachUpsert: Q = (s, d) => withStatePartitions(s, 4) {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val root = Tables.tmp("stream-upsert-target", d)
    val ckpt = Tables.tmp("ckpt-stream-upsert", d)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    val srcDir = new java.io.File(Tables.tmp("stream-src-upsert", d))
    srcDir.mkdirs()
    Seq("events_a.parquet", "events_b.parquet").foreach { n =>
      stageAtomically(s"$d/events.parquet", new java.io.File(srcDir, n))
    }
    // schema inferred from the staged file, not hard-coded: the fixture's
    // ts encoding has drifted before (int64-nanos vs timestamp[us]) and a
    // wrong explicit LongType silently collapses all event times 1000×
    val inferred = s.read.parquet(
      new java.io.File(srcDir, "events_a.parquet").getAbsolutePath).schema
    val stream = Tables.normalizeEventTs(
      s.readStream.schema(inferred)
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir.getAbsolutePath)
        .withColumn("event_ts", col("ts")), "event_ts")
      .drop("ts")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("event_ts").desc, col("event_id").desc)
    def winners(df: DataFrame): DataFrame =
      df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!GenerationStore.alreadyApplied(root, batchId)) {
          val b = winners(batch)
          val merged = GenerationStore.read(root).dataDir match {
            case Some(dir) => winners(s.read.parquet(dir).unionByName(b))
            case None => b
          }
          GenerationStore.commit(root, batchId)(
            merged.write.mode("overwrite").parquet(_))
        }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.read.parquet(GenerationStore.read(root).dataDir.get)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_type"), col("value").as("last_value"))
      .orderBy("user_id")
  }

  val streamForeachUpsertSql: String =
    """SELECT user_id, event_id AS last_event_id,
      |       event_type AS last_type, value AS last_value
      |FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY user_id
      |    ORDER BY date_trunc('microseconds', ts) DESC, event_id DESC) AS rn
      |  FROM events)
      |WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  /** stream-session-window — event-time session windows (gap-based, the
    * streaming analogue of batch agg-sessionize): Spark merges adjacent
    * per-user state when an event lands within SessionGapMin of an open
    * session; state is per (user, open-session), so scale-out is by
    * user hash — no global state. A session's window end is exclusive
    * (last event + gap), so a gap of EXACTLY SessionGapMin starts a new
    * session; the oracle's lag-diff breaks on >= gap to pin the same
    * boundary rule. Watermark + APPEND mode + file sink (the
    * streamLateDrop two-run choreography, sentinel closes everything
    * real): closed sessions are EMITTED AND EVICTED as the watermark
    * passes them, so state only ever holds open sessions and the sink
    * is distributed files — the previous complete-mode/memory-sink
    * form kept every session in state and collected them all to the
    * driver, which measured fine at 100k sessions and never finished
    * at 10M (EventsScaleBench). The sentinel's own session never
    * closes and is filtered by user_id at read-back. */
  private val SessionGapMin = 10

  val streamSessionWindow: Q = (s, d) => withStatePartitions(s, 4) {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val srcDir = new java.io.File(Tables.tmp("sess-win-src", d))
    val sink = Tables.tmp("sess-win-sink", d)
    val ckpt = Tables.tmp("ckpt-sess-win", d)
    val stage = Tables.tmp("sess-win-stage", d)
    Seq(srcDir.getAbsolutePath, sink, ckpt, stage).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    srcDir.mkdirs()
    val raw = eventsTsNanos(s, d).select(col("event_id"), col("user_id"), col("ts"))
    def stageBatch(df: DataFrame, name: String): Unit = {
      val tmpDir = s"$stage/$name"
      df.coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmpDir)
      val part = new java.io.File(tmpDir).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      stageAtomically(part.getAbsolutePath, new java.io.File(srcDir, s"$name.parquet"))
    }
    val schema = new StructType()
      .add("event_id", LongType).add("user_id", LongType).add("ts", LongType)
    def runOnce(): Unit = {
      val agg = s.readStream.schema(schema).parquet(srcDir.getAbsolutePath)
        .withColumn("event_ts", expr("timestamp_micros((ts - pmod(ts, 1000)) div 1000)"))
        .withWatermark("event_ts", "1 minute")
        .groupBy(session_window(col("event_ts"), s"$SessionGapMin minutes"),
          col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .as("session_start"),
          col("n_events"))
      val q = agg.writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    stageBatch(raw, "a")
    runOnce()
    val maxTs = raw.agg(max(col("ts"))).head().getLong(0)
    stageBatch(raw.limit(1).select(lit(-100L).as("event_id"),
      lit(-1L).as("user_id"), lit(maxTs + 30L * 86400L * 1000000000L).as("ts")), "b")
    runOnce()
    s.read.parquet(sink).filter(col("user_id") >= 0)
      .orderBy("user_id", "session_start")
  }

  val streamSessionWindowSql: String =
    s"""WITH e AS (
       |  SELECT user_id, date_trunc('microseconds', ts) AS ts FROM events),
       |m AS (
       |  SELECT user_id, ts,
       |         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
       |                OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
       |                   >= INTERVAL $SessionGapMin MINUTE
       |              THEN 1 ELSE 0 END AS brk
       |  FROM e),
       |sess AS (
       |  SELECT user_id, ts,
       |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |  FROM m)
       |SELECT user_id,
       |       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       |       count(*) AS n_events
       |FROM sess
       |GROUP BY user_id, sid
       |ORDER BY user_id, session_start""".stripMargin

  /** stream-late-drop — the watermark's actual contract: late data is
    * DROPPED once the watermark passes its window, and only
    * watermark-closed windows are ever emitted in append mode. Unlike
    * the single-replay ops above, this runs TWO AvailableNow executions
    * against one checkpoint + file sink, so the watermark genuinely
    * advances between deliveries:
    *
    *  - run 1 delivers the "on-time" batch A (events before Jan 20,
    *    minus every 5th id); the commit log records
    *    wm1 = max(A.ts) − 1 h;
    *  - run 2 delivers batch B = everything else, i.e. the on-time tail
    *    PLUS the held-back 20% of early events, which now arrive with
    *    event times far below wm1 → state for their windows is gone and
    *    they are dropped; B rows in windows still open under wm1 are
    *    merged and emitted up to wm2 = max(all ts) − 1 h.
    *
    * The oracle reproduces the exact pinned edges (empirical, Spark
    * 4.1: a late row is kept iff window_end > wm; a window is emitted
    * iff window_end <= wm; the watermark itself is computed from the
    * max event time truncated to MILLISECONDS). The file sink
    * accumulates across both runs with exactly-once file commits, so
    * the read-back is the union of both runs' emissions. */
  val streamLateDrop: Q = (s, d) => withStatePartitions(s, 4) {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val srcDir = new java.io.File(Tables.tmp("stream-late-src", d))
    val sink = Tables.tmp("stream-late-sink", d)
    val ckpt = Tables.tmp("ckpt-stream-late-drop", d)
    val stage = Tables.tmp("stream-late-stage", d)
    Seq(srcDir.getAbsolutePath, sink, ckpt, stage).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    srcDir.mkdirs()
    val raw = eventsTsNanos(s, d).select(col("event_id"), col("event_type"), col("ts"))
    val isEarlyOnTime = expr(
      "timestamp_micros((ts - pmod(ts, 1000)) div 1000) < timestamp'2024-01-20 00:00:00'") &&
      col("event_id") % 5 =!= 0
    def stageBatch(df: DataFrame, name: String): Unit = {
      val tmpDir = s"$stage/$name"
      df.coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmpDir)
      val part = new java.io.File(tmpDir).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      stageAtomically(part.getAbsolutePath, new java.io.File(srcDir, s"$name.parquet"))
    }
    val schema = new StructType()
      .add("event_id", LongType).add("event_type", StringType).add("ts", LongType)
    def runOnce(): Unit = {
      val q = s.readStream.schema(schema).parquet(srcDir.getAbsolutePath)
        .withColumn("event_ts", expr("timestamp_micros((ts - pmod(ts, 1000)) div 1000)"))
        .withWatermark("event_ts", "1 hour")
        .groupBy(window(col("event_ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n_events"))
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    stageBatch(raw.filter(isEarlyOnTime), "a")
    runOnce()
    stageBatch(raw.filter(!isEarlyOnTime), "b")
    runOnce()
    s.read.parquet(sink).orderBy("window_start", "event_type")
  }

  val streamLateDropSql: String =
    """WITH ev AS (
      |  SELECT event_id, event_type, date_trunc('microseconds', ts) AS ts
      |  FROM events),
      |a AS (SELECT * FROM ev
      |      WHERE ts < TIMESTAMP '2024-01-20 00:00:00' AND event_id % 5 <> 0),
      |b AS (SELECT * FROM ev
      |      WHERE NOT (ts < TIMESTAMP '2024-01-20 00:00:00' AND event_id % 5 <> 0)),
      |wm1 AS (SELECT date_trunc('milliseconds', max(ts)) - INTERVAL 1 HOUR AS w FROM a),
      |wm2 AS (SELECT date_trunc('milliseconds', max(ts)) - INTERVAL 1 HOUR AS w FROM ev),
      |kept AS (
      |  SELECT * FROM a
      |  UNION ALL
      |  SELECT * FROM b
      |  WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR > (SELECT w FROM wm1)),
      |agg AS (
      |  SELECT date_trunc('hour', ts) AS ws, event_type, count(*) AS n_events
      |  FROM kept GROUP BY 1, 2)
      |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type, n_events
      |FROM agg
      |WHERE ws + INTERVAL 1 HOUR <= (SELECT w FROM wm2)
      |ORDER BY window_start, event_type""".stripMargin

  /** stream-flatmap-state — flatMapGroupsWithState, the other half of
    * the custom-state API (mapGroupsWithState emits exactly one row per
    * group per batch; flatMap emits ANY number — here the full per-type
    * snapshot of each user's running counts, the shape a live dashboard
    * sink consumes). State is a per-user Map[event_type → count], an
    * order-free merge; AvailableNow replay makes the final snapshot
    * equal the batch per-(user, type) counts. */
  val streamFlatmapState: Q = (s, d) => withStatePartitions(s, 4) {
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val typed = streamEvents(s, d, withTs = false)
      .select(col("user_id"), col("event_type")).as[(Long, String)]
    val counted = typed
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, String)], state: GroupState[Map[String, Long]]) =>
          val merged = rows.foldLeft(state.getOption.getOrElse(Map.empty[String, Long])) {
            case (m, (_, t)) => m.updated(t, m.getOrElse(t, 0L) + 1L)
          }
          state.update(merged)
          merged.iterator.map { case (t, c) => (user, t, c) }
      }
      .toDF("user_id", "event_type", "n_events")
    runToTable(s, counted, "stream_flatmap_state", d, mode = "update")
      .orderBy("user_id", "event_type")
  }

  val streamFlatmapStateSql: String =
    """SELECT user_id, event_type, count(*) AS n_events
      |FROM events
      |GROUP BY user_id, event_type
      |ORDER BY user_id, event_type""".stripMargin

  /** stream-stream-join — the real two-stream join: even-id events and
    * odd-id events arrive as two independent streaming sources, joined
    * on user within a ±1 h event-time band. Both sides carry watermarks
    * (that is what bounds the join state buffers in production — each
    * side can discard rows once the other side's watermark passes the
    * band); AvailableNow delivers both sides in one batch, so the
    * emitted matches equal the batch interval join, which is what the
    * oracle checks. Inner join + append mode: matches emit as both
    * sides arrive. */
  val streamStreamJoin: Q = (s, d) => withStatePartitions(s, 4) {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stage = Tables.tmp("ss-join-stage", d)
    val dirs = Seq("a", "b").map(n => new java.io.File(Tables.tmp(s"ss-join-src-$n", d)))
    dirs.foreach { f =>
      org.apache.commons.io.FileUtils.deleteQuietly(f); f.mkdirs()
    }
    val raw = eventsTsNanos(s, d).select(col("event_id"), col("user_id"), col("ts"))
    def stageSide(even: Boolean, dir: java.io.File, name: String): Unit = {
      val tmpDir = s"$stage/$name"
      raw.filter(if (even) col("event_id") % 2 === 0 else col("event_id") % 2 === 1)
        .coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmpDir)
      val part = new java.io.File(tmpDir).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      stageAtomically(part.getAbsolutePath, new java.io.File(dir, s"$name.parquet"))
    }
    stageSide(even = true, dirs(0), "a")
    stageSide(even = false, dirs(1), "b")
    val schema = new StructType()
      .add("event_id", LongType).add("user_id", LongType).add("ts", LongType)
    def side(dir: java.io.File, suffix: String): DataFrame =
      s.readStream.schema(schema).parquet(dir.getAbsolutePath)
        .select(col("event_id").as(s"event_id_$suffix"),
          col("user_id").as(s"user_$suffix"),
          expr("timestamp_micros((ts - pmod(ts, 1000)) div 1000)").as(s"ts_$suffix"))
        .withWatermark(s"ts_$suffix", "2 hours")
    val joined = side(dirs(0), "a").join(side(dirs(1), "b"),
      expr("user_a = user_b AND " +
        "ts_b BETWEEN ts_a - INTERVAL 1 HOUR AND ts_a + INTERVAL 1 HOUR"))
      .select(col("user_a").as("user_id"), col("event_id_a"), col("event_id_b"))
    runToTable(s, joined, "stream_stream_join", d, mode = "append")
      .orderBy("user_id", "event_id_a", "event_id_b")
  }

  val streamStreamJoinSql: String =
    """SELECT a.user_id AS user_id, a.event_id AS event_id_a, b.event_id AS event_id_b
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id
      | AND a.event_id % 2 = 0 AND b.event_id % 2 = 1
      | AND date_trunc('microseconds', b.ts)
      |     BETWEEN date_trunc('microseconds', a.ts) - INTERVAL 1 HOUR
      |         AND date_trunc('microseconds', a.ts) + INTERVAL 1 HOUR
      |ORDER BY user_id, event_id_a, event_id_b""".stripMargin

  /** stream-initial-state — warm-starting stateful processing: the
    * mapGroupsWithState overload that seeds per-key state from a BATCH
    * dataset before the first micro-batch. Here the "historical" counts
    * (event_id % 3 == 0, standing in for yesterday's aggregate table)
    * become initial state and only the remainder streams; the final
    * per-user counts must equal the batch aggregate over EVERYTHING —
    * i.e. a pipeline restart from a compacted snapshot loses nothing.
    * At 100 TB this is how stateful jobs bootstrap without replaying
    * the full history through the stream. */
  val streamInitialState: Q = (s, d) => withStatePartitions(s, 4) {
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // historical partition → initial state (a batch KeyValueGroupedDataset)
    val hist = eventsTsNanos(s, d).filter(col("event_id") % 3 === 0)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("n")).as[(Long, Long)]
      .groupByKey(_._1).mapValues(_._2)
    // live stream = the remainder, staged into its own source dir
    val srcDir = new java.io.File(Tables.tmp("init-state-src", d))
    org.apache.commons.io.FileUtils.deleteQuietly(srcDir)
    srcDir.mkdirs()
    val stage = Tables.tmp("init-state-stage", d)
    val rest = eventsTsNanos(s, d).filter(col("event_id") % 3 =!= 0)
      .select(col("event_id"), col("user_id"))
    rest.coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    stageAtomically(part.getAbsolutePath, new java.io.File(srcDir, "rest.parquet"))
    val schema = new StructType().add("event_id", LongType).add("user_id", LongType)
    val typed = s.readStream.schema(schema).parquet(srcDir.getAbsolutePath)
      .select(col("user_id")).as[Long]
    val counted = typed.groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout(), hist) {
        (user: Long, rows: Iterator[Long], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          (user, n)
      }
      .toDF("user_id", "n_events")
    runToTable(s, counted, "stream_initial_state", d, mode = "update")
      .orderBy("user_id")
  }

  val streamInitialStateSql: String =
    """SELECT user_id, count(*) AS n_events
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** stream-windowed-rollup — CHAINED streaming window aggregations
    * (Spark 3.5+): hourly counts feed a second, daily window aggregate
    * in the same streaming query via window_time() — the streaming
    * form of a rollup cube, with state at BOTH granularities. Chained
    * aggs only run in append mode, so windows emit strictly when the
    * watermark closes them: run 1 delivers all real events (the last
    * day stays open), run 2's far-future sentinel closes everything
    * real. The sentinel's own windows stay open and are never emitted
    * — no filtering needed beyond the read-back. */
  val streamWindowedRollup: Q = (s, d) => withStatePartitions(s, 4) {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val srcDir = new java.io.File(Tables.tmp("wroll-src", d))
    val sink = Tables.tmp("wroll-sink", d)
    val ckpt = Tables.tmp("ckpt-wroll", d)
    val stage = Tables.tmp("wroll-stage", d)
    Seq(srcDir.getAbsolutePath, sink, ckpt, stage).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    srcDir.mkdirs()
    val raw = eventsTsNanos(s, d).select(col("event_id"), col("ts"))
    def stageBatch(df: DataFrame, name: String): Unit = {
      val tmpDir = s"$stage/$name"
      df.coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmpDir)
      val part = new java.io.File(tmpDir).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      stageAtomically(part.getAbsolutePath, new java.io.File(srcDir, s"$name.parquet"))
    }
    val schema = new StructType().add("event_id", LongType).add("ts", LongType)
    def runOnce(): Unit = {
      val hourly = s.readStream.schema(schema).parquet(srcDir.getAbsolutePath)
        .withColumn("event_ts", expr("timestamp_micros((ts - pmod(ts, 1000)) div 1000)"))
        .withWatermark("event_ts", "1 hour")
        .groupBy(window(col("event_ts"), "1 hour"))
        .agg(count(lit(1)).as("n_hourly"))
      val daily = hourly
        .groupBy(window(window_time(col("window")), "24 hours").as("day"))
        .agg(sum(col("n_hourly")).as("n_events"),
          count(lit(1)).as("n_hours"))
        .select(date_format(col("day.start"), "yyyy-MM-dd").as("day"),
          col("n_events"), col("n_hours"))
      val q = daily.writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    stageBatch(raw, "a")
    runOnce()
    val maxTs = raw.agg(max(col("ts"))).head().getLong(0)
    stageBatch(raw.limit(1).select(lit(-100L).as("event_id"),
      lit(maxTs + 30L * 86400L * 1000000000L).as("ts")), "b")
    runOnce()
    s.read.parquet(sink).orderBy("day")
  }

  val streamWindowedRollupSql: String =
    """WITH h AS (
      |  SELECT date_trunc('hour', ts) AS hr, count(*) AS n_hourly
      |  FROM events GROUP BY 1)
      |SELECT strftime(date_trunc('day', hr), '%Y-%m-%d') AS day,
      |       CAST(sum(n_hourly) AS BIGINT) AS n_events,
      |       count(*) AS n_hours
      |FROM h
      |GROUP BY 1
      |ORDER BY day""".stripMargin

  /** stream-state-timeout — GroupStateTimeout.EventTimeTimeout, the
    * state-EVICTION half of the legacy custom-state API (the other ops
    * keep state forever): each user's running count lives in state with
    * a timeout at max(event time)+2h; the group emits NOTHING while
    * open, and exactly one final row from the hasTimedOut branch once
    * the watermark passes its timeout. Run 1 delivers all real events
    * (every group open → sink stays empty); run 2 delivers one
    * far-future sentinel user whose only effect is advancing the
    * watermark → every real group times out and flushes. This is the
    * session-close-and-release pattern: at 100 TB/day state size is
    * |open sessions|, not |users ever seen|. Oracle: the batch per-user
    * counts (every session closes once the stream drains). */
  val streamStateTimeout: Q = (s, d) => withStatePartitions(s, 4) {
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val srcDir = new java.io.File(Tables.tmp("state-timeout-src", d))
    val sink = Tables.tmp("state-timeout-sink", d)
    val ckpt = Tables.tmp("ckpt-state-timeout", d)
    val stage = Tables.tmp("state-timeout-stage", d)
    Seq(srcDir.getAbsolutePath, sink, ckpt, stage).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    srcDir.mkdirs()
    val raw = eventsTsNanos(s, d).select(col("event_id"), col("user_id"), col("ts"))
    def stageBatch(df: DataFrame, name: String): Unit = {
      val tmpDir = s"$stage/$name"
      df.coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmpDir)
      val part = new java.io.File(tmpDir).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      stageAtomically(part.getAbsolutePath, new java.io.File(srcDir, s"$name.parquet"))
    }
    val schema = new StructType()
      .add("event_id", LongType).add("user_id", LongType).add("ts", LongType)
    def runOnce(): Unit = {
      val typed = s.readStream.schema(schema).parquet(srcDir.getAbsolutePath)
        .withColumn("event_ts", expr("timestamp_micros((ts - pmod(ts, 1000)) div 1000)"))
        .withWatermark("event_ts", "1 hour")
        .select(col("user_id"), col("event_ts")).as[(Long, java.sql.Timestamp)]
      val closed = typed.groupByKey(_._1)
        .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.EventTimeTimeout) {
          (user: Long, rows: Iterator[(Long, java.sql.Timestamp)],
           state: GroupState[(Long, Long)]) =>
            if (state.hasTimedOut) {
              val (n, _) = state.get
              state.remove()
              Iterator.single((user, n))
            } else {
              var (n, maxMs) = state.getOption.getOrElse((0L, 0L))
              rows.foreach { r => n += 1; maxMs = math.max(maxMs, r._2.getTime) }
              state.update((n, maxMs))
              // close 2h (event time) after the last event seen so far
              state.setTimeoutTimestamp(maxMs + 2L * 3600 * 1000)
              Iterator.empty
            }
        }
        .toDF("user_id", "n_events")
      val q = closed.writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    stageBatch(raw, "a")
    runOnce()
    val maxTs = raw.agg(max(col("ts"))).head().getLong(0)
    stageBatch(raw.limit(1).select(lit(-100L).as("event_id"),
      lit(-1L).as("user_id"), lit(maxTs + 30L * 86400L * 1000000000L).as("ts")), "b")
    runOnce()
    s.read.parquet(sink).filter(col("user_id") >= 0).orderBy("user_id")
  }

  val streamStateTimeoutSql: String =
    """SELECT user_id, count(*) AS n_events
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** Per-user processor for stream-transform-with-state: composite
    * state = MapState[event_type → count] + ValueState[max value].
    * Emits the full per-type snapshot for every user touched in the
    * batch (update-mode dashboard shape, like stream-flatmap-state). */
  private class UserStatsProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, String, Double), (Long, String, Long, Double)] {
    import org.apache.spark.sql.streaming.{MapState, ValueState, TTLConfig, TimerValues, OutputMode, TimeMode}
    import org.apache.spark.sql.Encoders
    @transient private var typeCounts: MapState[String, Long] = _
    @transient private var maxValue: ValueState[Double] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      typeCounts = getHandle.getMapState[String, Long](
        "typeCounts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      maxValue = getHandle.getValueState[Double](
        "maxValue", Encoders.scalaDouble, TTLConfig.NONE)
    }
    override def handleInputRows(user: Long, rows: Iterator[(Long, String, Double)],
                                 timerValues: TimerValues): Iterator[(Long, String, Long, Double)] = {
      var mx = if (maxValue.exists()) maxValue.get() else Double.NegativeInfinity
      rows.foreach { case (_, t, v) =>
        val cur = if (typeCounts.containsKey(t)) typeCounts.getValue(t) else 0L
        typeCounts.updateValue(t, cur + 1L)
        if (v > mx) mx = v
      }
      maxValue.update(mx)
      typeCounts.iterator().map { case (t, c) => (user, t, c, mx) }
    }
  }

  /** Per-user processor for stream-tws-list-state: a bounded recent-ids
    * buffer in ListState (append per row, trim via put) — the third
    * state shape of the new API after ValueState and MapState. The
    * buffer keeps the 3 LARGEST (ts, event_id) pairs so the result is
    * order-independent under replay, not arrival-order-dependent. */
  private class RecentIdsProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long, Long), (Long, String)] {
    import org.apache.spark.sql.streaming.{ListState, TTLConfig, TimerValues, OutputMode, TimeMode}
    import org.apache.spark.sql.Encoders
    @transient private var recent: ListState[(Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      recent = getHandle.getListState[(Long, Long)](
        "recent", Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)
    override def handleInputRows(user: Long, rows: Iterator[(Long, Long, Long)],
                                 timerValues: TimerValues): Iterator[(Long, String)] = {
      rows.foreach { case (_, eid, ts) => recent.appendValue((ts, eid)) }
      val top3 = (if (recent.exists()) recent.get().toSeq else Seq.empty)
        .sortBy { case (ts, eid) => (-ts, -eid) }.take(3)
      recent.put(top3.toArray) // trim: state stays bounded at 3 entries
      Iterator.single((user, top3.map(_._2).mkString(",")))
    }
  }

  /** stream-tws-list-state — transformWithState with LIST state (the
    * third state shape after stream-transform-with-state's Map+Value):
    * per user, the ids of its 3 latest events, the buffer trimmed to 3
    * inside the processor on every batch so state NEVER grows with the
    * stream — the bounded-recent-activity pattern every feed/session
    * service runs. Ordering is (ts, event_id) descending: replay- and
    * partition-order-independent. Oracle: the batch top-3-per-user
    * window. */
  val streamTwsListState: Q = (s, d) => withStatePartitions(s, 4) {
    import s.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(providerKey)
    s.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val typed = streamEvents(s, d, withTs = true)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("event_ts")).as("ts_us"))
        .as[(Long, Long, Long)]
      val snap = typed.groupByKey(_._1)
        .transformWithState(new RecentIdsProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDF("user_id", "latest3")
      runToTable(s, snap, "stream_tws_list", d, mode = "update")
        .orderBy("user_id")
    } finally {
      prev match {
        case Some(p) => s.conf.set(providerKey, p)
        case None => s.conf.unset(providerKey)
      }
    }
  }

  val streamTwsListStateSql: String =
    """WITH r AS (
      |  SELECT user_id, event_id,
      |         row_number() OVER (PARTITION BY user_id
      |           ORDER BY date_trunc('microseconds', ts) DESC, event_id DESC) AS rk
      |  FROM events)
      |SELECT user_id,
      |       string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY rk) AS latest3
      |FROM r WHERE rk <= 3
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** Per-user processor for stream-tws-timers: counts events in a
    * ValueState, re-arms an event-time timer at max(event time)+2h on
    * every batch, emits ONLY from the expired-timer callback (then
    * clears state, so later stale timers find nothing and stay
    * silent). */
  private class TimerCloseProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, java.sql.Timestamp), (Long, Long)] {
    import org.apache.spark.sql.streaming.{ValueState, TTLConfig, TimerValues, ExpiredTimerInfo, OutputMode, TimeMode}
    import org.apache.spark.sql.Encoders
    @transient private var nState: ValueState[Long] = _
    @transient private var armedAt: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      nState = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)
      armedAt = getHandle.getValueState[Long]("armedAt", Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(user: Long, rows: Iterator[(Long, java.sql.Timestamp)],
                                 timerValues: TimerValues): Iterator[(Long, Long)] = {
      var n = if (nState.exists()) nState.get() else 0L
      var maxMs = if (armedAt.exists()) armedAt.get() else 0L
      rows.foreach { case (_, ts) => n += 1; maxMs = math.max(maxMs, ts.getTime) }
      nState.update(n)
      // re-arm: drop the previous timer so exactly one is pending
      if (armedAt.exists()) getHandle.deleteTimer(armedAt.get() + 2L * 3600 * 1000)
      getHandle.registerTimer(maxMs + 2L * 3600 * 1000)
      armedAt.update(maxMs)
      Iterator.empty
    }
    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[(Long, Long)] = {
      if (nState.exists()) {
        val n = nState.get()
        nState.clear(); armedAt.clear()
        Iterator.single((user, n))
      } else Iterator.empty
    }
  }

  /** stream-tws-timers — transformWithState with EVENT-TIME TIMERS
    * (registerTimer / deleteTimer / handleExpiredTimer, TimeMode
    * .EventTime): the new-API twin of stream-state-timeout. Each user
    * re-arms a close timer 2h after its latest event; nothing emits
    * until the watermark passes a timer, then the expired-timer
    * callback flushes the final count and clears state. Two
    * AvailableNow runs: run 1 arms every timer (sink stays empty),
    * run 2's far-future sentinel advances the watermark and fires them
    * all. RocksDB provider required by the API, restored afterwards. */
  val streamTwsTimers: Q = (s, d) => withStatePartitions(s, 4) {
    import s.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(providerKey)
    s.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val srcDir = new java.io.File(Tables.tmp("tws-timer-src", d))
      val sink = Tables.tmp("tws-timer-sink", d)
      val ckpt = Tables.tmp("ckpt-tws-timer", d)
      val stage = Tables.tmp("tws-timer-stage", d)
      Seq(srcDir.getAbsolutePath, sink, ckpt, stage).foreach(p =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
      srcDir.mkdirs()
      val raw = eventsTsNanos(s, d).select(col("event_id"), col("user_id"), col("ts"))
      def stageBatch(df: DataFrame, name: String): Unit = {
        val tmpDir = s"$stage/$name"
        df.coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmpDir)
        val part = new java.io.File(tmpDir).listFiles()
          .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
        stageAtomically(part.getAbsolutePath, new java.io.File(srcDir, s"$name.parquet"))
      }
      val schema = new StructType()
        .add("event_id", LongType).add("user_id", LongType).add("ts", LongType)
      def runOnce(): Unit = {
        val typed = s.readStream.schema(schema).parquet(srcDir.getAbsolutePath)
          .withColumn("event_ts", expr("timestamp_micros((ts - pmod(ts, 1000)) div 1000)"))
          .withWatermark("event_ts", "1 hour")
          .select(col("user_id"), col("event_ts")).as[(Long, java.sql.Timestamp)]
        val closed = typed.groupByKey(_._1)
          .transformWithState(new TimerCloseProcessor,
            TimeMode.EventTime(), OutputMode.Append())
          .toDF("user_id", "n_events")
        val q = closed.writeStream.format("parquet")
          .option("path", sink).option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      stageBatch(raw, "a")
      runOnce()
      val maxTs = raw.agg(max(col("ts"))).head().getLong(0)
      stageBatch(raw.limit(1).select(lit(-100L).as("event_id"),
        lit(-1L).as("user_id"), lit(maxTs + 30L * 86400L * 1000000000L).as("ts")), "b")
      runOnce()
      s.read.parquet(sink).filter(col("user_id") >= 0).orderBy("user_id")
    } finally {
      prev match {
        case Some(p) => s.conf.set(providerKey, p)
        case None => s.conf.unset(providerKey)
      }
    }
  }

  val streamTwsTimersSql: String =
    """SELECT user_id, count(*) AS n_events
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** stream-transform-with-state — the Spark 4 arbitrary-state API
    * (transformWithState, successor of map/flatMapGroupsWithState):
    * a StatefulProcessor with TWO composite state variables — a
    * MapState (per-type counts: keyed sub-state the old API had to
    * fake inside one blob value) and a ValueState (running max) —
    * over the RocksDB state store provider it requires. Emits each
    * user's per-type snapshot; AvailableNow replay makes the final
    * snapshot equal the batch per-(user, type) counts joined with the
    * per-user max. The provider conf is restored after the run so the
    * legacy-API ops keep exercising the default HDFS-backed store. */
  val streamTransformWithState: Q = (s, d) => withStatePartitions(s, 4) {
    import s.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(providerKey)
    s.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val typed = streamEvents(s, d, withTs = false)
        .select(col("user_id"), col("event_type"), col("value"))
        .as[(Long, String, Double)]
      val snap = typed.groupByKey(_._1)
        .transformWithState(new UserStatsProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDF("user_id", "event_type", "n_type", "max_value")
      runToTable(s, snap, "stream_tws", d, mode = "update")
        .orderBy("user_id", "event_type")
    } finally {
      prev match {
        case Some(p) => s.conf.set(providerKey, p)
        case None => s.conf.unset(providerKey)
      }
    }
  }

  val streamTransformWithStateSql: String =
    """WITH t AS (SELECT user_id, event_type, count(*) AS n_type
      |           FROM events GROUP BY 1, 2),
      |u AS (SELECT user_id, max(value) AS max_value FROM events GROUP BY 1)
      |SELECT t.user_id, t.event_type, t.n_type, u.max_value
      |FROM t JOIN u USING (user_id)
      |ORDER BY t.user_id, t.event_type""".stripMargin

  /** stream-left-outer-join — stream-stream LEFT OUTER interval join:
    * the hard half of streaming joins, because the null-padded rows for
    * unmatched left events can only be emitted once the watermark
    * proves no matching right row can still arrive. Like
    * stream-late-drop this runs TWO AvailableNow executions against one
    * checkpoint + file sink: run 1 delivers both real sides (matches
    * emit immediately, unmatched left rows are withheld in state);
    * run 2 delivers one far-future sentinel row per side (impossible
    * user ids −1/−2, so they match nothing) whose only effect is to
    * advance both watermarks past every real event's join window —
    * state for unmatched left rows expires and they flush with a null
    * right side (coalesced to −1: the compare must not depend on
    * engine null-ordering). The file sink accumulates across runs, so
    * the read-back is matches ∪ expired-unmatched = the batch LEFT
    * JOIN, which is what the oracle checks. */
  val streamLeftOuterJoin: Q = (s, d) => withStatePartitions(s, 4) {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stage = Tables.tmp("ss-loj-stage", d)
    val sink = Tables.tmp("ss-loj-sink", d)
    val ckpt = Tables.tmp("ckpt-ss-loj", d)
    val dirs = Seq("a", "b").map(n => new java.io.File(Tables.tmp(s"ss-loj-src-$n", d)))
    (dirs.map(_.getAbsolutePath) ++ Seq(sink, ckpt, stage)).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    dirs.foreach(_.mkdirs())
    val raw = eventsTsNanos(s, d).select(col("event_id"), col("user_id"), col("ts"))
    def stageInto(df: DataFrame, dir: java.io.File, name: String): Unit = {
      val tmpDir = s"$stage/$name"
      df.coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmpDir)
      val part = new java.io.File(tmpDir).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      stageAtomically(part.getAbsolutePath, new java.io.File(dir, s"$name.parquet"))
    }
    stageInto(raw.filter(col("event_id") % 2 === 0), dirs(0), "a")
    stageInto(raw.filter(col("event_id") % 2 === 1), dirs(1), "b")
    val schema = new StructType()
      .add("event_id", LongType).add("user_id", LongType).add("ts", LongType)
    def side(dir: java.io.File, suffix: String): DataFrame =
      s.readStream.schema(schema).parquet(dir.getAbsolutePath)
        .select(col("event_id").as(s"event_id_$suffix"),
          col("user_id").as(s"user_$suffix"),
          expr("timestamp_micros((ts - pmod(ts, 1000)) div 1000)").as(s"ts_$suffix"))
        .withWatermark(s"ts_$suffix", "2 hours")
    def runOnce(): Unit = {
      val joined = side(dirs(0), "a").join(side(dirs(1), "b"),
        expr("user_a = user_b AND " +
          "ts_b BETWEEN ts_a - INTERVAL 1 HOUR AND ts_a + INTERVAL 1 HOUR"),
        "left_outer")
        .select(col("user_a").as("user_id"), col("event_id_a"),
          coalesce(col("event_id_b"), lit(-1L)).as("event_id_b"))
      val q = joined.writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    // watermark-advancing sentinels: +10 days, unmatched by construction
    val maxTs = raw.agg(max(col("ts"))).head().getLong(0)
    val far = maxTs + 10L * 86400L * 1000000000L
    stageInto(raw.limit(1).select(lit(-100L).as("event_id"),
      lit(-1L).as("user_id"), lit(far).as("ts")), dirs(0), "a2")
    stageInto(raw.limit(1).select(lit(-101L).as("event_id"),
      lit(-2L).as("user_id"), lit(far).as("ts")), dirs(1), "b2")
    runOnce()
    s.read.parquet(sink).filter(col("user_id") >= 0)
      .orderBy("user_id", "event_id_a", "event_id_b")
  }

  val streamLeftOuterJoinSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, date_trunc('microseconds', ts) AS ts FROM events),
      |a AS (SELECT * FROM ev WHERE event_id % 2 = 0),
      |b AS (SELECT * FROM ev WHERE event_id % 2 = 1)
      |SELECT a.user_id AS user_id, a.event_id AS event_id_a,
      |       coalesce(b.event_id, -1) AS event_id_b
      |FROM a LEFT JOIN b
      |  ON a.user_id = b.user_id
      | AND b.ts BETWEEN a.ts - INTERVAL 1 HOUR AND a.ts + INTERVAL 1 HOUR
      |ORDER BY user_id, event_id_a, event_id_b""".stripMargin

  /** stream-dedup-within-watermark — Spark 3.5+'s
    * dropDuplicatesWithinWatermark: exact dedup whose state EXPIRES
    * once the watermark passes a key's event time, where plain
    * dropDuplicates keeps every key forever (the state-store OOM that
    * kills long-running dedup streams — at 100 TB/day the unbounded
    * version is simply not deployable). The contract: duplicates are
    * only guaranteed caught while they arrive within the watermark
    * delay of the first sighting — exactly the at-least-once
    * redelivery window of real transports, which redeliver in seconds,
    * not days. The staged source lands the same file twice (every
    * event exactly duplicated, identical timestamps → trivially inside
    * the delay), so the deduped aggregate equals the batch DISTINCT. */
  val streamDedupWithinWatermark: Q = (s, d) => withStatePartitions(s, 4) {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val srcDir = new java.io.File(Tables.tmp("stream-src-dupwm", d))
    srcDir.mkdirs()
    Seq("events_a.parquet", "events_b.parquet").foreach { n =>
      stageAtomically(s"$d/events.parquet", new java.io.File(srcDir, n))
    }
    // inferred schema + dtype-dispatched conversion: see streamForeachUpsert
    val inferred = s.read.parquet(
      new java.io.File(srcDir, "events_a.parquet").getAbsolutePath).schema
    val deduped = Tables.normalizeEventTs(
      s.readStream.schema(StructType(inferred.filter(f =>
          Seq("event_id", "event_type", "ts").contains(f.name))))
        .parquet(srcDir.getAbsolutePath)
        .withColumn("event_ts", col("ts")), "event_ts")
      .drop("ts")
      .withWatermark("event_ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"))
    runToTable(s, deduped, "stream_dedup_within_wm", d).orderBy("event_type")
  }

  val streamDedupWithinWatermarkSql: String =
    """SELECT event_type, count(*) AS n_events
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** stream-multi-batch — multi-micro-batch replay correctness:
    * maxFilesPerTrigger=1 forces AvailableNow to process three staged
    * files as THREE micro-batches, and the complete-mode aggregate
    * must still equal one batch pass over the union — the incremental-
    * state contract that every other op in this file gets to sidestep
    * by single-file staging (runToTable's update-mode guard documents
    * why that shortcut is load-bearing). This op is the positive
    * control: state carried across batch boundaries, counts and sums
    * accumulated incrementally, equal to the 3× batch answer. In
    * production the trigger limit is the backfill throttle (bounded
    * state growth per batch, checkpoint after each), so replaying a
    * month of landed files neither OOMs nor skews results. */
  val streamMultiBatch: Q = (s, d) => withStatePartitions(s, 4) {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val srcDir = new java.io.File(Tables.tmp("stream-src-multi", d))
    srcDir.mkdirs()
    Seq("events_a.parquet", "events_b.parquet", "events_c.parquet").foreach { n =>
      stageAtomically(s"$d/events.parquet", new java.io.File(srcDir, n))
    }
    val schema = new StructType()
      .add("event_id", LongType).add("event_type", StringType).add("value", DoubleType)
    val agg = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.getAbsolutePath)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        outNum(sum(dec2(col("value")))).as("total_value"))
    runToTable(s, agg, "stream_multi_batch", d).orderBy("event_type")
  }

  val streamMultiBatchSql: String =
    """SELECT event_type, CAST(count(*) * 3 AS BIGINT) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) * 3 AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** stream-incremental-etl — the incremental-batch contract that
    * production file-landing ETL rests on: run 1 processes shard A
    * through a stateless transform into a file sink; shard B lands;
    * run 2 against the SAME checkpoint processes ONLY B (the offset
    * log is the increment tracker — no reprocessing, no dedup pass).
    * The graded rollup over the sink equals one batch pass over A∪B;
    * any reprocessing would double A's contribution and break the
    * checksum. This is stream-multi-batch's sibling: that op proves
    * state carries ACROSS micro-batches in one run, this one proves
    * offsets carry across RUNS — the restart-shaped half of
    * exactly-once. */
  val streamIncrementalEtl: Q = (s, d) => withStatePartitions(s, 4) {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stage = Tables.tmp("ss-inc-stage", d)
    val srcDir = new java.io.File(Tables.tmp("ss-inc-src", d))
    val sink = Tables.tmp("ss-inc-sink", d)
    val ckpt = Tables.tmp("ckpt-ss-inc", d)
    Seq(srcDir.getAbsolutePath, sink, ckpt, stage).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    srcDir.mkdirs()
    val raw = eventsTsNanos(s, d)
      .select(col("event_id"), col("event_type"), col("value"))
    def stageInto(df: DataFrame, name: String): Unit = {
      val tmpDir = s"$stage/$name"
      df.coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmpDir)
      val part = new java.io.File(tmpDir).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      stageAtomically(part.getAbsolutePath, new java.io.File(srcDir, s"$name.parquet"))
    }
    val schema = new StructType()
      .add("event_id", LongType).add("event_type", StringType).add("value", DoubleType)
    def runOnce(): Unit = {
      val q = s.readStream.schema(schema).parquet(srcDir.getAbsolutePath)
        .select(col("event_id"), col("event_type"),
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    stageInto(raw.filter(col("event_id") % 2 === 0), "a")
    runOnce()
    stageInto(raw.filter(col("event_id") % 2 === 1), "b")
    runOnce()
    s.read.parquet(sink)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("cents_sum"),
        // xor-style order-free id checksum: doubles on reprocessing
        sum(col("event_id")).as("id_sum"))
      .orderBy("event_type")
  }

  val streamIncrementalEtlSql: String =
    """SELECT event_type, count(*) AS n_events,
      |       CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents_sum,
      |       CAST(sum(event_id) AS BIGINT) AS id_sum
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** stream-dead-letter — the dead-letter-queue topology: one
    * foreachBatch pass routes each micro-batch into a MAIN sink and a
    * QUARANTINE sink by a validity predicate (here: payload key k < 80
    * and non-negative value — standing in for schema-version and range
    * checks), so bad records are preserved for replay instead of
    * crashing the stream or being dropped. The batch is persisted
    * before the two filtered writes — one source read, two sinks, the
    * invariant that makes the split affordable at scale. Graded as
    * per-(sink, event_type) counts: quarantine + main must partition
    * the stream exactly. */
  val streamDeadLetter: Q = (s, d) => withStatePartitions(s, 4) {
    val main = Tables.tmp("stream-dlq-main", d)
    val dlq = Tables.tmp("stream-dlq-quarantine", d)
    val ckpt = Tables.tmp("ckpt-stream-dlq", d)
    Seq(main, dlq, ckpt).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    val stream = streamEvents(s, d, withTs = false)
      .withColumn("valid",
        get_json_object(col("props"), "$.k").cast(IntegerType) < 80 &&
          col("value") >= 0)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.persist()
        batch.filter(col("valid")).drop("valid")
          .write.mode("append").parquet(main)
        batch.filter(!col("valid")).drop("valid")
          .write.mode("append").parquet(dlq)
        batch.unpersist()
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val readBack = (dir: String, label: String) =>
      s.read.parquet(dir).groupBy("event_type")
        .agg(count(lit(1)).as("n")).withColumn("sink", lit(label))
    readBack(main, "main").unionByName(readBack(dlq, "quarantine"))
      .select("sink", "event_type", "n")
      .orderBy("sink", "event_type")
  }

  val streamDeadLetterSql: String =
    """SELECT CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) < 80
      |            AND value >= 0 THEN 'main' ELSE 'quarantine' END AS sink,
      |       event_type, count(*) AS n
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY sink, event_type""".stripMargin

  /** stream-windowed-topk — the "trending now" panel: 6-hour tumbling
    * event-time windows aggregate (count, revenue) per type in the
    * STREAM (watermarked state, AvailableNow replay), and the top-2
    * types per window come from a BATCH window rank over the result
    * table — the standard two-layer split, because per-window top-k
    * inside streaming state would need a rank-maintaining custom
    * operator for what is a cheap post-pass over the (already tiny)
    * aggregate. Windows align to the epoch exactly as Spark's
    * window() does, which the oracle mirrors with integer epoch
    * arithmetic. */
  val streamWindowedTopk: Q = (s, d) => withStatePartitions(s, 4) {
    val agg = streamEvents(s, d, withTs = true)
      .withWatermark("event_ts", "1 hour")
      .groupBy(window(col("event_ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100).cast(LongType)).as("cents"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("cents"))
    val tbl = runToTable(s, agg, "stream_windowed_topk", d)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("window_start").orderBy(col("n_events").desc, col("event_type").asc)
    tbl.withColumn("rk", row_number().over(w)).filter(col("rk") <= 2)
      .select(col("window_start"), col("rk"), col("event_type"), col("n_events"),
        (col("cents").cast(DoubleType) / 100).as("revenue"))
      .orderBy("window_start", "rk")
  }

  val streamWindowedTopkSql: String =
    """WITH win AS (
      |  SELECT strftime(make_timestamp((epoch_us(date_trunc('microseconds', ts)) // 21600000000) * 21600000000), '%Y-%m-%d %H:%M:%S') AS window_start,
      |         event_type, count(*) AS n_events,
      |         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY window_start ORDER BY n_events DESC, event_type) AS rk
      |  FROM win)
      |SELECT window_start, rk, event_type, n_events,
      |       CAST(cents AS DOUBLE) / 100 AS revenue
      |FROM ranked WHERE rk <= 2
      |ORDER BY window_start, rk""".stripMargin

  val queries: Map[String, Q] = Map(
    "stream-dead-letter" -> streamDeadLetter,
    "stream-incremental-etl" -> streamIncrementalEtl,
    "stream-dedup-within-watermark" -> streamDedupWithinWatermark,
    "stream-multi-batch" -> streamMultiBatch,
    "stream-transform-with-state" -> streamTransformWithState,
    "stream-state-timeout" -> streamStateTimeout,
    "stream-initial-state" -> streamInitialState,
    "stream-tws-timers" -> streamTwsTimers,
    "stream-tws-list-state" -> streamTwsListState,
    "stream-windowed-rollup" -> streamWindowedRollup,
    "stream-left-outer-join" -> streamLeftOuterJoin,
    "stream-flatmap-state" -> streamFlatmapState,
    "stream-stream-join" -> streamStreamJoin,
    "stream-late-drop" -> streamLateDrop,
    "stream-session-window" -> streamSessionWindow,
    "stream-foreachbatch-upsert" -> streamForeachUpsert,
    "stream-sink-files" -> streamSinkFiles,
    "stream-agg-counts" -> streamAggCounts,
    "stream-window-hourly" -> streamWindowHourly,
    "stream-sliding-window" -> streamSlidingWindow,
    "stream-stateful-count" -> streamStatefulCount,
    "stream-dedup-ids" -> streamDedupIds,
    "stream-join-static" -> streamJoinStatic,
    "stream-windowed-topk" -> streamWindowedTopk)

  val oracles: Map[String, String] = Map(
    "stream-dead-letter" -> streamDeadLetterSql,
    "stream-incremental-etl" -> streamIncrementalEtlSql,
    "stream-dedup-within-watermark" -> streamDedupWithinWatermarkSql,
    "stream-multi-batch" -> streamMultiBatchSql,
    "stream-transform-with-state" -> streamTransformWithStateSql,
    "stream-state-timeout" -> streamStateTimeoutSql,
    "stream-initial-state" -> streamInitialStateSql,
    "stream-tws-timers" -> streamTwsTimersSql,
    "stream-tws-list-state" -> streamTwsListStateSql,
    "stream-windowed-rollup" -> streamWindowedRollupSql,
    "stream-left-outer-join" -> streamLeftOuterJoinSql,
    "stream-flatmap-state" -> streamFlatmapStateSql,
    "stream-stream-join" -> streamStreamJoinSql,
    "stream-late-drop" -> streamLateDropSql,
    "stream-session-window" -> streamSessionWindowSql,
    "stream-foreachbatch-upsert" -> streamForeachUpsertSql,
    "stream-sink-files" -> streamSinkFilesSql,
    "stream-agg-counts" -> streamAggCountsSql,
    "stream-window-hourly" -> streamWindowHourlySql,
    "stream-sliding-window" -> streamSlidingWindowSql,
    "stream-stateful-count" -> streamStatefulCountSql,
    "stream-dedup-ids" -> streamDedupIdsSql,
    "stream-join-static" -> streamJoinStaticSql,
    "stream-windowed-topk" -> streamWindowedTopkSql)
}
