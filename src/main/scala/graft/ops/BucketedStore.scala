package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table store shared by every op that claims a shuffle-free
  * (SMB) join side — factored out of sink-bucketed-join (RelScale) in
  * r12 so agg-mv-delta-refresh's stored MV rides the same machinery.
  *
  * "Bucket once, join forever": re-bucketizing on every run would make
  * the bench measure the one-time bucketing WRITE instead of the
  * shuffle-free join it buys. A table is rebuilt only when its input
  * fingerprint changes (source parquet size + nanosecond mtime + the
  * code-side table definition — projection, key, bucket count; a
  * source-only fingerprint would silently serve stale bucketed files
  * after an edit to the defining query). A fresh session over current
  * files just re-registers the existing bucketed files in the catalog
  * (metadata-only; bucket ids live in the file names, so the scan
  * stays bucketed) and goes straight to the join.
  *
  * Concurrency: check-then-act is serialized ACROSS JVMs by an OS file
  * lock on a sibling lock file (never inside the table dir — the
  * rebuild deletes it), held over the ENTIRE check INCLUDING the
  * isCurrent fast path — an unlocked fast path could register+scan the
  * dir while another JVM's rebuild (after a source regeneration)
  * deletes it mid-read. FileChannel.lock throws
  * OverlappingFileLockException when two threads of the SAME JVM race
  * the same file, so in-JVM callers are first serialized on a
  * per-table interned monitor. */
object BucketedStore {

  private val bucketLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Table-name suffix namespacing by dataset dir — same interleaved-run
    * invariant as Tables.tmp (a Bench at sf0.1 must never clobber a
    * Verify's sf0.01 bucketed tables mid-join). */
  def suffixOf(d: String): String = d.replaceAll("[^A-Za-z0-9]", "_")

  /** The canonical shared bucketed-orders table — ONE (defn, projection)
    * owned here so every consumer (sink-bucketed-join in RelScale,
    * sink-bucket-prune in RelMore220, any future SMB op) reuses the same
    * fingerprint. When the tuple was duplicated at the call sites, a
    * drift in either copy made alternating runs of the two ops rebuild
    * the table every time (fingerprint ping-pong) instead of reusing it;
    * hoisting makes the coupling structural. */
  def sharedOrders(s: SparkSession, d: String): DataFrame =
    ensure(s, d, s"graft_bucketed_orders_${suffixOf(d)}",
      "o_orderkey", "orders", "v3:o_orderkey,o_orderstatus:bucket8:1fpb")(
      Tables.orders(s, d).selectExpr("o_orderkey", "o_orderstatus"))

  /** The canonical shared bucketed-lineitem table (sink-bucketed-join's
    * probe side) — same single-owner discipline as [[sharedOrders]]. */
  def sharedLineitem(s: SparkSession, d: String): DataFrame =
    ensure(s, d, s"graft_bucketed_lineitem_${suffixOf(d)}",
      "l_orderkey", "lineitem", "v3:l_orderkey,l_extendedprice:bucket8:1fpb")(
      Tables.lineitem(s, d).selectExpr("l_orderkey", "l_extendedprice"))

  /** Ensure `table` exists as an 8-bucket parquet table CLUSTERED+SORTED
    * by `key`, built from `df` (lazily evaluated — not touched when the
    * stored files are current), fingerprinted against `$d/$srcName
    * .parquet` and the caller's `defn` string. Returns the catalog
    * table, whose scan reports hashpartitioning(key, 8) — the join side
    * that never shuffles. */
  def ensure(s: SparkSession, d: String, table: String, key: String,
             srcName: String, defn: String)(df: => DataFrame): DataFrame = {
    s.conf.set("spark.sql.sources.bucketing.enabled", "true")
    val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    def fingerprint: String = {
      val p = java.nio.file.Paths.get(s"$d/$srcName.parquet")
      // nanosecond mtime (not File.lastModified's ms) so a same-size
      // regeneration within a millisecond still changes the fingerprint.
      // A missing source yields a sentinel that never matches a stored
      // marker: the forced rebuild then fails with the informative
      // source-read error instead of an opaque NoSuchFileException here.
      try {
        val mtime = java.nio.file.Files.getLastModifiedTime(p)
          .to(java.util.concurrent.TimeUnit.NANOSECONDS)
        s"$srcName:${java.nio.file.Files.size(p)}:$mtime:$defn"
      } catch { case _: java.io.IOException => s"$srcName:<missing $p>:$defn" }
    }
    val dir = new java.io.File(wh, table)
    val marker = new java.io.File(dir, "_graft_input_fingerprint")
    def isCurrent = marker.exists() &&
      new String(java.nio.file.Files.readAllBytes(marker.toPath)) == fingerprint
    def register(): Unit = if (!s.catalog.tableExists(table)) {
      val schema = s.read.parquet(dir.getAbsolutePath).schema.toDDL
      s.sql(s"CREATE TABLE $table ($schema) USING PARQUET " +
        s"CLUSTERED BY ($key) SORTED BY ($key) INTO 8 BUCKETS " +
        s"LOCATION '${dir.getAbsolutePath}'")
    }
    val lockPath = java.nio.file.Paths.get(wh, s".$table.lock")
    java.nio.file.Files.createDirectories(lockPath.getParent)
    bucketLocks.computeIfAbsent(table, _ => new Object).synchronized {
      val ch = java.nio.channels.FileChannel.open(lockPath,
        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.WRITE)
      val lock = ch.lock()
      try {
        // re-check under the lock: the second writer of a cross-JVM race
        // sees the first's marker and becomes a metadata-only register
        if (!isCurrent) {
          s.sql(s"DROP TABLE IF EXISTS $table")
          // a fresh session's catalog doesn't know the table, so DROP alone
          // leaves the old warehouse dir behind → LOCATION_ALREADY_EXISTS
          org.apache.commons.io.FileUtils.deleteQuietly(dir)
          // one file per bucket: pre-partition the write into 8 tasks on
          // the bucket key (bucketBy and repartition share Murmur3 hash
          // partitioning, so each task holds exactly one bucket). With
          // >1 file per bucket Spark drops the sorted-scan property and
          // re-Sorts before every SMB join; with exactly one it doesn't.
          df.repartition(8, org.apache.spark.sql.functions.col(key))
            .write.bucketBy(8, key).sortBy(key)
            .mode(SaveMode.Overwrite).format("parquet").saveAsTable(table)
          // atomic publish: a crash mid-write must not leave a marker
          // that validates a half-written fingerprint
          val tmpMarker = java.nio.file.Paths.get(dir.getAbsolutePath, "_graft_fp.tmp")
          java.nio.file.Files.writeString(tmpMarker, fingerprint)
          java.nio.file.Files.move(tmpMarker, marker.toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
        register()
      } finally { lock.release(); ch.close() }
    }
    s.table(table)
  }
}
