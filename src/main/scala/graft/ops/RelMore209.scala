package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import Tables._

/** Driver-round-10 batch C: streaming observability — the
  * StreamingQueryProgress surface that operates a 100 TB backfill. */
object RelMore209 {

  /** stream-progress-metrics — per-micro-batch progress accounting
    * from `query.recentProgress`: numInputRows summed across batches
    * must equal the rows the sink aggregated, and `maxFilesPerTrigger`
    * must actually bound each batch (multiple data batches under
    * AvailableNow). This is the observability contract a production
    * stream runs on: progress rows/sec and batch sizes feed lag
    * alerts and autoscaling, and bounded-batch AvailableNow is how a
    * 100 TB backlog drains in controlled chunks (unbounded, the first
    * micro-batch would try to swallow the full backlog and OOM the
    * state store). The staged source is written as 6 files with
    * maxFilesPerTrigger=2, so the run provably splits into ≥2 data
    * batches at any scale factor. Oracle pins the row count from the
    * batch table and both contracts as 1. */
  val streamProgressMetrics: Q = (s, d) => {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val srcDir = new java.io.File(Tables.tmp("progress-src", d))
    s.read.parquet(s"$d/events.parquet").select(col("event_id"), col("event_type"))
      .repartition(6).write.mode("overwrite").parquet(srcDir.getAbsolutePath)
    val schema = s.read.parquet(srcDir.getAbsolutePath).schema
    val name = "stream_progress_metrics"
    s.streams.active.filter(q => Option(q.name).contains(name)).foreach(_.stop())
    val ckpt = Tables.tmp(s"ckpt-$name", d)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    val q = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "2")
      .parquet(srcDir.getAbsolutePath)
      .groupBy().agg(count(lit(1)).as("n_rows"))
      .writeStream.format("memory").queryName(name).outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val progress = q.recentProgress
    val inputRows = progress.map(_.numInputRows).sum
    val dataBatches = progress.count(_.numInputRows > 0)
    val tableRows = s.table(name).collect().head.getLong(0)
    s.range(1).select(
      lit(tableRows).as("n_rows"),
      lit(if (inputRows == tableRows) 1 else 0).as("progress_rows_match"),
      lit(if (dataBatches >= 2) 1 else 0).as("multi_batch"))
  }

  val streamProgressMetricsSql: String =
    """SELECT count(*) AS n_rows,
      |       CAST(1 AS INT) AS progress_rows_match,
      |       CAST(1 AS INT) AS multi_batch
      |FROM events""".stripMargin

  val queries: Map[String, Q] = Map(
    "stream-progress-metrics" -> streamProgressMetrics)

  val oracles: Map[String, String] = Map(
    "stream-progress-metrics" -> streamProgressMetricsSql)
}
