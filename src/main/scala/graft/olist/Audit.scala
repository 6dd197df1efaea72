package graft.olist

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.util.concurrent.atomic.AtomicLong

/** ETL run audit / lineage — the Spark re-expression of
  * `audit.ingestion_run` (`02_create_tables_bronze.sql:110-124`) and the
  * STARTED→SUCCESS/FAILED row lifecycle every reference SP performs
  * (e.g. `sp_load_silver_customers.sql:14-16,48-52,58-62`).
  *
  * Parquet is append-only, so the reference's in-place UPDATE of the run
  * row becomes an *event* row per state change keyed by run_id (SURVEY §7
  * hard part 4); `runSummary` reconciles latest status per run, which
  * preserves the queryable surface of the reference's load report
  * (`03_load_csv_to_bronze.sql:121-125`).
  */
class Audit(spark: SparkSession, warehouse: String) {

  private val path = s"$warehouse/audit/ingestion_run"
  private val counter = new AtomicLong(System.currentTimeMillis())

  private val schema = StructType(Seq(
    StructField("run_id", LongType),
    StructField("source_system", StringType),
    StructField("source_object", StringType),
    StructField("target_schema", StringType),
    StructField("target_table", StringType),
    StructField("status", StringType),
    StructField("rows_inserted", LongType),
    StructField("error_message", StringType),
    StructField("logged_at", TimestampType)))

  private def write(runId: Long, srcSys: String, srcObj: String, tgtSchema: String,
                    tgtTable: String, status: String, rows: Option[Long], err: Option[String]): Unit = {
    val row = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(
        runId, srcSys, srcObj, tgtSchema, tgtTable, status,
        rows.map(Long.box).orNull, err.orNull,
        new java.sql.Timestamp(System.currentTimeMillis()))),
      schema)
    row.write.mode(SaveMode.Append).parquet(path)
  }

  /** INSERT ... 'STARTED'; SCOPE_IDENTITY() → run id (`03:35-37`). */
  def started(srcSys: String, srcObj: String, tgtSchema: String, tgtTable: String): Long = {
    val runId = counter.incrementAndGet()
    write(runId, srcSys, srcObj, tgtSchema, tgtTable, "STARTED", None, None)
    runId
  }

  /** UPDATE ... status='SUCCESS', rows_inserted=@@ROWCOUNT (`03:56-61`). */
  def succeeded(runId: Long, srcSys: String, srcObj: String, tgtSchema: String,
                tgtTable: String, rows: Long): Unit =
    write(runId, srcSys, srcObj, tgtSchema, tgtTable, "SUCCESS", Some(rows), None)

  /** UPDATE ... status='FAILED', error_message=ERROR_MESSAGE() (`03:65-72`). */
  def failed(runId: Long, srcSys: String, srcObj: String, tgtSchema: String,
             tgtTable: String, err: String): Unit =
    write(runId, srcSys, srcObj, tgtSchema, tgtTable, "FAILED", Some(-1L), Some(err))

  /** Wrap a load with the STARTED → SUCCESS/FAILED lifecycle; rethrows on
    * failure (fail-fast contract, `05_sp_master_orchestrator_silver.sql:33-40`). */
  def withRun(srcSys: String, srcObj: String, tgtSchema: String, tgtTable: String)
             (load: => Long): Long = {
    val runId = started(srcSys, srcObj, tgtSchema, tgtTable)
    try {
      val rows = load
      succeeded(runId, srcSys, srcObj, tgtSchema, tgtTable, rows)
      rows
    } catch {
      case e: Throwable =>
        failed(runId, srcSys, srcObj, tgtSchema, tgtTable, e.getMessage)
        throw e
    }
  }

  /** Latest status per run — the reference's ordered load summary
    * (`03_load_csv_to_bronze.sql:121-125`). */
  def runSummary(): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // terminal states (SUCCESS/FAILED) outrank STARTED at the same
    // millisecond — a raw status sort would report an in-flight state as
    // latest when the start and finish events share a timestamp
    // (SUCCESS and FAILED are mutually exclusive per run, so ranking
    // terminal-vs-start is a total tiebreak)
    val terminalFirst = when(col("status") === "STARTED", 0).otherwise(1).desc
    val w = Window.partitionBy(col("run_id")).orderBy(col("logged_at").desc, terminalFirst)
    spark.read.schema(schema).parquet(path)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .orderBy(col("run_id").desc)
  }
}
