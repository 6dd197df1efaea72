package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import graft.olist.SparkTestBase

/** Contract test for the events.ts parquet-encoding dispatch
  * (Tables.normalizeEventTs / Tables.eventsTsNanos). The driver's
  * fixture has shipped the same logical column as INT64
  * TIMESTAMP(NANOS) (read as LongType under the nanosAsLong legacy
  * conf) and as timestamp[us] (read as TimestampNTZ) — round 6 lost 59
  * event-time queries to a reader that hard-coded the former. This
  * spec writes the SAME logical rows in both encodings and asserts the
  * two readers yield bit-identical frames, so an encoding drift can
  * never again land silently. */
class EventsEncodingSpec extends SparkTestBase {

  // micros chosen so the nanos form exercises the sub-µs floor:
  // +999 / +1 nanos must truncate back to the same micro
  private val microsVals = Seq(
    1704067200000000L, // 2024-01-01 00:00:00
    1704067200123456L, // sub-second micros
    1706745599999999L) // end-of-month boundary

  private def writeBoth(dir: String): (String, String) = {
    val nanosDir = s"$dir/nanos"
    val microsDir = s"$dir/micros"
    val rows = microsVals.zipWithIndex.map { case (us, i) =>
      Row(i.toLong, us * 1000L + (if (i % 2 == 0) 999L else 1L))
    }
    // legacy encoding stand-in: ts as a plain int64 of epoch nanos
    // (Spark cannot WRITE TIMESTAMP(NANOS) parquet; reading the real
    // fixture under nanosAsLong also yields LongType, so LongType in →
    // LongType out is the faithful reproduction of that path)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("event_id", LongType), StructField("ts", LongType)))
    ).write.mode("overwrite").parquet(nanosDir)
    // current encoding: timestamp[us] without timezone (TimestampNTZ),
    // exactly what pyarrow's timestamp[us] becomes under Spark's reader
    spark.createDataFrame(
      spark.sparkContext.parallelize(microsVals.zipWithIndex.map { case (us, i) =>
        Row(i.toLong, java.time.LocalDateTime.ofEpochSecond(
          us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC))
      }, 1),
      StructType(Seq(StructField("event_id", LongType), StructField("ts", TimestampNTZType)))
    ).write.mode("overwrite").parquet(microsDir)
    (nanosDir, microsDir)
  }

  test("normalizeEventTs yields identical TimestampType frames for both encodings") {
    val (nanosDir, microsDir) = writeBoth(tempDir("events-enc"))
    val a = Tables.normalizeEventTs(spark.read.parquet(nanosDir)).orderBy("event_id")
    val b = Tables.normalizeEventTs(spark.read.parquet(microsDir)).orderBy("event_id")
    assert(a.schema("ts").dataType == TimestampType)
    assert(b.schema("ts").dataType == TimestampType)
    assert(a.collect().toSeq == b.collect().toSeq)
    // and the values are the expected micros, not something 1000× off
    val got = a.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq
    assert(got == microsVals)
  }

  test("nanos-long normalization path yields identical long-nanos frames modulo sub-µs truncation") {
    val (nanosDir, microsDir) = writeBoth(tempDir("events-enc-nanos"))
    // reproduce eventsTsNanos' dispatch on both frames (it reads from a
    // fixed table name, so exercise the same per-dtype logic inline)
    def toNanos(df: org.apache.spark.sql.DataFrame) = df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", col("ts") - pmod(col("ts"), lit(1000L)))
      case _: TimestampNTZType =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case TimestampType => df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case other => fail(s"unexpected dtype $other")
    }
    val a = toNanos(spark.read.parquet(nanosDir)).orderBy("event_id")
    val b = toNanos(spark.read.parquet(microsDir)).orderBy("event_id")
    assert(a.collect().toSeq == b.collect().toSeq)
  }

  test("unaudited ts encoding fails loudly instead of computing garbage") {
    val dir = tempDir("events-enc-bad")
    spark.range(3).selectExpr("id AS event_id", "CAST(id AS STRING) AS ts")
      .write.mode("overwrite").parquet(dir)
    val e = intercept[IllegalStateException] {
      Tables.normalizeEventTs(spark.read.parquet(dir))
    }
    assert(e.getMessage.contains("unaudited"))
  }
}
