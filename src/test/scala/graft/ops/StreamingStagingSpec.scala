package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Staging-staleness regression: the streaming ops copy the dataset's
  * events.parquet into a monitored source directory. The copy must
  * track the source — an exists() guard would keep replaying the first
  * staged copy forever after the dataset at the same path is
  * regenerated.
  */
class StreamingStagingSpec extends SparkTestBase {

  /** Write rows as a single events.parquet FILE at dir/events.parquet
    * (the testdata layout the streaming ops stage from). */
  private def writeEvents(dir: String, rows: Seq[(Long, Long, String, Double)]): Unit = {
    import spark.implicits._
    val stage = tempDir("stream-stale-stage")
    rows.toDF("event_id", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(dir, "events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  test("regenerated events.parquet at the same path is re-staged, not served stale") {
    val dir = tempDir("stream-stale-ds")
    writeEvents(dir, Seq((1L, 10L, "click", 1.0), (2L, 10L, "click", 2.0),
      (3L, 11L, "view", 3.0)))
    val first = StreamingOps.streamAggCounts(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(first == Map("click" -> 2L, "view" -> 1L))

    // regenerate the dataset in place — different content, same path
    writeEvents(dir, Seq((4L, 12L, "view", 4.0), (5L, 12L, "view", 5.0),
      (6L, 13L, "view", 6.0), (7L, 13L, "purchase", 7.0)))
    val second = StreamingOps.streamAggCounts(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(second == Map("view" -> 3L, "purchase" -> 1L),
      s"stale staged copy served: $second")
  }
}
