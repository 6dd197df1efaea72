package graft.functions

import org.apache.spark.sql.execution.LogicalRDD
import graft.olist.SparkTestBase

/** The scaladoc promise that [[IterativeFixpoint.eager]]'s
  * localCheckpoint becomes a reliable checkpoint on a real cluster
  * (r10 verdict item 5) — proven, not asserted: the same graft graph
  * op runs on both snapshot paths, results are identical, lineage is
  * truncated, and the reliable path actually writes checkpoint files
  * to the configured dir. */
class ReliableCheckpointSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("eager under reliable checkpoints: same results, truncated lineage, files on disk") {
    val dir = java.nio.file.Files.createTempDirectory("graft-reliable-ckpt").toFile
    try {
      // baseline: the default executor-local path
      val local = graft.SparkEntry.queries("graph-kcore")(spark, sf)
        .collect().map(_.toSeq).toSeq
      spark.catalog.clearCache()

      spark.sparkContext.setCheckpointDir(dir.getAbsolutePath)
      spark.conf.set("spark.graft.reliableCheckpoints", "true")
      val reliable =
        try graft.SparkEntry.queries("graph-kcore")(spark, sf)
          .collect().map(_.toSeq).toSeq
        finally {
          spark.conf.unset("spark.graft.reliableCheckpoints")
          spark.catalog.clearCache()
        }
      assert(reliable == local,
        "reliable-checkpoint run must be bit-identical to the local run")

      // the reliable path must have produced real checkpoint files
      val files = org.apache.commons.io.FileUtils.listFiles(dir, null, true)
      assert(!files.isEmpty, "no checkpoint files written under the reliable dir")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("snap() truncates lineage to a LogicalRDD leaf on both paths") {
    import spark.implicits._
    val base = (1 to 100).map(i => (i.toLong, (i % 7).toLong)).toDF("id", "g")
    def roundsOf(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      IterativeFixpoint.eager(df, 2) { (st, _) =>
        st.groupBy("g").count().select($"g".as("id"), $"count".as("g"))
      }
    val localOut = roundsOf(base)
    assert(localOut.queryExecution.logical.isInstanceOf[LogicalRDD])

    val dir = java.nio.file.Files.createTempDirectory("graft-reliable-ckpt2").toFile
    try {
      spark.sparkContext.setCheckpointDir(dir.getAbsolutePath)
      spark.conf.set("spark.graft.reliableCheckpoints", "true")
      val relOut =
        try roundsOf(base)
        finally spark.conf.unset("spark.graft.reliableCheckpoints")
      assert(relOut.queryExecution.logical.isInstanceOf[LogicalRDD])
      assert(relOut.collect().map(_.toSeq).sortBy(_.toString).toSeq ==
        localOut.collect().map(_.toSeq).sortBy(_.toString).toSeq)
      // and the reliable leaf must be backed by a checkpointed RDD
      val rdd = relOut.queryExecution.logical.asInstanceOf[LogicalRDD].rdd
      assert(rdd.isCheckpointed,
        "reliable path must return an RDD with a materialized reliable checkpoint")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }
}
