package graft.ops

import graft.olist.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import Tables._

/** The "measured" half of the RelMore205 AQE family: each op's graded
  * oracle proves RESULT invariance; these tests prove the adaptive
  * behavior actually FIRED, by rebuilding each op's join/agg shape
  * under the same scoped confs and inspecting the executed adaptive
  * plan. Without this, "AQE rescues the skew" would be an assumption,
  * not a measurement. */
class AqeOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.01"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  /** Final (post-execution) adaptive plan string: materialize, then
    * read the AdaptiveSparkPlanExec's current physical plan. */
  private def executedPlanString(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  test("join-aqe-skew-rescue: result matches plain join, skew split fired") {
    // result invariance vs the plain (default-conf) join
    val got = run("join-aqe-skew-rescue").collect().map(_.toSeq)
    val plain = events(spark, sf).select(
        when(col("user_id") % 10 < 8, 1L).otherwise(col("user_id")).as("k"),
        col("value"))
      .join(customer(spark, sf)
        .select(col("c_custkey").as("k"), col("c_mktsegment").as("segment")), Seq("k"))
      .groupBy("segment")
      .agg(count(lit(1)).as("n_events"),
        outNum(sum(dec2(col("value")))).as("total_value"))
      .orderBy("segment").collect().map(_.toSeq)
    assert(got.toSeq == plain.toSeq)

    // plan evidence: the op's OWN frame under the op's OWN confs
    // (RelMore205.skewRescueConfs/skewRescueFrame — shared vals, so op
    // and evidence cannot drift) must show the skew-split marker on the
    // shuffle join after execution
    val planStr = withConfs(spark, RelMore205.skewRescueConfs: _*) {
      executedPlanString(RelMore205.skewRescueFrame(spark, sf))
    }
    assert(planStr.contains("skew=true"),
      s"expected a skew-split shuffle join in the executed plan:\n$planStr")
  }

  test("join-aqe-runtime-broadcast: SMJ demoted to broadcast at runtime") {
    val rows = run("join-aqe-runtime-broadcast").collect()
    assert(rows.nonEmpty)

    val planStr = withConfs(spark, RelMore205.runtimeBroadcastConfs: _*) {
      executedPlanString(RelMore205.runtimeBroadcastFrame(spark, sf))
    }
    assert(planStr.contains("BroadcastHashJoin"),
      s"expected runtime broadcast demotion in the executed plan:\n$planStr")
    // and the static plan really was NOT a broadcast (the demotion
    // happened at runtime, it wasn't the planner's first choice):
    // same shared frame, with the adaptive threshold also disabled
    val staticStr = withConfs(spark,
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      executedPlanString(RelMore205.runtimeBroadcastFrame(spark, sf))
    }
    assert(!staticStr.contains("BroadcastHashJoin"),
      "with the adaptive threshold also off, the join must stay a shuffle join")
  }

  test("agg-aqe-coalesce-partitions: 32 shuffle partitions coalesced") {
    val rows = run("agg-aqe-coalesce-partitions").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[String]("event_type")).distinct.length == rows.length)

    val planStr = withConfs(spark, RelMore205.coalescePartitionsConfs: _*) {
      executedPlanString(RelMore205.coalescePartitionsFrame(spark, sf))
    }
    assert(planStr.contains("coalesced"),
      s"expected a coalesced AQEShuffleRead in the executed plan:\n$planStr")
  }

  test("join-runtime-bloom-filter: the optimizer injects the bloom probe") {
    val rows = run("join-runtime-bloom-filter").collect()
    assert(rows.nonEmpty)

    val planStr = withConfs(spark, RelMore205.runtimeBloomConfs: _*) {
      executedPlanString(RelMore205.runtimeBloomFrame(spark, sf))
    }
    assert(planStr.contains("might_contain") || planStr.contains("bloom"),
      s"expected an injected runtime bloom filter in the executed plan:\n$planStr")
  }

  test("sink-rebalance-write: hot partition written as multiple advisory-sized files") {
    val rows = run("sink-rebalance-write").collect()
    assert(rows.map(_.getAs[String]("bucket")).toSeq == Seq("cold", "hot"))
    val hot = rows.find(_.getAs[String]("bucket") == "hot").get
    val cold = rows.find(_.getAs[String]("bucket") == "cold").get
    // the 80/20 split itself
    assert(hot.getAs[Long]("n_events") > 3 * cold.getAs[Long]("n_events"))
    // file-layout evidence: the skewed rebalance split must have spread
    // the hot directory across multiple writer tasks / files, while the
    // small cold directory stays compact
    val out = new java.io.File(Tables.tmp("rebalance-write", sf))
    def parquetFiles(sub: String) = {
      val dir = new java.io.File(out, sub)
      assert(dir.isDirectory, s"$dir missing")
      dir.listFiles().count(f => f.getName.endsWith(".parquet"))
    }
    assert(parquetFiles("bucket=hot") > 1,
      "the 80%-hot partition should be split across multiple files by " +
        "OptimizeSkewInRebalancePartitions")
    assert(parquetFiles("bucket=cold") >= 1)
  }
}
