package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase
import graft.functions.PrefixScan

/** Round-5 batch A: the global-window family rewritten onto the
  * PrefixScan two-pass. Each test asserts BOTH the result (vs the
  * window-form reference computed inline) and the structural
  * invariant the rewrite exists for: no single-partition WindowExec
  * ("No Partition Defined") in the physical plan.
  */
class Round5aOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  /** Global windows surface in executed plans as a Window node whose
    * partition spec is empty. Spark prints them as
    * "Window [...], [ordercol ASC ...]" with no PARTITION BY list —
    * detect via the WindowExec nodes' partitionSpec directly. */
  private def globalWindowCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }.size

  test("PrefixScan.withRankCumSum matches row_number + running sum windows") {
    val base = Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
    val sc = PrefixScan.withRankCumSum(
      base, Seq(desc("cents"), col("o_orderkey")), Some("cents"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("cents"), col("o_orderkey"))
    val ref = base
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cum", sum("cents").over(
        w.rowsBetween(Long.MinValue, 0)))
    assert(sc.df.select("o_orderkey", "rn", "cum")
      .exceptAll(ref.select("o_orderkey", "rn", "cum")).count() == 0)
    assert(sc.n == base.count())
    assert(sc.total ==
      base.agg(sum("cents")).head().getLong(0))
  }

  test("PrefixScan.ntileFromRank matches ntile() for k around and above n") {
    val base = Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .limit(37)
    val sc = PrefixScan.withRankCumSum(
      base, Seq(col("cents"), col("o_orderkey")), None)
    for (k <- Seq(1, 4, 10, 36, 37, 50)) {
      val got = sc.df.select(col("o_orderkey"),
        PrefixScan.ntileFromRank(k, sc.n, col("rn")).as("b"))
      val ref = base.select(col("o_orderkey"),
        ntile(k).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("cents"), col("o_orderkey"))).as("b"))
      assert(got.exceptAll(ref).count() == 0, s"ntile k=$k mismatch")
    }
  }

  test("rewritten global-window ops carry no single-partition WindowExec at input cardinality") {
    // lorenz/decile keep a window over their ≤10-row decile AGGREGATE —
    // that's fine; what must be gone is the global window over the
    // input-cardinality frame. agg-decile-report's post-agg share
    // window and lorenz's cumulative windows run over 10 rows, so a
    // remaining global WindowExec is only legal if its child is the
    // decile aggregate. For the ops below no global window is legal
    // at all.
    for (name <- Seq("agg-rfm-segmentation", "agg-equidepth-histogram",
      "agg-gini", "agg-pareto-point", "mm-shard-pack", "agg-decay-score"))
      assert(globalWindowCount(run(name)) == 0, s"$name has a global window")
    // decile-report and lorenz: global windows allowed only over the
    // 10-row decile aggregate (child contains an Aggregate).
    for (name <- Seq("agg-decile-report", "agg-lorenz-curve")) {
      val plan = run(name).queryExecution.executedPlan
      val bad = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty &&
            !w.child.exists(_.isInstanceOf[
              org.apache.spark.sql.execution.aggregate.BaseAggregateExec]) => w
      }
      assert(bad.isEmpty, s"$name has a global window over a non-aggregate frame")
    }
  }

  test("agg-decile-approx: no window, no range exchange, buckets equi-depth") {
    val df = run("agg-decile-approx")
    val plan = df.queryExecution.executedPlan
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "approx bucketing must not sort")
    // the only range exchange allowed is the final ORDER BY over the
    // 10-row aggregate; the input frame itself must reach the
    // aggregate through the broadcast bucket join, unsorted
    assert(plan.toString.split("rangepartitioning").length <= 2,
      "approx bucketing must not range-exchange the input frame")
    assert(plan.toString.contains("BroadcastNestedLoopJoin"),
      "boundaries must be broadcast onto the frame")
    val rows = df.collect()
    assert(rows.length == 10)
    val n = rows.map(_.getLong(1)).sum
    // exact regime at this scale: every bucket within 1 of N/10
    assert(rows.forall(r => math.abs(r.getLong(1) - n / 10) <= 1))
    // buckets tile the value range in order
    val sorted = rows.sortBy(_.getInt(0))
    sorted.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) <= b.getLong(2), "bucket ranges must not overlap")
    }
  }

  test("agg-decay-score broadcasts the watermark instead of a global window") {
    val plan = run("agg-decay-score").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"))
    assert(!plan.contains("Window"))
  }
}
