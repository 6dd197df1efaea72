package graft.plans

import graft.olist.SparkTestBase

/** Central plan-shape contracts: the physical-plan properties
  * SCALING.md claims for the engine's headline shapes, asserted so a
  * regression (a dropped broadcast hint, a pruning-defeating select,
  * a PrefixScan reverted to a global window) fails the suite instead
  * of silently shipping. Complements the per-feature specs
  * (TopKPerKeySpec, DotProductRewriteSpec, AqeOpsSpec) with the
  * engine-wide basics. */
class PlanContractsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def planOf(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("limit-topk: ORDER BY+LIMIT plans as TakeOrderedAndProject, no global sort") {
    val p = planOf("limit-topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("agg-topk: column pruning reaches the lineitem scan") {
    val p = planOf("agg-topk")
    val scan = p.linesIterator.find(l =>
      l.contains("FileScan parquet") && l.contains("lineitem")).getOrElse(fail(p))
    val readSchema = scan.split("ReadSchema: ").last
    // 4 of lineitem's 11+ columns: the two grouping keys + price + discount
    val nCols = readSchema.count(_ == ':')
    assert(nCols <= 4, s"expected <=4 read columns, got $nCols: $readSchema")
  }

  test("join-left-translate: dim-sized side broadcasts") {
    val p = planOf("join-left-translate")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("agg-bradford-zones: PrefixScan leaves no WindowExec in the plan") {
    val df = graft.SparkEntry.queries("agg-bradford-zones")(spark, sf)
    val wins = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.isEmpty,
      "the supplier-frame prefix sum must run through PrefixScan, not a window")
  }

  test("win-topk-per-key: the custom TopKPerKey physical operator is planned") {
    val p = planOf("win-topk-per-key")
    assert(p.contains("TopKPerKey"), p)
  }

  test("filt-range: predicate pushdown reaches the scan") {
    val p = planOf("filt-range")
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"), p)
  }

  test("sink-bucketed-join benchmark pair: SMB join is exchange-free, raw twin is not") {
    import org.apache.spark.sql.functions._
    import graft.ops.Tables._
    // bucketed side: building the op runs ensureBucketed, then joins the
    // bucketed tables with a merge hint. The join keys must arrive
    // pre-partitioned AND pre-sorted: no Exchange on either input.
    val p = planOf("sink-bucketed-join")
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
      !p.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join must not shuffle its inputs:\n$p")
    assert(p.contains("Bucketed: true"), p)

    // raw twin: the same merge join over the plain parquet MUST shuffle
    // both sides — this is the exchange the bucketing pays once to
    // delete from every subsequent join ("bucket once, join forever")
    val raw = lineitem(spark, sf).select(col("l_orderkey"), col("l_extendedprice"))
      .hint("merge")
      .join(orders(spark, sf).select(col("o_orderkey"), col("o_orderstatus")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    val rawPlan = raw.queryExecution.executedPlan.toString
    assert(rawPlan.contains("Exchange hashpartitioning(l_orderkey") &&
      rawPlan.contains("Exchange hashpartitioning(o_orderkey"),
      s"raw merge join should shuffle both inputs:\n$rawPlan")
  }
}
