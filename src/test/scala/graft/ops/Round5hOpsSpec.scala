package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Round-5 batch H: mergeable top-k, IVF-dedup measured recall. */
class Round5hOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-topk-merge: sharded-then-merged top-10 equals the flat top-10, via bounded heaps") {
    val df = run("agg-topk-merge")
    val rows = df.collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getBoolean(5)), "merge closure must hold on every rank")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-k must run as a bounded heap, not a global-window sort:\n$plan")
  }

  test("dedup-ivf-recall: recall measured against the chance floor on an isotropic corpus") {
    val rows = run("dedup-ivf-recall").collect()
    assert(rows.length == 20)
    val found = rows.map(_.getInt(4)).sum
    assert(rows.forall(_.getLong(5) == found.toLong * 1000000L / 20L), "ppm = flag sum")
    assert(rows.forall(_.getLong(6) == 125000L), "chance floor = 1e6/8 cells")
    // the fixture's embeddings are isotropic (intra-label cosine ==
    // inter-label == ~0, measured), so IVF recall must sit NEAR the
    // 1/cells chance floor — the diagnostic verdict this op exists to
    // deliver. Far above would mean the join leaked non-bucket pairs;
    // 20/20 would mean a cartesian bug.
    assert(found <= 10, s"recall implausibly above chance on isotropic data: $found/20")
  }
}
