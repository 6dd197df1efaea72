package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Round-5 batch C: bounded-frame EWMA, label-propagation communities,
  * SQL join hints, largest-remainder stratified allocation, iterative
  * BPE merges, nearest-event as-of join.
  */
class Round5cOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("win-ewma: first order per customer equals its own value; frames stay key-partitioned") {
    val df = run("win-ewma")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val firsts = rows.groupBy(_.getLong(0)).values.map(_.head)
    firsts.foreach { r =>
      assert(r.getLong(4) == r.getLong(3), s"first EWMA must equal the value itself: $r")
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      "EWMA windows must partition by customer, never globally")
  }

  test("graph-label-propagation: communities partition the sampled node set") {
    val rows = run("graph-label-propagation").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val sizes = rows.map(_.getLong(1))
    assert(sizes.zip(sizes.tail).forall { case (a, b) => a >= b }, "ordered by size desc")
    assert(sizes.forall(_ >= 1))
  }

  test("sql-hints: BROADCAST and MERGE hints are honored in the physical plan") {
    val df = run("sql-hints")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"BROADCAST(n) not honored:\n$plan")
    assert(plan.contains("SortMergeJoin"), s"MERGE(o) not honored:\n$plan")
    assert(df.count() > 0)
  }

  test("sample-weighted-alloc: quotas sum exactly to the budget and each stratum fills its quota") {
    val rows = run("sample-weighted-alloc").collect()
    assert(rows.length == 60, s"largest-remainder must hit the budget exactly, got ${rows.length}")
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      assert(rs.length == rs.head.getLong(1), s"stratum $src: ${rs.length} != quota ${rs.head.getLong(1)}")
    }
  }

  test("text-bpe-merge: three merges, merged token is the concatenation, counts non-increasing") {
    val rows = run("text-bpe-merge").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    rows.foreach { r =>
      assert(r.getString(3) == r.getString(1) + r.getString(2), s"merged must be l||r: $r")
    }
    val freqs = rows.map(_.getLong(4))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b },
      "each merge's pair count bounds the next round's max")
  }

  test("join-asof-nearest: every purchase appears once; gaps non-negative; one user-keyed shuffle") {
    val df = run("join-asof-nearest")
    val rows = df.collect()
    val nPurchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(rows.length == nPurchases)
    rows.foreach { r =>
      if (!r.isNullAt(3)) assert(r.getLong(3) >= 0, s"gap must be non-negative: $r")
      if (!r.isNullAt(4)) assert(Set("backward", "forward")(r.getString(4)))
    }
    // count only the AQE final plan — the echoed "Initial Plan" section
    // repeats every operator
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"nearest-asof must shuffle the union exactly once on the user key:\n$plan")
  }
}
