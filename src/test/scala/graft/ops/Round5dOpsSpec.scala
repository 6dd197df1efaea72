package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Round-5 batch D: composed IVFADC retrieval, BPE tokenizer
  * application, row-hash table diff.
  */
class Round5dOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("ann-ivf-adc: 5 neighbors per query from at most nprobe cells, rerank order exact") {
    val df = run("ann-ivf-adc")
    val rows = df.collect()
    assert(rows.length == 50, s"10 queries x 5 ranks, got ${rows.length}")
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to 5), s"query $q ranks")
      assert(rs.map(_.getLong(3)).distinct.length <= 2,
        s"query $q neighbors must come from its nprobe=2 probed cells")
      val eds = rs.sortBy(_.getInt(1)).map(_.getLong(5))
      assert(eds.zip(eds.tail).forall { case (a, b) => a <= b },
        s"query $q exact distance nondecreasing in rank")
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "probe table and LUT must broadcast")
  }

  test("text-tokenizer-apply: merged multi-char subwords surface in the top-20 vocabulary") {
    val rows = run("text-tokenizer-apply").collect()
    assert(rows.length == 20)
    val freqs = rows.map(_.getLong(1))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b }, "ordered by freq desc")
    assert(rows.exists(_.getString(0).length > 1),
      "after 3 merges at least one multi-char token must carry top-20 mass")
  }

  test("dq-table-diff: per-status counts equal the injected mutation counts") {
    val rows = run("dq-table-diff").collect()
    val byStatus = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus.keySet == Set("added", "changed", "deleted", "same"))
    val keys = Tables.orders(spark, sf).select(col("o_orderkey")).collect().map(_.getLong(0))
    val expDeleted = keys.count(_ % 101 == 0)
    val expAdded = keys.count(_ % 109 == 0)
    val expChanged = keys.count(k => k % 101 != 0 && k % 103 == 0)
    assert(byStatus("deleted") == expDeleted, s"deleted ${byStatus("deleted")} != $expDeleted")
    assert(byStatus("added") == expAdded, s"added ${byStatus("added")} != $expAdded")
    assert(byStatus("changed") == expChanged, s"changed ${byStatus("changed")} != $expChanged")
    assert(byStatus.values.sum == keys.length + expAdded, "statuses tile A∪B")
  }
}
