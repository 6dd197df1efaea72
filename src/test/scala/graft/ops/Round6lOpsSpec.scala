package graft.ops

import graft.olist.SparkTestBase

/** Round-6 batch L: hash walks, drill-across, langid confusion. */
class Round6lOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("graph-hash-walk: 5 complete walks alternating sides, rerun-identical") {
    val rows = run("graph-hash-walk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val bySeed = rows.groupBy(_._1)
    assert(bySeed.keySet == (1 to 5).map(i => s"s$i").toSet)
    bySeed.foreach { case (seed, steps) =>
      val sorted = steps.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0L to 4L), s"$seed walks all 4 steps")
      assert(sorted.head._3 == seed, "walk starts at its seed")
      sorted.foreach { case (_, t, node) =>
        val expectSide = if (t % 2 == 0) "s" else "p"
        assert(node.startsWith(expectSide),
          s"bipartite walk must alternate sides at step $t, got $node")
      }
    }
    val rerun = run("graph-hash-walk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(rows.toSeq == rerun.toSeq, "hash-driven walks are rerun-identical")
  }

  test("join-drill-across: conformed-grain merge, no fan-out double counting") {
    val rows = run("join-drill-across").collect()
    assert(rows.nonEmpty)
    val o = graft.ops.Tables.orders(spark, sf)
    val c = graft.ops.Tables.customer(spark, sf)
    val matchedOrders = o.join(c, o("o_custkey") === c("c_custkey")).count()
    assert(rows.map(_.getLong(1)).sum == matchedOrders,
      "drill-across must not fan out the revenue fact")
    assert(rows.exists(_.getLong(3) > 0), "the activity fact contributes somewhere")
    assert(rows.exists(r => r.getLong(1) > 0 && r.getLong(3) == 0),
      "a nation with revenue but no events keeps zeros, not a dropped row")
  }

  test("text-langid-confusion: rows partition the corpus, diagonal dominates where markers exist") {
    val rows = run("text-langid-confusion").collect()
    val totalDocs = graft.ops.Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == totalDocs, "cells partition the corpus")
    rows.groupBy(_.getString(0)).foreach { case (lang, cells) =>
      val support = cells.head.getLong(3)
      assert(cells.map(_.getLong(2)).sum == support, s"$lang support consistent")
      cells.foreach(c => assert(c.getLong(4) == c.getLong(2) * 1000000 / support))
    }
  }
}
