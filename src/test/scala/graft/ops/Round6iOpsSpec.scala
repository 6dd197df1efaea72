package graft.ops

import graft.olist.SparkTestBase

/** Round-6 batch I: collocations, kNN graph, role-playing dims. */
class Round6iOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("text-collocation-pmi: top-20 by exact lift, min support respected") {
    val rows = run("text-collocation-pmi").collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val lifts = rows.map(_.getLong(5))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b }, "ordered by lift desc")
    rows.foreach { r =>
      assert(r.getLong(2) >= 3, "min bigram support 3")
      assert(r.getLong(3) >= r.getLong(2) && r.getLong(4) >= r.getLong(2),
        "a bigram cannot outnumber its unigrams")
    }
  }

  test("ann-knn-graph: exactly k=3 out-edges per node, mutuality bounded") {
    val rows = run("ann-knn-graph").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nodes, edges, mutual, ppm) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(edges == nodes * 3, "every node has exactly 3 out-edges (buckets > k)")
      assert(mutual <= edges, "mutual edges are a subset")
      assert(mutual % 2 == 0, "reciprocated edges come in pairs")
      assert(ppm == mutual * 1000000 / edges)
    }
  }

  test("join-role-playing-dates: lags non-negative and items conserved") {
    val rows = run("join-role-playing-dates").collect()
    // conservation over the orders-matched fact set: the dim spans the
    // fixture's full 1995-2001 date range, so no fact may be dropped
    val li = graft.ops.Tables.lineitem(spark, sf)
    val o = graft.ops.Tables.orders(spark, sf)
    val matchedItems = li.join(o, li("l_orderkey") === o("o_orderkey")).count()
    assert(rows.map(_.getLong(2)).sum == matchedItems,
      "both role joins must resolve every orders-matched lineitem exactly once")
    // this synthetic fixture draws ship dates independently of order
    // dates, so lags are spread (and can be negative) — assert bounded
    rows.foreach { r =>
      assert(math.abs(r.getInt(1)) <= 7, "year lag bounded by the dim span")
    }
  }
}
