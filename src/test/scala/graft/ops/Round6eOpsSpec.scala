package graft.ops

import graft.olist.SparkTestBase

/** Round-6 batch E: k-center coreset, HITS, pipe syntax. */
class Round6eOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("sample-coreset-kcenter: greedy farthest-point invariants hold") {
    val rows = run("sample-coreset-kcenter").collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 8L), "exactly k=8 selections, ranked")
    val ids = rows.map(_.getLong(1))
    assert(ids.distinct.length == ids.length, "no vector selected twice")
    assert(ids.head == 0L, "deterministic seed is vec 0")
    val d = rows.map(_.getLong(2))
    assert(d.head == 0L, "seed has no distance")
    // greedy k-center's defining invariant: each new point's distance to
    // the selected set is non-increasing round over round
    assert(d.tail.zip(d.tail.tail).forall { case (a, b) => a >= b },
      s"farthest-point distances must be non-increasing, got ${d.toSeq}")
    assert(d.tail.forall(_ > 0), "every non-seed selection is strictly distant")
  }

  test("graph-hits: both roles ranked, normalization pins the top score to 1e6") {
    val rows = run("graph-hits").collect()
    val byRole = rows.groupBy(_.getString(0))
    assert(byRole.keySet == Set("authority", "hub"))
    byRole.foreach { case (role, rs) =>
      val sorted = rs.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(3)).toSeq == (1L to 10L), s"$role top-10 ranked")
      val scores = sorted.map(_.getLong(2))
      assert(scores.head == 1000000L, s"$role L-inf normalization pins rank 1 to 1e6")
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"$role scores non-increasing")
      assert(scores.forall(v => v > 0 && v <= 1000000L))
    }
  }

  test("sql-pipe-syntax: pipe plan equals the nested-SELECT plan's result") {
    val pipe = run("sql-pipe-syntax").collect()
    val nested = spark.sql(
      """SELECT o_orderpriority, count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders_pipe WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin).collect()
    assert(pipe.toSeq == nested.toSeq)
    assert(pipe.nonEmpty)
  }
}
