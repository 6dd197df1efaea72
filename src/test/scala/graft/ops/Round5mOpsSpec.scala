package graft.ops

import graft.olist.SparkTestBase

/** Round-5 batch M: directed SCC, reciprocal-rank fusion, Mann-Kendall. */
class Round5mOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("graph-scc: components partition the node set and scc_id is the min member") {
    val rows = run("graph-scc").collect()
    assert(rows.nonEmpty)
    val members = rows.map(r => (r.getInt(0), r.getLong(1), r.getString(2).split(",").toSeq))
    members.foreach { case (id, size, ms) =>
      assert(ms.length == size, s"size must equal member count for scc $id")
      assert(ms.map(_.toInt).min == id, s"scc_id must be the minimum member, got $id vs $ms")
    }
    val all = members.flatMap(_._3)
    assert(all.distinct.length == all.length, "each node belongs to exactly one SCC")
    // the dominance tournament is antisymmetric: a 2-cycle is impossible,
    // so any SCC of size >= 2 must have size >= 3
    members.foreach { case (id, size, _) =>
      assert(size == 1 || size >= 3, s"tournament SCC of size 2 is impossible, scc $id")
    }
  }

  test("ann-rrf-fusion: 5 fused results per query, integer RRF mass consistent with ranks") {
    val rows = run("ann-rrf-fusion").collect()
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to 5L), s"query $q must fuse exactly top-5")
      val mass = sorted.map(_.getLong(3))
      assert(mass.zip(mass.tail).forall { case (a, b) => a >= b }, s"RRF mass non-increasing for $q")
      sorted.foreach { r =>
        val (rc, rd) = (r.getLong(4), r.getLong(5))
        assert(rc >= 0 && rc <= 10 && rd >= 0 && rd <= 10)
        assert(rc > 0 || rd > 0, "a fused doc must appear in at least one retriever's top-10")
        val expect = (if (rc > 0) 1000000L / (60 + rc) else 0L) + (if (rd > 0) 1000000L / (60 + rd) else 0L)
        assert(r.getLong(3) == expect, s"rrf_micro must be the exact integer sum for $q/${r.getLong(2)}")
      }
    }
  }

  test("dq-trend-mk: S bounded by pair count, variance positive, verdict matches Z") {
    val rows = run("dq-trend-mk").collect()
    assert(rows.length == 5, "one Mann-Kendall verdict per region")
    rows.foreach { r =>
      val (n, s, v18, z) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n >= 3, "needs a real series")
      assert(math.abs(s) <= n * (n - 1) / 2, "S is a sum of +-1 over month pairs")
      assert(v18 > 0, "tie correction cannot zero the variance on a real series")
      val expected = if (z >= 1960) "up" else if (z <= -1960) "down" else "flat"
      assert(r.getString(5) == expected)
      if (s == 0) assert(z == 0) else assert(s > 0 == z >= 0, "Z keeps the sign of S")
    }
  }
}
