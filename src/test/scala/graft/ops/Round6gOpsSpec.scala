package graft.ops

import graft.olist.SparkTestBase

/** Round-6 batch G: modularity, dedup funnel, hash-width sizing. */
class Round6gOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("graph-modularity: real communities beat the null slicing") {
    val rows = run("graph-modularity").collect()
    val byName = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(byName.keySet == Set("hashmin4", "mod8"))
    byName.foreach { case (name, (nc, intra, expd, q)) =>
      assert(q == intra - expd, s"$name modularity must be the exact difference")
      assert(nc > 0 && intra >= 0 && intra <= 1000000L)
    }
    assert(byName("hashmin4")._4 > byName("mod8")._4,
      "hashmin communities must score higher modularity than node%8")
    assert(byName("hashmin4")._4 > 0, "real structure has positive modularity")
  }

  test("dedup-pipeline-funnel: stages chain — out of stage N is in of stage N+1") {
    val rows = run("dedup-pipeline-funnel").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows.map(_.getString(1)).toSeq ==
      Seq("length_floor", "exact_md5", "near_dup_minhash"))
    rows.foreach { r =>
      assert(r.getLong(2) - r.getLong(3) == r.getLong(4), "in - removed = out")
      assert(r.getLong(3) >= 0)
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(4) == b.getLong(2), "funnel stages must chain")
    }
  }

  test("dq-hash-width: collisions vanish as width grows; observed tracks the birthday bound") {
    val rows = run("dq-hash-width").collect()
    assert(rows.map(_.getLong(0)).toSeq == (4L to 8L))
    val nKeys = rows.head.getLong(2)
    rows.foreach { r =>
      assert(r.getLong(2) == nKeys, "every width hashes the same key set")
      assert(r.getLong(3) + r.getLong(5) >= r.getLong(3), "sanity")
      assert(r.getLong(3) <= nKeys)
    }
    val observed = rows.map(_.getLong(5))
    assert(observed.zip(observed.tail).forall { case (a, b) => a >= b },
      "longer prefixes cannot collide more")
    assert(observed.last == 0 || rows.last.getLong(6) >= 0,
      "widest prefix should be collision-free at fixture scale")
  }
}
