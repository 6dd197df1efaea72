package graft.ops

import graft.olist.SparkTestBase

/** Round-6 batch K: MRL curve, vacuum, commit fence. */
class Round6kOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("emb-mrl-curve-clustered: recall rises with prefix width, anchored at 1.0 for full dims") {
    val rows = run("emb-mrl-curve-clustered").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 4L, 8L))
    val recalls = rows.map(_.getLong(2))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"wider prefixes cannot retrieve worse, got ${recalls.toSeq}")
    assert(recalls.last == 1000000L, "full-vs-full is exact by construction")
    rows.foreach(r => assert(r.getLong(2) == r.getLong(1) * 1000000L / 30))
  }

  test("sink-vacuum-expire: only unreferenced sets eligible, HEAD identical across vacuum") {
    val rows = run("sink-vacuum-expire").collect()
    val byName = rows.map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byName == Map(
      "compact-001" -> "LIVE", "delta-001" -> "EXPIRED_VACUUM",
      "delta-002" -> "EXPIRED_VACUUM", "orphan-tmp" -> "ORPHAN_VACUUM"))
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(4),
        "vacuum must not change what HEAD serves (before == after)")
    }
    val live = rows.find(_.getString(1) == "LIVE").get
    val expired = rows.filter(_.getString(1) == "EXPIRED_VACUUM").map(_.getLong(2)).sum
    assert(live.getLong(2) == expired,
      "the compacted set carries exactly the expired deltas' rows")
  }

  test("sink-commit-fence: conflicting CAS aborts, rebase lands, no delta lost") {
    val rows = run("sink-commit-fence").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(rows.toSeq == Seq(
      ("w1", 1L, "v0", "COMMITTED_v1", rows.head._5),
      ("w2", 1L, "v0", "CONFLICT", rows.head._5),
      ("w2", 2L, "v1", "COMMITTED_v2", rows.head._5)))
    val o = graft.ops.Tables.orders(spark, sf)
    val expect = o.filter(o("o_orderkey") % 4 === 0).count() +
      o.filter(o("o_orderkey") % 4 === 1).count()
    assert(rows.head._5 == expect, "final table carries both writers' deltas")
  }
}
