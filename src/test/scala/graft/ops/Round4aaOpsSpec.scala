package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for batch U (shard packing, FD audit, column
  * profile, HHI). */
class Round4aaOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("mm-shard-pack: shards partition the corpus, contiguous id ranges") {
    val got = run("mm-shard-pack").collect()
    assert(got.length > 1)
    val totalDocs = got.map(_.getLong(1)).sum
    assert(totalDocs == Tables.documents(spark, sf).count())
    // contiguous, non-overlapping id ranges in shard order
    got.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(4) < b.getLong(3))
      case _ =>
    }
    // every shard except the last crosses the 20k start boundary
    got.init.foreach(r => assert(r.getLong(2) >= 19000L))
  }

  test("dq-fd-check: true FDs report zero violations, false FD reports some") {
    val m = run("dq-fd-check").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(m("custkey->nationkey") == 0)
    assert(m("orderkey->custkey") == 0)
    assert(m("brand->type") > 0)
  }

  test("dq-profile-columns: key column near-unique, enum columns tiny domains") {
    val rows = run("dq-profile-columns").collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(rows("o_orderstatus")._1 <= 3)
    assert(rows("o_orderpriority")._1 <= 5)
    rows.values.foreach { case (_, nulls) => assert(nulls == 0) }
  }

  test("agg-hhi-concentration: HHI bounded by (1e6/n_brands, 1e6]") {
    run("agg-hhi-concentration").collect().foreach { r =>
      val (n, hhi) = (r.getLong(1), r.getLong(2))
      assert(hhi <= 1000000L)
      assert(hhi >= 1000000L / n - n) // floor losses bounded by n terms
    }
  }
}
