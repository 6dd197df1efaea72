package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for batch AA (decay score, duplicate rate). */
class Round4agOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-decay-score: score bounded by n_events * 1e6, positive somewhere") {
    val got = run("agg-decay-score").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1) * 1000000L)
    }
    assert(got.exists(_.getLong(2) > 0))
  }

  test("dq-duplicate-rate: dup count consistent, rate matches identity") {
    val got = run("dq-duplicate-rate").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (n, dups, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(dups < n)
      assert(ppm == math.floor(dups * 1000000.0 / n).toLong)
    }
    val totalDocs = got.map(_.getLong(1)).sum
    assert(totalDocs == Tables.documents(spark, sf).count())
  }
}
