package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Round-5 batch J: PERCENTILE_CONT/DISC surface, payload chunking. */
class Round5jOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("sql-percentile-cont: disc is a real data point, cont brackets it") {
    val rows = run("sql-percentile-cont").collect()
    assert(rows.nonEmpty)
    val cents = Tables.orders(spark, sf)
      .select(col("o_orderstatus"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    rows.foreach { r =>
      val st = r.getString(0)
      assert(cents(st).contains(r.getLong(3)), s"$st: disc median must be an actual value")
      // cont median in half-cents sits within the group's value range
      val (mn, mx) = (cents(st).min, cents(st).max)
      assert(r.getLong(2) >= mn * 2 && r.getLong(2) <= mx * 2, s"$st: cont median out of range")
    }
  }

  test("mm-payload-chunking: every document reassembles intact from its chunks") {
    val rows = run("mm-payload-chunking").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(5) == 1, s"source ${r.getString(0)}: reassembly lost bytes")
      assert(r.getLong(4) == r.getLong(1), "every doc intact")
      assert(r.getLong(2) >= r.getLong(1), "at least one chunk per doc")
    }
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == nDocs, "chunking covers the whole corpus")
  }
}
