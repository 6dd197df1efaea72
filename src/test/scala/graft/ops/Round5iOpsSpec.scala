package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Round-5 batch I: bitmap audience overlap. */
class Round5iOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("agg-bitmap-intersect: inclusion-exclusion over bitmap shards equals exact overlap") {
    val rows = graft.SparkEntry.queries("agg-bitmap-intersect")(spark, sf).collect()
    assert(rows.length == 10, "5 event types -> 10 unordered pairs")
    // recompute one pair exactly from facts
    val ev = Tables.events(spark, sf).select("event_type", "user_id").distinct()
    val clicks = ev.filter(col("event_type") === "click").select("user_id")
    val views = ev.filter(col("event_type") === "view").select("user_id")
    val exact = clicks.intersect(views).count()
    val row = rows.find(r => r.getString(0) == "click" && r.getString(1) == "view").get
    assert(row.getLong(4) == exact, s"bitmap overlap ${row.getLong(4)} != exact $exact")
    rows.foreach { r =>
      assert(r.getLong(4) <= math.min(r.getLong(2), r.getLong(3)),
        "overlap bounded by the smaller audience")
      assert(r.getLong(5) >= 0 && r.getLong(5) <= 1000000L)
    }
  }
}
