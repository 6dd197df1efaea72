package graft.ops

import graft.olist.SparkTestBase

/** Round-6 batch H: SCD2 as-of, write-audit-publish, fertility. */
class Round6hOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("join-scd2-asof: every order resolves exactly one dim version (conservation)") {
    val rows = run("join-scd2-asof").collect()
    val totalOrders = graft.ops.Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == totalOrders,
      "as-of join must neither drop nor duplicate facts")
    assert(rows.exists(_.getString(0) == "PREMIUM"),
      "post-change era must attribute orders to the new segment version")
    rows.foreach(r => assert(r.getLong(2) > 0, s"${r.getString(0)} revenue"))
  }

  test("sink-write-audit-publish: failing batch stays staged, only passing rows published") {
    val rows = run("sink-write-audit-publish").collect()
    val b1 = rows.find(_.getString(0) == "b1").get
    val b2 = rows.find(_.getString(0) == "b2").get
    assert(b1.getString(3) == "PASS" && b1.getInt(4) == 1)
    assert(b2.getString(3) == "FAIL" && b2.getInt(4) == 0)
    assert(b2.getLong(2) > 0, "the bad batch must actually contain null keys")
    assert(b1.getLong(5) == b1.getLong(1),
      "published row count equals exactly the passing batch's rows")
    assert(b2.getLong(5) == b1.getLong(5), "both rows report the same published state")
  }

  test("text-tokenizer-fertility: per-lang ratios are exact and sane") {
    val rows = run("text-tokenizer-fertility").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, t) = (r.getLong(2), r.getLong(3))
      assert(r.getLong(4) == t * 1000 / w, "fertility is the exact integer ratio")
      assert(r.getLong(4) >= 1000, "regex tokens at least split every word once")
      assert(r.getLong(5) > 0, "chars per token positive")
    }
  }
}
