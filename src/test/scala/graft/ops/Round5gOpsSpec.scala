package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Round-5 batch G: watermark-bounded streaming dedup, multi-micro-batch
  * replay, parameterized SQL, crypto round-trip.
  */
class Round5gOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("stream-dedup-within-watermark: doubled source dedups back to batch distinct") {
    val got = run("stream-dedup-within-watermark").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exp = Tables.events(spark, sf).groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exp, s"watermarked dedup must equal batch distinct: $got vs $exp")
  }

  test("stream-multi-batch: three forced micro-batches accumulate to the 3x batch answer") {
    val rows = run("stream-multi-batch").collect()
    val exp = Tables.events(spark, sf).groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) * 3).toMap
    val got = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exp, s"incremental state across batches must equal 3x batch: $got vs $exp")
    // the premise: maxFilesPerTrigger=1 over 3 staged files → ≥3 committed batches
    val offsets = new java.io.File(Tables.tmp("ckpt-stream_multi_batch", sf), "offsets")
    assert(offsets.isDirectory && offsets.list().count(!_.startsWith(".")) >= 3,
      s"expected >=3 offset commits, found ${Option(offsets.list()).map(_.toSeq)}")
  }

  test("sql-parameterized: bound parameters reach the scan as pushed filters") {
    val df = run("sql-parameterized")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_orderstatus"),
      s"parameter-bound predicate must push to the parquet scan:\n$plan")
    assert(df.collect().nonEmpty)
  }

  test("func-crypto-roundtrip: decrypt∘encrypt is identity, ciphertext block-aligned") {
    val rows = run("func-crypto-roundtrip").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"round-trip failed for ${r.getLong(0)}")
      assert(r.getInt(3) % 16 == 0, "AES ciphertext must be block-aligned")
      assert(r.getString(4).length == 64, "sha256 hex fingerprint")
    }
  }
}
