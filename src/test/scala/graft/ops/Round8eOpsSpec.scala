package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for round-8 batch E. */
class Round8eOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("src-text-wholetext: shards partition the corpus, sizes reassemble exactly") {
    val rows = run("src-text-wholetext").collect()
    assert(rows.map(_.getAs[Int]("shard")).toSet == (0 to 4).toSet)
    val totalDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(totalDocs == Tables.documents(spark, sf).count())
    val expectChars = Tables.documents(spark, sf)
      .agg(sum(length(col("text")))).head().getLong(0) + totalDocs - 5
    assert(rows.map(_.getAs[Int]("n_chars").toLong).sum == expectChars)
  }

  test("src-recursive-glob: decoy receipts are skipped, table restored") {
    val rows = run("src-recursive-glob").collect()
    val direct = Tables.nation(spark, sf).groupBy("n_regionkey")
      .agg(count(lit(1)).as("n"), sum("n_nationkey").as("k"))
      .collect().map(r => (r.getAs[Long]("n_regionkey"), r.getAs[Long]("n"), r.getAs[Long]("k"))).toSet
    val got = rows.map(r => (r.getAs[Long]("n_regionkey"),
      r.getAs[Long]("n_nations"), r.getAs[Long]("key_sum"))).toSet
    assert(got == direct)
  }

  test("agg-ytd-mtd: YTD resets each January and accumulates MTD exactly") {
    val rows = run("agg-ytd-mtd").orderBy("month").collect()
    assert(rows.nonEmpty)
    var runningYtd = 0L
    var curYear = ""
    rows.foreach { r =>
      val m = r.getAs[String]("month"); val yr = m.substring(0, 4)
      if (yr != curYear) { curYear = yr; runningYtd = 0L }
      runningYtd += r.getAs[Long]("mtd_cents")
      assert(r.getAs[Long]("ytd_cents") == runningYtd, s"YTD broken at $m")
      assert(r.getAs[Long]("qtd_cents") <= r.getAs[Long]("ytd_cents"))
      assert(r.getAs[Long]("qtd_cents") >= r.getAs[Long]("mtd_cents"))
    }
  }

  test("sample-class-balance: every class keeps exactly the minority count") {
    val rows = run("sample-class-balance").collect()
    assert(rows.nonEmpty)
    val kept = rows.map(_.getAs[Long]("n_kept")).toSet
    assert(kept.size == 1, s"unequal class sizes after balancing: $kept")
    val minority = Tables.documents(spark, sf).groupBy("lang").count()
      .agg(min("count")).head().getLong(0)
    assert(kept.head == minority)
  }
}
