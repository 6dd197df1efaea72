package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for round-9 batch J. */
class Round9jOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("text-offset-align: every recomputed span extracts its own token") {
    val r = run("text-offset-align").head()
    assert(r.getAs[Long]("n_misaligned") == 0L, "offset mapping drifted")
    assert(r.getAs[Long]("n_aligned") == r.getAs[Long]("n_docs"))
    val eligible = Tables.documents(spark, sf)
      .filter(size(split(col("text"), " ")) >= 2).count()
    assert(r.getAs[Long]("n_docs") == eligible)
  }

  test("agg-uplift-deciles: buckets partition users, rates bounded") {
    val rows = run("agg-uplift-deciles").collect()
    assert(rows.length == 5)
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.map(r => r.getAs[Long]("n_treat") + r.getAs[Long]("n_ctrl")).sum == users)
    rows.foreach { r =>
      assert(r.getAs[Long]("rate_treat_ppm") <= 1000000L)
      assert(r.getAs[Long]("rate_ctrl_ppm") <= 1000000L)
      assert(r.getAs[Long]("uplift_ppm") ==
        r.getAs[Long]("rate_treat_ppm") - r.getAs[Long]("rate_ctrl_ppm"))
    }
  }

  test("sample-contrastive-pairs: positives share labels, negatives never do, no self-pairs") {
    val rows = run("sample-contrastive-pairs").collect()
      .map(r => r.getAs[String]("kind") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("self_pairs"), r.getAs[Long]("same_label_pairs"))).toMap
    val (np, sp, slp) = rows("positive")
    val (nn, sn, sln) = rows("negative")
    assert(sp == 0 && sn == 0)
    assert(slp == np, "every positive pair must share its label")
    assert(sln == 0, "no negative pair may share a label")
    val nVecs = Tables.embeddings(spark, sf).count()
    val nLabels = Tables.embeddings(spark, sf).select("label").distinct().count()
    assert(np == nVecs - nLabels, "per-label lead chain yields n - |labels| positives")
    assert(nn > 0 && nn < nVecs)
  }

  test("func-timezone-suite: +5:30 shifts at least as many day boundaries as nothing") {
    val r = run("func-timezone-suite").head()
    assert(r.getAs[Long]("n") == Tables.events(spark, sf).count())
    assert(r.getAs[Long]("ist_day_shifts") >= 0 && r.getAs[Long]("pst_day_shifts") >= 0)
    assert(r.getAs[Long]("ist_day_shifts") <= r.getAs[Long]("n"))
    assert(r.getAs[String]("max_ist") > r.getAs[String]("max_utc"),
      "+5:30 max wall-clock string must exceed UTC's")
  }
}
