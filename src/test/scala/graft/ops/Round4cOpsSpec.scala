package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for the third round-4 operator batch
  * (sequence packing, BPE pair counting, int8 embedding quantization,
  * regression aggregates, streaming session windows) over the sf0.001
  * testdata. The oracle harness checks exact values; these check the
  * properties that must hold at any scale. */
class Round4cOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("text-pack-sequences: bins hold every token and straddlers are bounded") {
    val got = run("text-pack-sequences").cache()
    assert(got.count() > 0)
    // bin arithmetic: tokens never exceed bins * ctx, and the bin count
    // is the minimum that fits (last bin non-empty)
    assert(got.filter(col("n_tokens") > col("n_bins") * 512).count() == 0)
    assert(got.filter(col("n_tokens") <= (col("n_bins") - 1) * 512).count() == 0)
    assert(got.filter(col("n_straddlers") > col("n_docs")).count() == 0)
    // every document lands in exactly one shard
    val nDocs = Tables.documents(spark, sf).count()
    assert(got.agg(sum("n_docs")).head.getLong(0) == nDocs)
  }

  test("text-bpe-pairs: top pairs are positive-count and rank-ordered") {
    val got = run("text-bpe-pairs").collect()
    assert(got.nonEmpty && got.length <= 20)
    assert(got.forall(_.getAs[Long]("cnt") > 0))
    // non-increasing counts (the merge-candidate ordering BPE needs)
    val cnts = got.map(_.getAs[Long]("cnt")).toSeq
    assert(cnts == cnts.sorted.reverse)
  }

  test("emb-quantize: codes fit int8 and reconstruction error is small") {
    val got = run("emb-quantize").cache()
    assert(got.count() > 0)
    assert(got.filter(col("max_code") > 127).count() == 0)
    // symmetric int8 quantization error is bounded by scale/2 =
    // amax/254; avg rmse must sit well under the per-vector worst case
    assert(got.filter(col("avg_rmse") > col("max_amax") / 127.0).count() == 0)
    // every vector accounted for
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(got.agg(sum("n_vecs")).head.getLong(0) == nVecs)
  }

  test("agg-regression: moments match a hand-computed OLS fit") {
    val got = run("agg-regression").cache()
    // cross-check slope/intercept against explicit sums on one group
    val li = Tables.lineitem(spark, sf).filter(col("l_returnflag") === "A")
      .select(col("l_quantity").cast("double").as("x"),
        col("l_extendedprice").cast("double").as("y"))
    val m = li.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx")).head
    val n = m.getAs[Long]("n").toDouble
    val slope = (m.getAs[Double]("sxy") - m.getAs[Double]("sx") * m.getAs[Double]("sy") / n) /
      (m.getAs[Double]("sxx") - m.getAs[Double]("sx") * m.getAs[Double]("sx") / n)
    val gotA = got.filter(col("l_returnflag") === "A").head
    assert(math.abs(gotA.getAs[Double]("slope") - slope) < 1e-4)
    assert(got.filter(col("r2") < 0 || col("r2") > 1).count() == 0)
  }

  test("stream-session-window: sessions partition events and respect the gap") {
    val got = run("stream-session-window").cache()
    // every event lands in exactly one session
    val nEvents = Tables.events(spark, sf).count()
    assert(got.agg(sum("n_events")).head.getLong(0) == nEvents)
    // a user's session count never exceeds their event count, and the
    // session starts within a user are strictly increasing (disjoint)
    val perUser = got.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_ev"))
    assert(perUser.filter(col("n_sessions") > col("n_ev")).count() == 0)
    assert(got.groupBy("user_id", "session_start").count()
      .filter(col("count") > 1).count() == 0)
  }
}
