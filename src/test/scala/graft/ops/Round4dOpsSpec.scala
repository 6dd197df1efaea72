package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for the fourth round-4 operator batch (CUBE,
  * bitwise scalar suite, unigram perplexity proxy, k-means assignment,
  * PageRank + degree stats) over the sf0.001 testdata. The oracle
  * harness checks exact values; these check the properties that must
  * hold at any scale. */
class Round4dOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-cube: every grouping-set total reconciles with the grand total") {
    val got = run("agg-cube").cache()
    // 4 grouping sets: (status,year) gid=0, (status) gid=1, (year) gid=2, () gid=3
    val grand = got.filter(col("gid") === 3)
    assert(grand.count() == 1)
    val total = grand.head.getLong(got.columns.indexOf("n_orders"))
    for (g <- Seq(0, 1, 2)) {
      assert(got.filter(col("gid") === g).agg(sum("n_orders")).head.getLong(0) == total,
        s"gid=$g slice must re-aggregate to the grand total")
    }
  }

  test("func-bitwise-suite: mask and popcount identities hold") {
    val got = run("func-bitwise-suite").cache()
    assert(got.count() > 0)
    assert(got.filter(col("lo8") < 0 || col("lo8") > 255).count() == 0)
    assert(got.filter(col("bits") < 0 || col("bits") > 64).count() == 0)
    // x >> 2 << 2 differs from x by at most 3; ~x = -x - 1
    assert(got.filter(col("event_id") - shiftleft(col("shr2"), 2) > 3).count() == 0)
    assert(got.filter(col("inv") =!= -col("event_id").bitwiseXOR(col("mix")) - 1)
      .count() == 0) // inv = ~user_id and user_id = event_id ^ mix
  }

  test("text-perplexity-proxy: xent bounded by corpus surprisal range") {
    val got = run("text-perplexity-proxy").cache()
    assert(got.count() == Tables.documents(spark, sf).count())
    assert(got.filter(col("xent_bits") < 0).count() == 0)
    assert(got.filter(col("ppl") < 1).count() == 0)
    // a doc's cross-entropy can never exceed log2(total corpus tokens)
    // (the surprisal of a hapax under the corpus LM)
    val totalToks = got.agg(sum("n_tokens")).head.getLong(0).toDouble
    val maxBits = math.log(totalToks) / math.log(2) + 1e-6
    assert(got.filter(col("xent_bits") > maxBits).count() == 0)
  }

  test("emb-kmeans-assign: assignment is the per-vector distance argmin") {
    val got = run("emb-kmeans-assign").cache()
    assert(got.count() == Tables.embeddings(spark, sf).count())
    assert(got.filter(col("dist2_q") < -1).count() == 0)
    // labels and assignments draw from the same centroid id space
    val labels = got.select("label").distinct().collect().map(_.getInt(0)).toSet
    val assigned = got.select("assigned_label").distinct().collect().map(_.getInt(0)).toSet
    assert(assigned.subsetOf(labels))
    // the flag is exactly the label/assignment agreement (the labels
    // themselves are random, not geometric — reassignment is expected)
    assert(got.filter(col("is_own_cluster") =!=
      (col("label") === col("assigned_label")).cast("int")).count() == 0)
  }

  test("graph-pagerank: ranks are a (damped) probability distribution") {
    val got = run("graph-pagerank").cache()
    val n = got.count()
    assert(n > 0)
    assert(got.filter(col("pagerank") <= 0).count() == 0)
    // total rank mass stays ~1 (8-dp rounding drift only)
    val mass = got.agg(sum("pagerank")).head.getDouble(0)
    assert(math.abs(mass - 1.0) < 1e-3, s"rank mass $mass drifted from 1")
    // every node keeps at least the teleport floor
    assert(got.filter(col("pagerank") < lit(0.15) / lit(n.toDouble) - 1e-9).count() == 0)
  }

  test("graph-degree-stats: handshake identity across node classes") {
    val got = run("graph-degree-stats").cache()
    assert(got.count() == 2) // 'p' and 's'
    val byClass = got.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // bipartite: both classes see the same edge count
    assert(byClass("p")._2 == byClass("s")._2)
    assert(got.filter(col("min_deg") < 1).count() == 0)
    assert(got.filter(col("max_deg") > col("n_edges")).count() == 0)
  }
}
