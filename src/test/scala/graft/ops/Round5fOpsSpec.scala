package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Round-5 batch F: k-means M-step, node Jaccard similarity, AQE
  * runtime join re-plan.
  */
class Round5fOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("emb-kmeans-update: membership conserved, shifts non-negative") {
    val rows = run("emb-kmeans-update").collect()
    assert(rows.length == 10, "one row per surviving cluster")
    val n = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == n, "old memberships tile the corpus")
    assert(rows.map(_.getLong(2)).sum == n, "new memberships tile the corpus")
    assert(rows.forall(_.getLong(3) >= 0), "squared shift is non-negative")
  }

  test("graph-jaccard-similarity: ppm within range, pairs canonical, ordered") {
    val rows = run("graph-jaccard-similarity").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "canonical n1 < n2")
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000L, "jaccard in [0, 1e6]")
      assert(r.getLong(2) >= 1, "pairs exist only via a shared neighbor")
    }
    val js = rows.map(_.getLong(3))
    assert(js.zip(js.tail).forall { case (a, b) => a >= b }, "ordered by jaccard desc")
  }

  test("join-aqe-replan: initial plan sort-merge, final plan broadcast") {
    // hold static broadcast off while materializing: the op restores the
    // conf before returning, and the re-plan is decided at execution time
    val prev = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    val df = try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10MB")
      val d = run("join-aqe-replan")
      d.collect()
      d
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
      prevAqe match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
    val plan = df.queryExecution.executedPlan.toString
    val parts = plan.split("== Initial Plan ==")
    assert(parts.length == 2, s"expected an adaptive plan with both sections:\n$plan")
    assert(parts(1).contains("SortMergeJoin"),
      s"static stats must pick sort-merge initially:\n${parts(1)}")
    assert(parts(0).contains("BroadcastHashJoin"),
      s"AQE must re-plan to broadcast at runtime:\n${parts(0)}")
    assert(df.collect().nonEmpty)
  }
}
