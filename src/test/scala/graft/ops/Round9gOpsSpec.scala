package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for round-9 batch G. */
class Round9gOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("join-fuzzy-block: pair mass equals the within-block pair arithmetic") {
    val rows = run("join-fuzzy-block").collect()
    assert(rows.nonEmpty)
    val blocks = Tables.supplier(spark, sf)
      .select(expr("substring(s_name, 1, length(s_name) - 2)").as("blk"))
      .groupBy("blk").agg(count(lit(1)).as("n")).collect()
    val expectedPairs = blocks.map(r => {
      val n = r.getAs[Long]("n"); n * (n - 1) / 2
    }).sum
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == expectedPairs)
    rows.foreach(r => assert(r.getAs[Int]("edit_dist") <= 2,
      "within a block only the last two characters can differ"))
  }

  test("src-json-multiline: array-file parse round-trips the customer aggregate") {
    val rows = run("src-json-multiline").collect()
    val direct = Tables.customer(spark, sf).groupBy("c_nationkey")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[Long]("c_nationkey") -> r.getAs[Long]("n")).toMap
    assert(rows.map(_.getAs[Long]("n")).sum == Tables.customer(spark, sf).count())
    rows.foreach(r => assert(r.getAs[Long]("n") == direct(r.getAs[Long]("c_nationkey"))))
  }

  test("emb-mmr-rerank: 5 distinct picks, rank 1 is the relevance argmax") {
    val rows = run("emb-mmr-rerank").collect().sortBy(_.getAs[Int]("rank"))
    assert(rows.length == 5)
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == 5)
    // rank1 has the max relevance of the selected set
    val rels = rows.map(_.getAs[Long]("rel_micro2"))
    assert(rels.head == rels.max)
    assert(!rows.map(_.getAs[Long]("vec_id")).contains(1L), "query must not retrieve itself")
  }

  test("dq-offset-gaps: the detector finds exactly the dropped offsets") {
    val rows = run("dq-offset-gaps").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("detector_exact"),
        s"partition ${r.getAs[Long]("part")}: detected ${r.getAs[Long]("detected_missing")} " +
          s"!= dropped ${r.getAs[Long]("actual_dropped")}")
      assert(r.getAs[Long]("n_live") <= r.getAs[Long]("n_all"))
    }
  }
}
