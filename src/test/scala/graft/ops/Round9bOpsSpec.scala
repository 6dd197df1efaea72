package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for round-9 batch B. */
class Round9bOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("graph-bipartite-weight: histogram mass equals the projection edge count") {
    val rows = run("graph-bipartite-weight").collect()
    assert(rows.nonEmpty)
    val li = Tables.lineitem(spark, sf).filter(col("l_orderkey") % 29 === 0)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val nEdges = li.as("a").join(li.as("b"), Seq("ok"))
      .filter(col("a.pk") < col("b.pk"))
      .select("a.pk", "b.pk").distinct().count()
    assert(rows.map(_.getAs[Long]("n_edges")).sum == nEdges)
    rows.foreach(r => assert(r.getAs[Long]("weight") >= 1))
  }

  test("mm-modality-balance: shard shares sum to ~1 and global share is constant per modality") {
    val rows = run("mm-modality-balance").collect()
    assert(rows.nonEmpty)
    val byShard = rows.groupBy(_.getAs[Long]("shard"))
    byShard.values.foreach { rs =>
      val sumShare = rs.map(_.getAs[Double]("shard_share")).sum
      assert(sumShare > 0.999 && sumShare <= 1.0 + 1e-9, s"shares sum $sumShare")
    }
    val byModality = rows.groupBy(_.getAs[String]("modality"))
    byModality.values.foreach { rs =>
      assert(rs.map(_.getAs[Double]("global_share")).distinct.length == 1)
    }
  }

  test("src-fixed-width: byte-offset parse round-trips the orders aggregate") {
    val rows = run("src-fixed-width").collect()
    val direct = Tables.orders(spark, sf).groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n_orders")).collect()
      .map(r => r.getAs[String]("status") -> r.getAs[Long]("n_orders")).toMap
    assert(rows.map(_.getAs[String]("status")).toSet == direct.keySet)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_orders") == direct(r.getAs[String]("status")))
      assert(r.getAs[Double]("revenue") > 0)
      assert(r.getAs[java.sql.Date]("first_date").before(r.getAs[java.sql.Date]("last_date")))
    }
  }

  test("agg-path-trigrams: paths are 3-step and counts bounded by total transitions") {
    val rows = run("agg-path-trigrams").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach(r => assert(r.getAs[String]("path").split(">").length == 3))
    val counts = rows.map(_.getAs[Long]("n"))
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a })
    val nEvents = Tables.events(spark, sf).count()
    assert(counts.sum <= nEvents)
  }
}
