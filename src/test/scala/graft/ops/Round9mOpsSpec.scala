package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for round-9 batch M. */
class Round9mOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-shapley-attribution: the efficiency identity holds exactly") {
    val r = run("agg-shapley-attribution").head()
    val phiSum = r.getAs[Long]("phi_view_ppm_x2") + r.getAs[Long]("phi_click_ppm_x2")
    assert(phiSum == 2 * (r.getAs[Long]("vvc") - r.getAs[Long]("v0")),
      "Shapley values must sum to the grand-coalition lift")
    assert(r.getAs[Long]("n_users") ==
      Tables.events(spark, sf).select("user_id").distinct().count())
  }

  test("win-hampel-filter: despiked points are a strict subset and MAD ordered") {
    val r = run("win-hampel-filter").head()
    assert(r.getAs[Long]("n_despiked") <= r.getAs[Long]("n_points"))
    assert(r.getAs[Long]("min_mad") <= r.getAs[Long]("max_mad"))
    assert(r.getAs[Long]("max_correction") >= 0)
  }

  test("sink-multi-table-snapshot: manifest-resolved join equals the direct join") {
    val rows = run("sink-multi-table-snapshot").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("snapshot_consistent")))
    val direct = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .groupBy(year(col("o_orderdate")).as("yr"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[Int]("yr") -> r.getAs[Long]("n")).toMap
    rows.foreach(r =>
      assert(r.getAs[Long]("n_lines") == direct(r.getAs[Int]("yr"))))
  }

  test("dq-golden-record: one golden row per block, attributes from the block") {
    val rows = run("dq-golden-record").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.map(_.getAs[String]("blk")).distinct.length == rows.length)
    rows.foreach { r =>
      assert(r.getAs[String]("golden_name").startsWith(r.getAs[String]("blk")))
      assert(r.getAs[Long]("n_members") >= 1)
    }
  }
}
