package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for round-9 batch H. */
class Round9hOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-power-analysis: required n shrinks quadratically with effect size") {
    val rows = run("agg-power-analysis").collect().sortBy(_.getAs[Long]("delta"))
    assert(rows.length == 4)
    val ns = rows.map(_.getAs[Long]("n_per_arm"))
    assert(ns.zip(ns.tail).forall { case (a, b) => b <= a },
      "larger effects need fewer samples")
    // δ 10 → 100: n must shrink ~100× (ceil slack allowed)
    assert(ns.head >= ns.last * 50)
    rows.foreach(r => assert(r.getAs[Long]("n_per_arm") >= 1))
  }

  test("sink-sorted-write: files respect the record cap and cover all rows") {
    val rows = run("sink-sorted-write").collect()
    val direct = Tables.lineitem(spark, sf).groupBy("l_returnflag")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("n")).toMap
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      assert(r.getAs[Long]("max_file_records") <= 20000L)
      assert(r.getAs[Long]("n_rows") == direct(flag))
      val expFiles = (direct(flag) + 20000L - 1) / 20000L
      assert(r.getAs[Long]("n_files") == expFiles,
        s"$flag: ${r.getAs[Long]("n_files")} files, expected $expFiles")
    }
  }

  test("cast-unit-suffix: parsed bytes equal the direct unit arithmetic") {
    val rows = run("cast-unit-suffix").collect()
    val direct = Tables.orders(spark, sf).select(
      col("o_orderpriority"),
      (floor(col("o_totalprice")).cast("long") *
        when(col("o_orderkey") % 3 === 0, 1L)
          .when(col("o_orderkey") % 3 === 1, 1024L)
          .otherwise(1024L * 1024)).as("b"))
      .groupBy("o_orderpriority").agg(sum("b").as("tb")).collect()
      .map(r => r.getAs[String]("o_orderpriority") -> r.getAs[Long]("tb")).toMap
    rows.foreach(r => assert(
      r.getAs[Long]("total_bytes") == direct(r.getAs[String]("o_orderpriority"))))
  }

  test("win-rolling-corr: correlations bounded in [-1, 1] micro and sorted") {
    val rows = run("win-rolling-corr").collect()
    assert(rows.nonEmpty && rows.length <= 15)
    val cs = rows.map(_.getAs[Long]("corr2_signed_micro"))
    assert(cs.forall(c => c >= -1000000L && c <= 1000000L),
      "corr² must lie in [0,1] scaled")
    assert(cs.zip(cs.tail).forall { case (a, b) => b <= a })
  }
}
