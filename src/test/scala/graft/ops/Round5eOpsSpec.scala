package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Round-5 batch E: dynamic partition overwrite, named WINDOW clause,
  * 2-D skyline.
  */
class Round5eOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("sink-dynamic-overwrite: only the O partition was replaced, siblings intact") {
    val rows = run("sink-dynamic-overwrite").collect()
    val oPrios = rows.filter(_.getString(0) == "O").map(_.getString(1)).distinct
    assert(oPrios.toSeq == Seq("0-RUSH"), s"O partition must be fully recoded: ${oPrios.toSeq}")
    // F and P keep the source priority distribution
    val src = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") =!= "O")
      .groupBy("o_orderstatus", "o_orderpriority").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val got = rows.filter(_.getString(0) != "O")
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == src, "non-overwritten partitions must survive byte-for-byte")
  }

  test("sql-window-clause: all three functions share one WindowExec over one exchange") {
    val df = run("sql-window-clause")
    df.collect() // materialize so the AQE final plan is decided
    val finalPlan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val nWin = "Window \\[".r.findAllIn(finalPlan).size
    assert(nWin == 1, s"shared named window must land in one WindowExec, got $nWin:\n$finalPlan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // running sum reconciles per customer
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.last.getLong(5) == sorted.map(_.getLong(2)).sum)
    }
  }

  test("agg-skyline-2d: frontier rows are mutually non-dominating and dominate everyone else") {
    val sky = run("agg-skyline-2d").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(sky.nonEmpty)
    def dominates(a: (Long, Long), b: (Long, Long)): Boolean =
      a._1 >= b._1 && a._2 >= b._2 && (a._1 > b._1 || a._2 > b._2)
    for (a <- sky; b <- sky if a != b)
      assert(!dominates(a, b), s"$a dominates $b inside the frontier")
    val all = Tables.orders(spark, sf).groupBy("o_custkey")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")).as("c"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val nonSky = all.filterNot(sky.contains)
    nonSky.foreach { p =>
      assert(sky.exists(s => dominates(s, p)), s"non-frontier point $p must be dominated")
    }
  }
}
