package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for batch H. */
class Round4nOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("sql-tpch-q18: every emitted order exceeds the quantity threshold") {
    val df = run("sql-tpch-q18").cache()
    assert(df.count() > 0 && df.count() <= 100)
    assert(df.filter(col("sum_qty") <= 150).count() == 0)
  }

  test("agg-decile-report: 10 buckets, shares sum to ~1, monotone revenue") {
    val df = run("agg-decile-report").cache()
    assert(df.count() == 10)
    val s = df.agg(sum("share_micro")).head().getLong(0)
    assert(s <= 1000000 && s >= 1000000 - 10)
    // decile 1 holds the largest orders: revenue non-increasing by decile
    val revs = df.orderBy("decile").collect().map(_.getDouble(2))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("func-url-suite: components reassemble the url") {
    val df = run("func-url-suite").cache()
    val bad = df.filter(
      concat(col("protocol"), lit("://"), col("host"), col("path"),
        lit("?"), col("query")) =!= col("url"))
    assert(bad.count() == 0)
    assert(df.filter(col("param_id") =!= col("c_custkey").cast("string")).count() == 0)
  }

  test("graph-shortest-path: triangle inequality vs BFS levels") {
    val sp = run("graph-shortest-path").cache()
    assert(sp.filter(col("dist") < 0).count() == 0)
    assert(sp.filter(col("node") === "s1").head().getLong(1) == 0L)
    // weighted distance is at least the hop count (min weight >= 1)
    val bfs = run("graph-bfs").select(col("node"), col("lvl"))
    assert(sp.join(bfs, "node").filter(col("dist") < col("lvl")).count() == 0)
  }

  test("agg-time-to-convert: non-negative durations, avg within min/max") {
    val df = run("agg-time-to-convert").cache()
    assert(df.count() > 0)
    assert(df.filter(col("min_secs") < 0).count() == 0)
    assert(df.filter(col("avg_secs_micro") < col("min_secs") * 1000000L ||
      col("avg_secs_micro") > col("max_secs") * 1000000L).count() == 0)
  }
}
