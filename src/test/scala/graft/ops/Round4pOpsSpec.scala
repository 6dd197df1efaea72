package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for batch J. */
class Round4pOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("expr-uuid-name: canonical shape, version/variant nibbles, stable, unique") {
    val df = run("expr-uuid-name").cache()
    assert(df.filter(!col("order_uuid")
      .rlike("^[0-9a-f]{8}-[0-9a-f]{4}-5[0-9a-f]{3}-8[0-9a-f]{3}-[0-9a-f]{12}$")).count() == 0)
    assert(df.select("order_uuid").distinct().count() == df.count())
    val again = run("expr-uuid-name")
    assert(df.exceptAll(again).count() == 0)
  }

  test("agg-multi-distinct: distinct counts bounded by row counts") {
    val df = run("agg-multi-distinct").cache()
    assert(df.filter(col("n_orders") > col("n_rows")).count() == 0)
    assert(df.filter(col("n_supp_part") > col("n_rows")).count() == 0)
    assert(df.filter(col("n_parts") > col("n_supp_part")).count() == 0)
    // the plan must carry an Expand for the multi-distinct rewrite
    val plan = run("agg-multi-distinct").queryExecution.executedPlan.toString
    assert(plan.contains("Expand"))
  }

  test("src-binaryfile: digests match the staged documents") {
    val got = run("src-binaryfile")
    val exp = Tables.documents(spark, sf).filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"),
        octet_length(col("text")).cast("long").as("length"),
        md5(col("text")).as("content_md5"))
    assert(got.exceptAll(exp).count() == 0)
    assert(exp.exceptAll(got).count() == 0)
  }
}
