package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for the RelMore6 batch. */
class Round4lOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("graph-bfs: levels alternate bipartite sides, seed at level 0") {
    val df = run("graph-bfs").cache()
    assert(df.filter(col("lvl") === 0).count() == 1)
    // even levels are suppliers, odd levels are parts (bipartite)
    assert(df.filter(col("lvl") % 2 === 0 && !col("node").startsWith("s")).count() == 0)
    assert(df.filter(col("lvl") % 2 === 1 && !col("node").startsWith("p")).count() == 0)
    // each node appears once (min level semantics)
    assert(df.groupBy("node").count().filter(col("count") > 1).count() == 0)
  }

  test("src-csv-corrupt-recovery: corrupt bucket isolated, counts reconcile") {
    val df = run("src-csv-corrupt-recovery").cache()
    val total = df.agg(sum("n_rows")).head().getLong(0)
    assert(total == Tables.orders(spark, sf).count())
    assert(df.filter(col("bucket") =!= "CORRUPT" && col("n_corrupt") > 0).count() == 0)
    assert(df.filter(col("bucket") === "CORRUPT").head().getLong(2) > 0)
  }

  test("join-dpp: plan prunes partitions dynamically") {
    val df = run("join-dpp")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
      s"expected a DPP subquery in:\n$plan")
    assert(df.head().getLong(0) > 0)
  }

  test("agg-string-concat: sorted, complete nation lists") {
    val df = run("agg-string-concat").cache()
    assert(df.agg(sum("n_nations")).head().getLong(0) ==
      Tables.nation(spark, sf).count())
    // the joined string is sorted: split and compare with its sort
    val bad = df.filter(
      expr("array_join(array_sort(split(nations, ',')), ',') != nations"))
    assert(bad.count() == 0)
  }

  test("agg-boolean-suite: argmin/argmax keyed by unique ordinal") {
    val df = run("agg-boolean-suite").cache()
    val o = Tables.orders(spark, sf)
    val firstLast = o.groupBy("o_orderstatus")
      .agg(min("o_orderkey").as("k0"), max("o_orderkey").as("k1"))
      .join(o.select(col("o_orderkey").as("k0"), col("o_totalprice").as("p0")), "k0")
      .join(o.select(col("o_orderkey").as("k1"), col("o_totalprice").as("p1")), "k1")
    val j = df.join(firstLast, "o_orderstatus")
    assert(j.filter(col("price_of_first_key") =!= col("p0")).count() == 0)
    assert(j.filter(col("price_of_last_key") =!= col("p1")).count() == 0)
  }

  test("text-sentence-split: ratio consistent with counts") {
    val df = run("text-sentence-split").cache()
    assert(df.filter(col("n_sentences") < 0).count() == 0)
    val bad = df.filter(col("n_sentences") > 0 &&
      col("words_per_sentence_micro") =!=
        floor(col("n_words") * lit(1000000L) / col("n_sentences")))
    assert(bad.count() == 0)
  }
}
