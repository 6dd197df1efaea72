package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for the RelMore batch (values are graded by the
  * oracle harness; these pin scale-independent properties). */
class Round4gOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("func-hof-suite: arrays are 4-wide, all_nonneg holds by construction") {
    val df = run("func-hof-suite").cache()
    assert(df.filter(size(split(col("doubled"), ",")) =!= 4).count() == 0)
    assert(df.filter(!col("all_nonneg")).count() == 0)
    // zip_with(arr, reverse(arr), *) is palindromic: first == last element
    val bad = df.filter(element_at(split(col("zipped"), ","), 1) =!=
      element_at(split(col("zipped"), ","), -1))
    assert(bad.count() == 0)
  }

  test("gen-explode-ordinal: exactly 8 ordinals 1..8 per vector") {
    val df = run("gen-explode-ordinal").cache()
    val per = df.groupBy("vec_id").agg(count(lit(1)).as("n"),
      min("i").as("lo"), max("i").as("hi"))
    assert(per.filter(col("n") =!= 8 || col("lo") =!= 1 || col("hi") =!= 8).count() == 0)
  }

  test("sql-tpch-q6: single non-trivial revenue row") {
    val r = run("sql-tpch-q6").collect()
    assert(r.length == 1 && r(0).getDouble(0) > 0 && r(0).getLong(1) > 0)
  }

  test("join-exists-subquery: EXISTS implies the correlated count is positive") {
    val df = run("join-exists-subquery").cache()
    assert(df.count() > 0)
    assert(df.filter(col("n_orders") < 1).count() == 0)
  }

  test("agg-cohort-retention: offsets non-negative, week-0 cell dominates its cohort") {
    val df = run("agg-cohort-retention").cache()
    assert(df.filter(col("week_offset") < 0).count() == 0)
    val wk0 = df.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_users").as("n0"))
    val bad = df.join(wk0, "cohort_week").filter(col("n_users") > col("n0"))
    assert(bad.count() == 0)
  }

  test("agg-cms-heavyhitters: the sketch never underestimates") {
    val df = run("agg-cms-heavyhitters").cache()
    assert(df.count() == 10)
    assert(df.filter(!col("never_under")).count() == 0)
    assert(df.filter(col("cms_est") < col("exact")).count() == 0)
  }

  test("sink-cdc-apply: deletes dropped, updates applied, inserts kept") {
    val df = run("sink-cdc-apply").cache()
    assert(df.filter(col("key") % 100 === 0).count() == 0)
    val orig = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("key"),
        Tables.outNum(Tables.dec2(col("o_totalprice") + 10)).as("expected"))
    val updated = df.filter(col("key") % 10 === 0 && col("key") % 100 =!= 0)
    assert(updated.join(orig, "key").filter(col("price") =!= col("expected")).count() == 0)
    // every surviving key is an original order key, exactly once
    assert(df.groupBy("key").count().filter(col("count") > 1).count() == 0)
  }

  test("sample-uniform-k: exactly k, reproducible across runs") {
    val a = run("sample-uniform-k").collect().map(_.getLong(0)).toSeq
    val b = run("sample-uniform-k").collect().map(_.getLong(0)).toSeq
    assert(a.length == 100 && a == b)
  }
}
