package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for the round-4 operators (scalar-function
  * parity suites, SCD2 merge, bloom-prefiltered join, funnel, PII
  * mask, URL dedup) over the sf0.001 testdata. The oracle harness
  * checks exact values; these check the properties that must hold at
  * any scale. */
class Round4OpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("func-string-suite: accent fold lands in plain ASCII and matches lower(name)") {
    val df = run("func-string-suite").cache()
    assert(df.filter(col("folded").rlike("[^a-z0-9# ]")).count() == 0)
    assert(df.filter(col("folded") =!= lower(col("up_name"))).count() == 0)
    assert(df.filter(col("name_len") =!= length(trim(col("up_name")))).count() == 0)
  }

  test("func-date-suite: T-SQL week is in [1,54] and Jan 1 is always week 1") {
    val df = run("func-date-suite").cache()
    assert(df.filter(col("wk_tsql") < 1 || col("wk_tsql") > 54).count() == 0)
    assert(df.filter(col("mo") === 1 && col("dy") === 1 && col("wk_tsql") =!= 1).count() == 0)
    assert(df.filter(col("wd_tsql") < 1 || col("wd_tsql") > 7).count() == 0)
    assert(df.filter(col("date_key") =!=
      (col("yr") * 10000 + col("mo") * 100 + col("dy"))).count() == 0)
  }

  test("func-math-suite: discount amount bounded by price, ship key valid") {
    val df = run("func-math-suite").cache()
    assert(df.filter(col("discount_amt") < 0).count() == 0)
    assert(df.filter(col("ship_key") < 19900000 || col("ship_key") > 21000000).count() == 0)
  }

  test("sink-scd2: exactly one current version per key, intervals closed correctly") {
    val df = run("sink-scd2").cache()
    val perKey = df.filter(col("is_current") === 1).groupBy("c_custkey").count()
    assert(perKey.filter(col("count") =!= 1).count() == 0)
    // closed rows end where the next version starts
    assert(df.filter(col("is_current") === 0 &&
      col("valid_to") =!= lit("2024-06-01").cast("date")).count() == 0)
    // changed keys carry exactly 2 versions, unchanged exactly 1
    val versions = df.groupBy("c_custkey").count()
    assert(versions.filter(col("c_custkey") % 10 === 0 && col("count") =!= 2).count() == 0)
    assert(versions.filter(col("c_custkey") % 10 =!= 0 && col("count") =!= 1).count() == 0)
  }

  test("join-bloom-prefilter equals the unfiltered join (false positives removed)") {
    val direct = Tables.lineitem(spark, sf)
      .join(Tables.supplier(spark, sf).filter(col("s_acctbal") > 9000),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_suppkey").count()
    val bloom = run("join-bloom-prefilter")
    assert(bloom.count() == direct.count())
    assert(bloom.join(direct, Seq("s_suppkey"))
      .filter(col("n_lines") =!= col("count")).count() == 0)
  }

  test("agg-funnel: stages monotone decreasing in population beyond stage 0") {
    val rows = run("agg-funnel").collect()
    val byStage = rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    // funnel property: users at stage k+1 are a subset of stage k's
    // reachers, so cumulative counts from the top shrink
    val s1plus = byStage.filterKeys(_ >= 1).values.sum
    val s2plus = byStage.filterKeys(_ >= 2).values.sum
    val s3 = byStage.getOrElse(3, 0L)
    assert(s1plus >= s2plus && s2plus >= s3)
    assert(rows.map(_.getLong(1)).sum > 0)
  }

  test("text-pii-mask: no raw emails or phones survive, counts match masks") {
    val df = run("text-pii-mask").cache()
    assert(df.filter(col("masked").rlike("[a-z0-9.]+@[a-z.]+")).count() == 0)
    assert(df.filter(col("masked").rlike("555-[0-9]{4}")).count() == 0)
    assert(df.filter(col("n_pii") =!= lit(2)).count() == 0) // 1 email + 1 phone each
  }

  test("dedup-url: canonical urls are lowercase-host, fragment-free, utm-free; counts add up") {
    val df = run("dedup-url").cache()
    assert(df.filter(col("canonical_url").rlike("#")).count() == 0)
    assert(df.filter(col("canonical_url").rlike("utm_")).count() == 0)
    assert(df.filter(col("canonical_url").rlike("^https://[A-Z]")).count() == 0)
    val total = df.agg(sum("n_dups")).collect()(0).getLong(0)
    assert(total == Tables.documents(spark, sf).count())
  }
}
