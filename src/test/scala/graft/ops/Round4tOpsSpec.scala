package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for batch N (q2/q11 completions, RFM,
  * basket lift, LOCF, scaffold, feature hashing, equi-depth, structs,
  * nprobe curve). */
class Round4tOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("sql-tpch-q2: each part's suppliers all hold that part's min acctbal") {
    val got = run("sql-tpch-q2").cache()
    val perPart = got.groupBy("p_partkey")
      .agg(countDistinct("s_acctbal").as("k")).filter(col("k") > 1)
    assert(perPart.count() == 0)
  }

  test("sql-tpch-q11: every survivor holds at least 2x the mean share") {
    val got = run("sql-tpch-q11").collect()
    assert(got.nonEmpty)
    val vals = got.map(_.getLong(1))
    assert(vals.zip(vals.tail).forall { case (a, b) => a >= b })
  }

  test("agg-rfm-segmentation: scores in 1..4, segment = concat of scores") {
    val got = run("agg-rfm-segmentation").cache()
    assert(got.filter(col("r_score") < 1 || col("r_score") > 4).count() == 0)
    assert(got.filter(col("segment") =!=
      concat(col("r_score"), col("f_score"), col("m_score"))).count() == 0)
    // quartiles are balanced: max-min tile size <= 1
    val sizes = got.groupBy("m_score").count().collect().map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1)
  }

  test("agg-basket-affinity: confidence consistent, pair support >= 2") {
    run("agg-basket-affinity").collect().foreach { r =>
      val (pairN, n1) = (r.getLong(2), r.getLong(3))
      assert(pairN >= 2 && pairN <= n1)
      assert(r.getLong(6) == math.floor(pairN * 1000000.0 / n1).toLong)
    }
  }

  test("win-locf-backfill: filled value equals nearest non-null neighbor") {
    val got = run("win-locf-backfill").cache()
    // non-null rows carry themselves
    assert(got.filter(col("v").isNotNull && col("v_locf") =!= col("v")).count() == 0)
    // induced nulls are the only gaps, and locf never invents values
    assert(got.filter(col("v").isNull && col("event_id") % 5 =!= 0).count() == 0)
  }

  test("gen-dense-scaffold: exactly |days| x |statuses| rows, actuals preserved") {
    val got = run("gen-dense-scaffold").cache()
    val statuses = Tables.orders(spark, sf).select("o_orderstatus").distinct().count()
    assert(got.count() == 91 * statuses)
    val totalInWindow = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1996-04-01").count()
    assert(got.agg(sum("n_orders")).collect()(0).getLong(0) == totalInWindow)
  }

  test("text-feature-hashing: buckets in domain, counts positive") {
    val got = run("text-feature-hashing").cache()
    assert(got.filter(col("bucket") < 0 || col("bucket") > 63).count() == 0)
    assert(got.filter(col("n") <= 0).count() == 0)
  }

  test("agg-equidepth-histogram: buckets contiguous and balanced") {
    val got = run("agg-equidepth-histogram").collect()
    assert(got.length == 10)
    val ns = got.map(_.getLong(1))
    assert(ns.max - ns.min <= 1) // equi-depth
    // bucket ranges are non-overlapping and increasing
    val ranges = got.map(r => (r.getLong(2), r.getLong(3)))
    ranges.zip(ranges.tail).foreach { case ((_, hi), (lo2, _)) => assert(hi <= lo2) }
  }

  test("func-struct-suite: first/last from struct-sorted arrays bracket the span") {
    run("func-struct-suite").collect().foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getDouble(4) >= 0)
    }
  }

  test("ann-nprobe-curve: recall is monotone non-decreasing in nprobe") {
    val got = run("ann-nprobe-curve").collect()
    assert(got.map(_.getInt(0)).toSeq == Seq(1, 2, 4))
    val recalls = got.map(_.getLong(2))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b })
  }
}
