package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for batch Q (drift, rolling slope, format
  * suite, gap histogram, pagerank resume). */
class Round4wOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("graph-pagerank-resume: checkpoint cut is invisible in the result") {
    val resumed = run("graph-pagerank-resume")
    val straight = run("graph-pagerank")
    assert(resumed.exceptAll(straight).count() == 0)
    assert(straight.exceptAll(resumed).count() == 0)
  }

  test("emb-drift-dims: split sizes partition each (label, dim) population") {
    val got = run("emb-drift-dims").cache()
    assert(got.count() > 0)
    // n_a + n_b equals the label's vector count for every dim
    val byLabel = Tables.embeddings(spark, sf)
      .filter(col("label") < 4).groupBy("label").count()
    val joined = got.join(byLabel, "label")
      .filter(col("n_a") + col("n_b") =!= col("count"))
    assert(joined.count() == 0)
    // drift identity: sum_a*n_b - sum_b*n_a
    assert(got.filter(col("drift_u") =!=
      col("sum_a") * col("n_b") - col("sum_b") * col("n_a")).count() == 0)
  }

  test("win-rolling-slope: slope matches the floor identity, den positive") {
    val got = run("win-rolling-slope").cache()
    assert(got.count() > 0)
    assert(got.filter(col("den") <= 0).count() == 0)
    val bad = got.filter(col("slope_micro") =!=
      floor(col("num") * lit(1000000L) / col("den")).cast("long"))
    assert(bad.count() == 0)
  }

  test("func-format-suite: padding widths and split_part are exact") {
    val got = run("func-format-suite").cache()
    assert(got.filter(length(col("key_padded")) =!= 8).count() == 0)
    assert(got.filter(length(col("seg_padded")) =!= 12).count() == 0)
    // name_num parses back to the key (Customer#000000123 -> 123)
    assert(got.filter(col("name_num").cast("long") =!= col("c_custkey")).count() == 0)
  }

  test("agg-gap-histogram: buckets respect their day ranges") {
    val got = run("agg-gap-histogram").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (b, lo, hi) = (r.getString(1), r.getInt(3), r.getInt(4))
      b match {
        case "a_under_week"    => assert(hi < 7)
        case "b_under_month"   => assert(lo >= 7 && hi < 30)
        case "c_under_quarter" => assert(lo >= 30 && hi < 90)
        case "d_longer"        => assert(lo >= 90)
      }
    }
  }
}
