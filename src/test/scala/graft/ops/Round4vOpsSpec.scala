package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for batch P (attribution, TWAP, interpolation,
  * Benford, k-core, block sampling, Pareto point). */
class Round4vOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-attribution: exactly one first and one last credit per conversion") {
    val got = run("agg-attribution").cache()
    val firsts = got.agg(sum("first_credits")).collect()(0).getLong(0)
    val lasts = got.agg(sum("last_credits")).collect()(0).getLong(0)
    assert(firsts == lasts) // both count each attributed conversion once
    // linear credit of one conversion sums to <= 1e6 (floor loss)
    val (touches, linear) = {
      val r = got.agg(sum("n_touches"), sum("linear_ppm")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    assert(linear <= firsts * 1000000L && touches >= firsts)
  }

  test("agg-twap: twap lies within the value range observed") {
    val got = run("agg-twap").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(2) > 0) // dur_ms
      val twapCenti = r.getLong(3) / 10000.0
      assert(twapCenti >= 1 && twapCenti <= 49100) // value domain in centi-units
    }
  }

  test("win-interpolate: interpolated values bounded by their anchors") {
    val got = run("win-interpolate").cache()
    assert(got.filter(col("v").isNotNull && col("v_interp") =!= col("v")).count() == 0)
    val gaps = got.filter(col("v").isNull)
    assert(gaps.count() > 0)
    assert(gaps.filter(col("v_interp").isNull).count() == 0)
  }

  test("dq-benford: observed ppm sums to ~1e6, all digits 1-9 present") {
    val got = run("dq-benford").collect()
    assert(got.map(_.getInt(0)).toSet == (1 to 9).toSet)
    val total = got.map(_.getLong(2)).sum
    assert(total > 1000000L - 9 && total <= 1000000L)
  }

  test("graph-kcore: every surviving node keeps degree >= 2") {
    val got = run("graph-kcore").collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getLong(1) >= 2))
  }

  test("sample-block: sampled orders keep ALL their lines") {
    val got = run("sample-block")
    val totalLines = got.agg(sum("n_lines")).collect()(0).getLong(0)
    // block sample is ~10% of orders; lines follow orders
    val allLines = Tables.lineitem(spark, sf).count()
    assert(totalLines > 0 && totalLines < allLines / 2)
  }

  test("agg-pareto-point: the 80% prefix is minimal and within the base") {
    val r = run("agg-pareto-point").collect()(0)
    val (n80, nCust) = (r.getInt(0), r.getLong(1))
    assert(n80 >= 1 && n80 <= nCust)
    assert(r.getLong(3) == math.floor(n80 * 1000000.0 / nCust).toLong)
  }
}
