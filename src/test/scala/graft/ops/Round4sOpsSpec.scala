package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for batch M (partsupp-free TPC-H completions,
  * DQ rule engine, exact z-score anomaly gate, caption pairing). */
class Round4sOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("sql-tpch-q7: only the two configured nations, both directions") {
    val got = run("sql-tpch-q7").collect()
    assert(got.nonEmpty)
    val pairs = got.map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.subsetOf(Set(("NATION_12", "NATION_10"), ("NATION_10", "NATION_12"))))
    got.foreach(r => assert(r.getInt(2) == 1996 || r.getInt(2) == 1997))
  }

  test("sql-tpch-q8: share ppm consistent with its numerator/denominator") {
    run("sql-tpch-q8").collect().foreach { r =>
      val (nat, mkt, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nat >= 0 && nat <= mkt)
      assert(ppm == math.floor(1000000.0 * nat / mkt).toLong)
    }
  }

  test("sql-tpch-q9: profit double mirrors micro-units exactly") {
    val got = run("sql-tpch-q9").collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getDouble(3) == r.getLong(2) / 10000.0))
  }

  test("sql-tpch-q15: every returned supplier holds the max revenue") {
    val got = run("sql-tpch-q15").collect()
    assert(got.nonEmpty)
    val revs = got.map(_.getDouble(2)).toSet
    assert(revs.size == 1) // all ties at the max
  }

  test("sql-tpch-q17: threshold keeps only sub-fifth-of-avg quantities") {
    val r = run("sql-tpch-q17").collect()(0)
    // n_lines may be 0 at sf0.001; avg_yearly null in that case is fine
    assert(r.getLong(1) >= 0)
  }

  test("sql-tpch-q20: qualifying suppliers exceed the HAVING threshold") {
    val got = run("sql-tpch-q20")
    val qual = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter(col("p_brand") === "Brand#11"),
        col("p_partkey") === col("l_partkey"))
      .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01")
      .groupBy("l_suppkey")
      .agg(sum(col("l_quantity").cast("long")).as("q"))
      .filter(col("q") > 50)
    assert(got.count() == qual.count())
  }

  test("sql-tpch-q21: waiting supplier is the sole returner of a multi-supplier order") {
    val got = run("sql-tpch-q21").collect()
    got.foreach(r => assert(r.getLong(1) > 0))
    val ws = got.map(_.getLong(1))
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b })
  }

  test("dq-rule-engine: one row per rule, clean invariants report zero") {
    val got = run("dq-rule-engine").collect()
    assert(got.length == 7)
    val m = got.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("neg_price") == 0 && m("zero_qty") == 0 && m("null_returnflag") == 0)
    assert(m("high_discount") > 0) // data-dependent screen must actually fire
  }

  test("dq-anomaly-zscore: full trailing window only, flag matches exact recompute") {
    val got = run("dq-anomaly-zscore").collect()
    assert(got.length > 0 && got.length <= 23)
    assert(got.exists(_.getBoolean(3))) // the 1.5-sigma gate fires somewhere
  }

  test("mm-caption-join: every pair passes the caption screen, norms positive") {
    val got = run("mm-caption-join").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(1) >= 50 && r.getLong(1) <= 5000)
      assert(r.getLong(4) > 0)
    }
  }
}
