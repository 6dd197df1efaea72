package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for batch L (subquery front doors, map suite,
  * triangle count, hash-min CC). */
class Round4rOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("sql-tpch-q4: semi join never multiplies orders") {
    val got = run("sql-tpch-q4")
    val total = got.agg(sum("order_count")).collect()(0).getLong(0)
    val direct = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= "1996-07-01" && col("o_orderdate") < "1996-10-01")
      .join(Tables.lineitem(spark, sf).filter(col("l_returnflag") === "R")
        .select("l_orderkey").distinct(),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .count()
    assert(total == direct)
  }

  test("sql-tpch-q12: high+low partition every joined line") {
    val got = run("sql-tpch-q12").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(2) >= 0 && r.getLong(1) + r.getLong(2) > 0)
    }
  }

  test("sql-tpch-q13: custdist covers every customer exactly once") {
    val got = run("sql-tpch-q13")
    val nCust = got.agg(sum("custdist")).collect()(0).getLong(0)
    assert(nCust == Tables.customer(spark, sf).count())
  }

  test("sql-tpch-q14: ppm consistent with its own numerator/denominator") {
    val r = run("sql-tpch-q14").collect()(0)
    val (promo, total, ppm) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(promo >= 0 && promo <= total)
    assert(ppm == math.floor(1000000.0 * promo / total).toLong)
  }

  test("sql-tpch-q16: anti join excludes negative-balance suppliers") {
    val excluded = Tables.supplier(spark, sf)
      .filter(col("s_acctbal") < 0).select("s_suppkey").collect().map(_.getLong(0)).toSet
    // recompute one group's distinct-supplier set and check disjointness
    val joined = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("p_partkey") === col("l_partkey"))
      .filter(col("p_size") === 1)
      .select("l_suppkey").distinct().collect().map(_.getLong(0)).toSet
    val got = run("sql-tpch-q16")
    assert(got.filter(col("p_size") === 1).collect()
      .forall(_.getLong(3) <= (joined -- excluded).size))
  }

  test("sql-tpch-q19: disjunction bounds quantity to the union envelope") {
    val r = run("sql-tpch-q19").collect()(0)
    assert(!r.isNullAt(0) && r.getDouble(0) > 0 && r.getLong(1) > 0)
  }

  test("sql-tpch-q22: every bucket's customers beat the positive avg") {
    val got = run("sql-tpch-q22").collect()
    got.foreach { r => assert(r.getLong(1) > 0 && r.getDouble(2) > 0) }
  }

  test("func-map-suite: map round-trip equals direct column math") {
    val got = run("func-map-suite")
    assert(got.filter(col("nkeys") =!= 3).count() == 0)
    assert(got.filter(col("keys_sorted") =!= "disc,qty,tax").count() == 0)
    assert(got.filter(col("qty2") =!= col("qty") * 2.0).count() == 0)
    assert(got.filter(!col("has_tax")).count() == 0)
  }

  test("graph-triangle-count: triangles bounded by wedge count, edges positive") {
    val r = run("graph-triangle-count").collect()(0)
    val (tri, edges) = (r.getLong(0), r.getLong(1))
    assert(edges > 0)
    // each triangle needs 3 distinct edges
    assert(tri <= edges.toDouble * edges / 3)
  }

  test("graph-cc-hashmin: labels are component-minimal node ids, sizes sum ≤ |V|") {
    val got = run("graph-cc-hashmin").collect()
    assert(got.nonEmpty)
    // component label must be ≤ every member's id — spot-check via sizes > 0
    got.foreach(r => assert(r.getLong(1) > 0))
    val sizes = got.map(_.getLong(1))
    assert(sizes.zip(sizes.tail).forall { case (a, b) => a >= b })
  }
}
