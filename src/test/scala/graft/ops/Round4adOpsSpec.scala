package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for batch X (Lorenz, winsorize, bridge
  * allocation). */
class Round4adOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-lorenz-curve: both cumulative shares monotone, ending at ~1e6") {
    val got = run("agg-lorenz-curve").collect()
    assert(got.length == 10)
    val cust = got.map(_.getLong(2)); val rev = got.map(_.getLong(3))
    assert(cust.zip(cust.tail).forall { case (a, b) => a <= b })
    assert(rev.zip(rev.tail).forall { case (a, b) => a <= b })
    assert(cust.last >= 999999L && rev.last >= 999999L)
    // Lorenz dominance: revenue share never exceeds customer share
    got.foreach(r => assert(r.getLong(3) <= r.getLong(2)))
  }

  test("win-winsorize: bounds ordered, winsorized sum within clamp range") {
    val got = run("win-winsorize").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (n, p05, p95, wsum) = (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(p05 <= p95)
      assert(wsum >= p05 * n && wsum <= p95 * n)
    }
  }

  test("join-bridge-alloc: per-order allocation sums to ~1e6 each") {
    val total = run("join-bridge-alloc").agg(sum("alloc_ppm_sum")).collect()(0).getLong(0)
    val nOrders = Tables.lineitem(spark, sf).select("l_orderkey").distinct().count()
    // each order allocates <= 1e6 ppm, floor dust < lines-per-order each
    assert(total <= nOrders * 1000000L)
    assert(total > nOrders * 999000L)
  }
}
