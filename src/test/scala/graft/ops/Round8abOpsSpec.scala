package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-8 batch AK. */
class Round8abOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-indirect-standardization: CIs bracket the SMR") {
    val rows = run("agg-indirect-standardization").collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      val (lo, smr, hi) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("smr"),
        r.getAs[Double]("ci_hi"))
      assert(lo <= smr + 1e-6 && smr <= hi + 1e-6)
      assert(r.getAs[Boolean]("significant") == (lo > 1.0 || hi < 1.0))
    }
  }

  test("agg-life-table: survivors fall, hazards valid") {
    val rows = run("agg-life-table").collect()
    assert(rows.length == 5)
    val sorted = rows.sortBy(_.getAs[Int]("tenure_month"))
    val lx = sorted.map(_.getAs[Double]("lx_per_million"))
    assert(math.abs(lx.head - 1e6) < 1.0)
    assert(lx.zip(lx.tail).forall { case (a, b) => b <= a })
    sorted.foreach { r =>
      val q = r.getAs[Double]("qx")
      assert(q >= 0.0 && q <= 1.0)
      assert(r.getAs[Double]("ex_months") >= 1.0)
    }
  }

  test("dq-k-anonymity: thresholds nest") {
    val r = run("dq-k-anonymity").head()
    assert(r.getAs[Long]("min_group") >= 1L)
    val (k2, k5, k10) = (r.getAs[Double]("below_k2"),
      r.getAs[Double]("below_k5"), r.getAs[Double]("below_k10"))
    assert(k2 <= k5 + 1e-9 && k5 <= k10 + 1e-9)
    val l = r.getAs[Double]("l_diversity_fail_share")
    assert(l >= 0.0 && l <= 1.0)
  }

  test("agg-kitagawa-decomposition: effects close exactly") {
    val r = run("agg-kitagawa-decomposition").head()
    assert(math.abs(r.getAs[Double]("closure_gap_usd")) < 0.01)
  }
}
