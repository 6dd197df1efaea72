package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-8 batch AA (profiling family). */
class Round8rOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-german-tank: correction beats the naive sample max") {
    val r = run("agg-german-tank").head()
    assert(r.getAs[Long]("k_sample") > 0)
    // naive max underestimates by construction
    assert(r.getAs[Long]("naive_max_estimate") <= r.getAs[Long]("true_max"))
    assert(r.getAs[Long]("mvue_estimate") >= r.getAs[Long]("naive_max_estimate"))
    // at a 5% sample the MVUE should land within a few percent
    assert(math.abs(r.getAs[Double]("mvue_err_pct")) <=
      math.abs(r.getAs[Double]("naive_err_pct")) + 1.0)
  }

  test("dq-survivorship-bias: survivor share sane, means positive") {
    val r = run("dq-survivorship-bias").head()
    val share = r.getAs[Double]("survivor_share")
    assert(share > 0.0 && share <= 1.0)
    assert(r.getAs[Double]("mean_order_all_usd") > 0.0)
    assert(r.getAs[Double]("mean_order_survivors_usd") > 0.0)
  }

  test("dq-functional-dependency: the PK determinations hold, decoys fail") {
    val rows = run("dq-functional-dependency").collect()
    assert(rows.length == 5)
    val byName = rows.map(r => r.getAs[String]("candidate") -> r).toMap
    assert(byName("o_orderkey->o_custkey").getAs[Boolean]("fd_holds"))
    assert(byName("c_custkey->c_nationkey").getAs[Boolean]("fd_holds"))
    assert(!byName("c_nationkey->c_mktsegment").getAs[Boolean]("fd_holds"))
    rows.foreach { r =>
      val v = r.getAs[Double]("violation_share")
      assert(v >= 0.0 && v < 1.0)
      assert(r.getAs[Boolean]("fd_holds") == (v == 0.0))
    }
  }

  test("dq-inclusion-dependency: real FKs contained, decoy partial") {
    val rows = run("dq-inclusion-dependency").collect()
    assert(rows.length == 4)
    val byName = rows.map(r => r.getAs[String]("candidate") -> r).toMap
    assert(byName("lineitem.l_orderkey<=orders").getAs[Boolean]("is_inclusion"))
    assert(byName("orders.o_custkey<=customer").getAs[Boolean]("is_inclusion"))
    assert(byName("lineitem.l_suppkey<=supplier").getAs[Boolean]("is_inclusion"))
    rows.foreach { r =>
      val c = r.getAs[Double]("containment")
      assert(c >= 0.0 && c <= 1.0)
    }
  }
}
