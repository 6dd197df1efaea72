package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-9 batch S. */
class Round9sOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("sink-changed-partition-export: exports exactly the changed partitions") {
    val rows = run("sink-changed-partition-export").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val changed = r.getAs[Boolean]("changed")
      val exported = r.getAs[Long]("n_exported")
      if (changed) assert(exported == r.getAs[Long]("n_rows"),
        "a changed partition re-exports all its rows")
      else assert(exported == 0, "an unchanged partition ships nothing")
      assert(changed == (r.getAs[Long]("ck1") != r.getAs[Long]("ck2")))
    }
    assert(rows.exists(_.getAs[Boolean]("changed")), "the %101 mutation touches some year")
  }

  test("emb-cluster-nmi: NMI within [0,1] and entropies positive") {
    val r = run("emb-cluster-nmi").head()
    assert(r.getAs[Double]("h_cluster") > 0 && r.getAs[Double]("h_label") > 0)
    val nmi = r.getAs[Double]("nmi")
    assert(nmi >= 0.0 && nmi <= 1.0, s"NMI $nmi outside [0,1]")
    assert(r.getAs[Long]("n_cells") <= 4 * 16, "at most |C|x|L| cells")
  }

  test("dq-schema-contract-enforce: all three violation classes fire") {
    val rows = run("dq-schema-contract-enforce").collect()
    val byStatus = rows.groupBy(_.getAs[String]("status")).view.mapValues(_.length).toMap
    assert(byStatus.getOrElse("ok", 0) >= 3)
    assert(byStatus.getOrElse("missing", 0) == 1, "o_comment is contracted but absent")
    assert(byStatus.getOrElse("type_mismatch", 0) == 1, "o_orderdate lands as timestamp")
    assert(byStatus.getOrElse("extra", 0) >= 1, "o_orderpriority is uncontracted")
  }

  test("agg-geo-mean-rate: growth bounds bracket the geometric mean") {
    val r = run("agg-geo-mean-rate").head()
    val g = r.getAs[Double]("geo_mean_growth")
    assert(g > 0)
    assert(g >= r.getAs[Double]("g_min") - 1e-9 || g <= r.getAs[Double]("g_max") + 1e-9)
    assert(r.getAs[Long]("n_days") > 1)
  }
}
