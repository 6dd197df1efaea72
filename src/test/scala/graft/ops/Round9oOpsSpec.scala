package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-9 batch O. */
class Round9oOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("sample-bootstrap-ci: CI brackets both means, SE positive") {
    val r = run("sample-bootstrap-ci").head()
    assert(r.getAs[Long]("b_reps") == 32)
    assert(r.getAs[Double]("boot_se") > 0)
    assert(r.getAs[Double]("ci_lo") < r.getAs[Double]("point_mean"))
    assert(r.getAs[Double]("ci_hi") > r.getAs[Double]("point_mean"))
    // Poisson(1) resampling keeps the bootstrap mean near the point mean
    val rel = math.abs(r.getAs[Double]("boot_mean") - r.getAs[Double]("point_mean")) /
      r.getAs[Double]("point_mean")
    assert(rel < 0.05, s"bootstrap mean drifted $rel from the point mean")
  }

  test("emb-intrinsic-dim: estimate is positive and at most the ambient dim") {
    val r = run("emb-intrinsic-dim").head()
    assert(r.getAs[Long]("n_used") > 0)
    assert(r.getAs[Double]("sum_log_mu") > 0, "r2 >= r1 so every ln mu >= 0")
    val id = r.getAs[Double]("id_twonn")
    assert(id > 0 && id <= 64.0, s"TwoNN estimate $id outside (0, 64]")
  }

  test("func-csv-suite: every row round-trips and the schema is inferred") {
    val rows = run("func-csv-suite").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("roundtrip_ok"))
      assert(r.getAs[String]("csv").split(",").length == 3)
      assert(r.getAs[String]("kv_keys") == "key|status")
      assert(r.getAs[String]("inferred_schema_kind").startsWith("STRUCT<"))
    }
  }

  test("agg-trimmed-mean: trimmed and winsorized sit inside the raw spread") {
    val r = run("agg-trimmed-mean").head()
    val n = r.getAs[Long]("n")
    assert(r.getAs[Long]("n_kept") == n - 2 * (n / 10))
    // right-skewed order values: robustifying the tails pulls the mean down
    assert(r.getAs[Double]("mean_trim10") < r.getAs[Double]("mean_raw"))
    assert(r.getAs[Double]("mean_winsor10") < r.getAs[Double]("mean_raw"))
    assert(r.getAs[Double]("mean_winsor10") > 0)
  }
}
