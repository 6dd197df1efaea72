package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for round-9 batch L. */
class Round9lOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-psm-match: every treated user with a control neighbor is matched") {
    val r = run("agg-psm-match").head()
    val treated = Tables.events(spark, sf).select("user_id").distinct()
      .filter(col("user_id") % 2 === 1).count()
    assert(r.getAs[Long]("n_matched") == treated,
      "with controls present on the score axis, all treated match")
    assert(r.getAs[Long]("att_milli") ==
      r.getAs[Long]("mean_treated_milli") - r.getAs[Long]("mean_matched_ctrl_milli")
      || math.abs(r.getAs[Long]("att_milli") -
        (r.getAs[Long]("mean_treated_milli") - r.getAs[Long]("mean_matched_ctrl_milli"))) <= 2)
  }

  test("dedup-chunk-stitch: the detector recovers every constructed seam") {
    val r = run("dedup-chunk-stitch").head()
    assert(r.getAs[Boolean]("detector_exact"),
      s"detected ${r.getAs[Long]("detected_seams")} != expected ${r.getAs[Long]("expected_seams")}")
    assert(r.getAs[Long]("detected_seams") > 0, "fixture must produce chunkable docs")
  }

  test("agg-mutual-info: MI is non-negative and bounded by min marginal entropy") {
    val r = run("agg-mutual-info").head()
    val mi = r.getAs[Double]("mi_bits")
    assert(mi >= -1e-9, s"MI $mi negative")
    // |event types| = 5 → H(X) <= log2(5) ≈ 2.32 bounds MI
    assert(mi <= 2.33)
    assert(r.getAs[Long]("n_cells") <= 35)
  }

  test("expr-json-schema-infer: pinned schema and full parse coverage") {
    val r = run("expr-json-schema-infer").head()
    assert(r.getAs[String]("inferred_schema") == "STRUCT<k: BIGINT>")
    assert(r.getAs[Long]("n_null_k") == 0L, "every props payload must parse")
    assert(r.getAs[Long]("min_k") >= 0 && r.getAs[Long]("max_k") <= 99)
  }
}
