package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-9 batch Q. */
class Round9qOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-auc-exact: AUC in [0,1] and class counts partition the events") {
    val r = run("agg-auc-exact").head()
    val auc = r.getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0)
    assert(r.getAs[Long]("n_pos") + r.getAs[Long]("n_neg") ==
      Tables.events(spark, sf).count())
  }

  test("agg-calibration-ece: ECE is the mass-weighted mean gap") {
    val rows = run("agg-calibration-ece").collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getAs[Long]("n_users")).sum
    val weighted = rows.map(r => r.getAs[Long]("n_users") * r.getAs[Long]("gap_ppm")).sum / n
    rows.foreach { r =>
      assert(r.getAs[Long]("ece_ppm") == weighted)
      assert(r.getAs[Long]("n_total") == n)
      assert(r.getAs[Long]("acc_ppm") >= 0 && r.getAs[Long]("acc_ppm") <= 1000000)
    }
  }

  test("agg-hodges-lehmann: HL sits within the daily-count range") {
    val r = run("agg-hodges-lehmann").head()
    val k = r.getAs[Long]("n_days")
    assert(r.getAs[Long]("n_pairs") == k * (k + 1) / 2)
    val daily = Tables.events(spark, sf)
      .groupBy(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("ts"))).count()
      .collect().map(_.getAs[Long]("count"))
    assert(r.getAs[Double]("hl_estimate") >= daily.min)
    assert(r.getAs[Double]("hl_estimate") <= daily.max)
  }

  test("mm-scene-cut: scene partition is consistent per video") {
    val rows = run("mm-scene-cut").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val frames = r.getAs[Long]("n_frames")
      val cuts = r.getAs[Long]("n_cuts")
      assert(cuts >= 0 && cuts < frames, "cuts split frames into cuts+1 scenes")
      assert(r.getAs[Long]("longest_scene") >= frames / (cuts + 1),
        "longest scene is at least the average")
    }
  }
}
