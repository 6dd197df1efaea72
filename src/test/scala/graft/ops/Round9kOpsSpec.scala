package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for round-9 batch K. */
class Round9kOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-diff-in-diff: DiD equals the four cell means' double difference") {
    val r = run("agg-diff-in-diff").head()
    val did = (r.getAs[Long]("mean_treat_post_milli") - r.getAs[Long]("mean_treat_pre_milli")) -
      (r.getAs[Long]("mean_ctrl_post_milli") - r.getAs[Long]("mean_ctrl_pre_milli"))
    // floored cell means vs exact rational DiD: allow the 4-floor slack
    assert(math.abs(r.getAs[Long]("did_milli") - did) <= 4,
      s"did ${r.getAs[Long]("did_milli")} vs cells $did")
  }

  test("agg-target-encode-loo: positive encoding below naive below negative") {
    val rows = run("agg-target-encode-loo").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pos = r.getAs[Long]("enc_pos_ppm"); val neg = r.getAs[Long]("enc_neg_ppm")
      val naive = r.getAs[Long]("naive_ppm")
      assert(pos <= naive + 1 && naive <= neg + 1,
        s"${r.getAs[String]("p_brand")}: LOO ordering violated ($pos, $naive, $neg)")
      assert(r.getAs[Long]("leakage_gap_ppm") >= 0)
    }
  }

  test("emb-hard-negatives: one hard negative per sampled anchor, labels differ") {
    val rows = run("emb-hard-negatives").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("anchor_label") != r.getAs[Int]("hard_label"))
      assert(r.getAs[Long]("min_d2q") >= 0)
      assert(r.getAs[Long]("mean_d2q") >= r.getAs[Long]("min_d2q"))
    }
    val sampled = Tables.embeddings(spark, sf)
      .filter(substring(md5(concat(lit("hn#"), col("vec_id").cast("string"))), 1, 1) === "0")
      .count()
    assert(rows.map(_.getAs[Long]("n_anchors")).sum == sampled,
      "every sampled anchor gets exactly one hard negative")
  }

  test("sample-post-stratify: estimates within sane error, weights preserve population") {
    val rows = run("sample-post-stratify").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_samp") <= r.getAs[Long]("n_pop"))
      // the estimator's weighted count equals the population by construction:
      // est_total scales sample total by N/n — just sanity-bound the error
      val err = r.getAs[Any]("err_ppm")
      if (err != null) assert(err.asInstanceOf[Long] < 5000000L)
    }
  }
}
