package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for round-9 batch A. */
class Round9aOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("sample-group-split: zero leaked sources and full corpus coverage") {
    val rows = run("sample-group-split").collect()
    assert(rows.nonEmpty && rows.length <= 3)
    rows.foreach(r => assert(r.getAs[Long]("leak_sources") == 0L))
    val totalDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(totalDocs == Tables.documents(spark, sf).count())
    val totalSources = rows.map(_.getAs[Long]("n_sources")).sum
    val direct = Tables.documents(spark, sf).select("source").distinct().count()
    assert(totalSources == direct, "each source must land in exactly one split")
  }

  test("join-pit-multifeature: features are strictly prior and spine count is preserved") {
    val out = run("join-pit-multifeature")
    val rows = out.collect()
    val spine = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .join(Tables.customer(spark, sf),
        col("user_id") === col("c_custkey"))
      .count()
    assert(rows.length == spine, "PIT join must not drop or fan out spine rows")
    // a user's first event of all three types has no prior view
    assert(rows.forall(_.getAs[Long]("prior_errors") >= 0L))
    // prior_errors is monotone per user over event ordering
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.values.foreach { rs =>
      val errs = rs.sortBy(_.getAs[Long]("event_id")).map(_.getAs[Long]("prior_errors"))
      // not strictly monotone in event_id order (ts order differs), but all bounded
      assert(errs.forall(_ <= Tables.events(spark, sf).filter(col("event_type") === "error").count()))
    }
  }

  test("dq-cohens-kappa: kappa <= po and cells partition the corpus") {
    val r = run("dq-cohens-kappa").head()
    val n = r.getAs[Long]("a") + r.getAs[Long]("b") + r.getAs[Long]("c") + r.getAs[Long]("d")
    assert(n == Tables.documents(spark, sf).count())
    val po = r.getAs[Double]("po"); val pe = r.getAs[Double]("pe")
    val kappa = r.getAs[Double]("kappa")
    assert(po >= 0 && po <= 1 && pe > 0 && pe < 1)
    assert(kappa <= po + 1e-9, "chance correction can only lower agreement")
  }

  test("text-filter-sweep: retention is monotone non-increasing and threshold 0 keeps all") {
    val rows = run("text-filter-sweep").collect().sortBy(_.getAs[Int]("min_tokens"))
    assert(rows.length == 6)
    val all = Tables.documents(spark, sf).count()
    assert(rows.head.getAs[Int]("min_tokens") == 0 &&
      rows.head.getAs[Long]("docs_retained") == all)
    val docs = rows.map(_.getAs[Long]("docs_retained"))
    val toks = rows.map(_.getAs[Long]("tokens_retained"))
    assert(docs.zip(docs.tail).forall { case (x, y) => y <= x })
    assert(toks.zip(toks.tail).forall { case (x, y) => y <= x })
  }
}
