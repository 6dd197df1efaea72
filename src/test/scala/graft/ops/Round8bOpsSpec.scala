package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for round-8 batch B. */
class Round8bOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("win-seasonal-decompose: 7 weekday indices that sum to ~0") {
    val rows = run("win-seasonal-decompose").collect()
    assert(rows.map(_.getAs[Int]("dow_monday0")).toSet == (0 to 6).toSet)
    // seasonal components of an additive decomposition cancel: the
    // weighted sum over weekdays is the total detrended mass / 7,
    // which is ~0 for a centered MA (only edge asymmetry remains)
    val weighted = rows.map(r => r.getAs[Double]("seasonal") * r.getAs[Long]("n_days")).sum
    val totalDays = rows.map(_.getAs[Long]("n_days")).sum
    assert(math.abs(weighted / totalDays) < 1.0,
      s"seasonal indices do not cancel: weighted mean ${weighted / totalDays}")
  }

  test("agg-yoy-growth: every month has a 12-back base and growth > -1") {
    val rows = run("agg-yoy-growth").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("prev_cents") > 0)
      // revenue is positive, so (rev - prev)/prev > -1 always
      assert(r.getAs[Double]("yoy") > -1.0)
    }
  }

  test("win-drawdown: drawdowns non-negative and rank-ordered") {
    val rows = run("win-drawdown").orderBy("rk").collect()
    assert(rows.length == 5)
    val dds = rows.map(_.getAs[Long]("dd_scaled"))
    assert(dds.forall(_ >= 0))
    assert(dds.zip(dds.tail).forall { case (a, b) => b <= a })
  }

  test("dq-calendar-gaps: per-day missing minutes bounded by 1440 and consistent with corpus") {
    val rows = run("dq-calendar-gaps").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("missing_minutes") >= 0 &&
      r.getAs[Long]("missing_minutes") <= 1440))
    // total missing + observed slots == calendar span in minutes
    val ev = Tables.events(spark, sf)
    val bounds = ev.agg(expr("date_trunc('minute', min(ts))").as("lo"),
      expr("date_trunc('minute', max(ts))").as("hi")).head()
    val span = (bounds.getTimestamp(1).getTime - bounds.getTimestamp(0).getTime) / 60000 + 1
    val observed = ev.select(expr("date_trunc('minute', ts)")).distinct().count()
    val missing = rows.map(_.getAs[Long]("missing_minutes")).sum
    assert(observed + missing == span, s"$observed + $missing != $span")
  }

  test("win-rolling-zscore: top-10 by |z| descending") {
    val rows = run("win-rolling-zscore").orderBy("rk").collect()
    assert(rows.length == 10)
    val zs = rows.map(r => math.abs(r.getAs[Double]("z")))
    assert(zs.zip(zs.tail).forall { case (a, b) => b <= a + 1e-9 })
  }

  test("emb-knn-ood: candidates only, scores rank-ordered non-increasing") {
    val rows = run("emb-knn-ood").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.forall(_.getAs[Int]("label") >= 5))
    val ds = rows.map(_.getAs[Long]("knn5_dist_q"))
    assert(ds.zip(ds.tail).forall { case (a, b) => b <= a })
    assert(ds.forall(_ >= 0))
  }
}
