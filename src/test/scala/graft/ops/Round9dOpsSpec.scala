package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for round-9 batch D. */
class Round9dOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("text-mix-budget: allocations respect the 2-epoch cap and never exceed budget") {
    val rows = run("text-mix-budget").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("allocated") <= 2 * r.getAs[Long]("tokens"),
        s"${r.getAs[String]("source")} exceeds its epoch cap")
      assert(r.getAs[Double]("epochs") <= 2.0 + 1e-9)
    }
    val total = rows.map(_.getAs[Long]("tokens")).sum
    val allocated = rows.map(_.getAs[Long]("allocated")).sum
    assert(allocated <= total / 2, "allocation must not exceed the budget")
    // the waterfall should spend nearly the whole budget (floor slack only)
    assert(allocated >= total / 2 - 2L * rows.length * 2)
  }

  test("join-asof-tolerance: status partitions purchases and fresh implies a click") {
    val rows = run("join-asof-tolerance").collect()
    val purchases = Tables.events(spark, sf).filter(col("event_type") === "purchase").count()
    assert(rows.length == purchases)
    rows.foreach { r =>
      r.getAs[String]("status") match {
        case "fresh" =>
          assert(r.getAs[Any]("click_id") != null)
          val g = r.getAs[Long]("gap_hours"); assert(g >= 0 && g < 48)
        case "stale" | "missing" =>
          assert(r.getAs[Any]("click_id") == null && r.getAs[Any]("gap_hours") == null)
        case other => fail(s"unknown status $other")
      }
    }
  }

  test("mm-aspect-bucket: bucketed padding never beats real pixels nor loses to naive") {
    val rows = run("mm-aspect-bucket").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("bucket_pad_waste") >= 0)
      assert(r.getAs[Long]("bucket_pad_waste") <= r.getAs[Long]("naive_pad_waste"),
        "padding to the bucket max can never waste more than the global square")
    }
    val n = rows.map(_.getAs[Long]("n_images")).sum
    assert(n == Tables.documents(spark, sf).count())
  }

  test("agg-bayes-smooth: smoothing shrinks toward the global rate") {
    val rows = run("agg-bayes-smooth").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val raw = r.getAs[Long]("raw_ppm"); val sm = r.getAs[Long]("smooth_ppm")
      val g = r.getAs[Long]("global_ppm")
      // smoothed value lies between raw and global (floor slack ±1)
      assert(sm >= math.min(raw, g) - 1 && sm <= math.max(raw, g) + 1,
        s"brand ${r.getAs[String]("p_brand")}: $sm outside [$raw, $g]")
    }
  }
}
