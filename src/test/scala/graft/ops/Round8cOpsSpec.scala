package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for round-8 batch C. */
class Round8cOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("sql-unpivot-clause: 4 metrics, counts equal the scan size") {
    val rows = run("sql-unpivot-clause").collect()
    assert(rows.map(_.getAs[String]("metric")).toSet ==
      Set("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    val n = Tables.lineitem(spark, sf).count()
    assert(rows.forall(_.getAs[Long]("n") == n))
    assert(rows.forall(r => r.getAs[Double]("min_v") <= r.getAs[Double]("max_v")))
  }

  test("agg-semi-additive-balance: open accounts and avg balance never shrink backwards") {
    val rows = run("agg-semi-additive-balance").orderBy("month").collect()
    assert(rows.nonEmpty)
    val opens = rows.map(_.getAs[Long]("n_open"))
    // accounts only ever open (no closure modeled): monotone non-decreasing
    assert(opens.zip(opens.tail).forall { case (a, b) => b >= a },
      s"open-account count shrank: ${opens.mkString(",")}")
    assert(rows.forall(_.getAs[Double]("avg_balance_cents") > 0))
  }

  test("text-novelty-curve: bucket 0 is fully novel and novelty stays in (0,1]") {
    val rows = run("text-novelty-curve").orderBy("bucket").collect()
    assert(rows.nonEmpty)
    assert(rows.head.getAs[Int]("bucket") == 0)
    assert(rows.head.getAs[Double]("novelty") == 1.0,
      "the first bucket has no prior corpus, everything in it is novel")
    assert(rows.forall { r =>
      val nv = r.getAs[Double]("novelty"); nv > 0.0 && nv <= 1.0 &&
        r.getAs[Long]("n_novel") <= r.getAs[Long]("n_shingles")
    })
  }

  test("agg-delta-method-var: se positive and finite, ratio equals revenue-per-order") {
    val rows = run("agg-delta-method-var").collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val se = r.getAs[Double]("se"); se >= 0.0 && !se.isNaN && !se.isInfinite
    })
    assert(rows.forall(_.getAs[Double]("ratio") > 0))
  }

  test("graph-assortativity: a single coefficient in [-1, 1]") {
    val rows = run("graph-assortativity").collect()
    assert(rows.length == 1)
    val a = rows.head.getAs[Double]("assortativity")
    assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9, s"assortativity $a")
    assert(rows.head.getAs[Long]("n_edge_ends") % 2 == 0,
      "directed edge ends come in mirror pairs")
  }

  test("agg-jackknife-se: 10 folds, se positive, mean matches direct computation") {
    val row = run("agg-jackknife-se").collect().head
    assert(row.getAs[Int]("k") == 10)
    assert(row.getAs[Double]("jk_se_cents") > 0)
    val direct = Tables.orders(spark, sf)
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")).as("s"),
        count(lit(1)).as("n")).head()
    val mean = math.floor(direct.getAs[Long]("s").toDouble * 100 /
      direct.getAs[Long]("n")) / 100
    assert(math.abs(row.getAs[Double]("mean_cents") - mean) < 0.01,
      s"${row.getAs[Double]("mean_cents")} vs $mean")
  }
}
