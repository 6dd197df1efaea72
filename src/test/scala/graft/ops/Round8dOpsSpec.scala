package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for round-8 batch D. */
class Round8dOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("sql-select-except: excluded columns are gone, kept ones remain") {
    val df = run("sql-select-except")
    assert(df.columns.toSet ==
      Set("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"))
    assert(!df.columns.contains("o_custkey"))
  }

  test("agg-log2-histogram: bucket bounds bracket the doc lengths, counts partition corpus") {
    val rows = run("agg-log2-histogram").collect()
    rows.foreach { r =>
      val b = r.getAs[Int]("bucket")
      val lo = 1L << (b - 1); val hi = (1L << b) - 1
      assert(r.getAs[Long]("min_chars") >= lo && r.getAs[Long]("max_chars") <= hi,
        s"bucket $b: [${r.getAs[Long]("min_chars")}, ${r.getAs[Long]("max_chars")}] outside [$lo, $hi]")
    }
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables.documents(spark, sf).count())
  }

  test("agg-markov-stationary: mass conserved up to ppm floor loss") {
    val rows = run("agg-markov-stationary").collect()
    assert(rows.nonEmpty)
    val mass = rows.map(_.getAs[Long]("v_ppm")).sum
    // each of 5 iterations floors once per state: mass can only leak
    // downward, bounded by states * iterations ppm
    assert(mass <= 1000000L)
    assert(mass >= 1000000L - rows.length * 6L,
      s"stationary mass $mass leaked more than floor() can explain")
  }

  test("emb-centroid-drift: every label has both halves and non-negative displacement") {
    val rows = run("emb-centroid-drift").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_a") > 0 && r.getAs[Long]("n_b") > 0)
      assert(r.getAs[Long]("disp2_q") >= 0)
    }
  }
}
