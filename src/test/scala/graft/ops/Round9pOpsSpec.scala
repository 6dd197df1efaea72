package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for round-9 batch P. */
class Round9pOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("text-readability: syllables <= letters, pseudo-sentence count consistent") {
    val rows = run("text-readability").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, syl, sent) = (r.getAs[Long]("words"),
        r.getAs[Long]("syllables"), r.getAs[Long]("sentences"))
      assert(syl >= 1 && syl <= w * 10, "vowel-group count per word is small")
      assert(sent >= 1 && sent <= w, "ceil(words/15) sentences")
      assert(!r.getAs[Double]("flesch").isNaN)
    }
  }

  test("dq-null-correlation: phi coefficients are valid correlations") {
    val r = run("dq-null-correlation").head()
    Seq("phi_value_user", "phi_value_props", "phi_user_props").foreach { c =>
      val v = r.getAs[Double](c)
      assert(v >= -1.0 && v <= 1.0, s"$c = $v outside [-1, 1]")
    }
    assert(r.getAs[Long]("miss_value") > 0, "the value<1 indicator fires on the fixture")
  }

  test("sink-branch-merge: merge preserves total rows and applies both branches") {
    val rows = run("sink-branch-merge").collect()
    val orders = Tables.orders(spark, sf)
    val total = orders.count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_merged") == total,
        "updates replace, inserts add: merged row count equals the source")
    }
    val byStatus = rows.map(r => r.getAs[String]("o_orderstatus") -> r.getAs[Long]("n_rows")).toMap
    assert(byStatus.contains("A") && byStatus.contains("B"),
      "both branches' status rewrites survive the merge")
    assert(byStatus.values.sum == total)
  }

  test("graph-closeness-centrality: one row per seed, harmonic sum bounded by reach") {
    val rows = run("graph-closeness-centrality").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val reached = r.getAs[Long]("n_reached")
      val h = r.getAs[Long]("harmonic_e6")
      // every reached node contributes between 1/3 and 1/1 (in 1e6 units)
      assert(h >= reached * (1000000L / 3) && h <= reached * 1000000L)
    }
  }
}
