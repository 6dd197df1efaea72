package graft.ops

import graft.olist.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-13 batch A invariants. */
class Round13aOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-sketch-error-crossover: each sketch's measured error within its own bound") {
    val rows = run("agg-sketch-error-crossover").collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      assert(r.getAs[Long]("dd_err_pm") <= r.getAs[Long]("dd_bound_pm"),
        s"DDSketch error above its relative bound: $r")
      // the equi-width bound is half a bucket width relative to the
      // exact value; +1 absorbs the permille floor-division truncation
      assert(r.getAs[Long]("eqw_err_pm") <= r.getAs[Long]("eqw_bound_pm") + 1,
        s"equi-width error above its absolute bound: $r")
    }
  }

  test("agg-sketch-error-crossover: the crossover is structural — dd bound wins low, eqw bound wins high") {
    val rows = run("agg-sketch-error-crossover").collect()
      .map(r => r.getAs[Long]("q_pm") ->
        (r.getAs[Long]("eqw_bound_pm"), r.getAs[Long]("dd_bound_pm"))).toMap
    // at p1 the fixed width is a huge fraction of a small order value
    val (eqwLo, ddLo) = rows(10L)
    assert(ddLo < eqwLo, s"DDSketch bound must win the low tail: dd=$ddLo eqw=$eqwLo")
    // at p99 the same width is a sliver of a large value
    val (eqwHi, ddHi) = rows(990L)
    assert(eqwHi < ddHi, s"equi-width bound must win the high tail: dd=$ddHi eqw=$eqwHi")
  }

  test("agg-sketch-error-crossover: bucket budgets are the same order (fair comparison)") {
    val r = run("agg-sketch-error-crossover").head
    val eqw = r.getAs[Long]("n_buckets_eqw")
    val dd = r.getAs[Long]("n_buckets_dd")
    assert(eqw > 0 && dd > 0 && eqw < dd * 4 && dd < eqw * 4,
      s"bucket budgets diverge: eqw=$eqw dd=$dd")
  }

  test("cc doubling: hashMinPerChunk width never changes the converged labeling") {
    // chunk granularity is a performance knob only — any fixpoint of
    // the combined operator is a hash-min fixpoint (min-id labels)
    val li = Tables.lineitem(spark, sf).filter(col("l_orderkey") % 23 === 0)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val pairs = li.as("a").join(li.as("b"), Seq("ok"))
      .filter(col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v")).distinct()
    val nodes = li.select(col("pk").as("node")).distinct()
    val edges = pairs.select(col("u").as("src"), col("v").as("dst"))
      .union(pairs.select(col("v").as("src"), col("u").as("dst")))
      .union(nodes.select(col("node").as("src"), col("node").as("dst")))
    val init = nodes.select(col("node"), col("node").as("lbl"))
    val narrow = CcDoubling.converge(edges, init, 12, "spec", hashMinPerChunk = 1)
    val wide = CcDoubling.converge(edges, init, 12, "spec", hashMinPerChunk = 3)
    assert(narrow.except(wide).isEmpty && wide.except(narrow).isEmpty)
  }

  test("emb-lof-ivf: probe really shrinks the candidate set and ranks stay well-formed") {
    val rows = run("emb-lof-ivf").collect()
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to 10L))
    rows.foreach { r =>
      // nprobe/cells = 2/8 must score a strict fraction of the pairs —
      // the measured claim that makes the IVF path a scale path at all
      val frac = r.getAs[Long]("cand_frac_pm")
      assert(frac > 0 && frac < 600, s"candidate fraction out of range: $frac")
      assert(r.getAs[Double]("lof_ivf") > 0.0, r)
    }
  }

  test("emb-lof-ivf: grading flags agree with an independently computed exact top-10") {
    val ivf = run("emb-lof-ivf").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("in_exact_top10")).toMap
    val exact = run("emb-lof").collect().map(_.getAs[Long]("vec_id")).toSet
    ivf.foreach { case (v, flagged) =>
      assert(flagged == exact.contains(v),
        s"vec $v: flag $flagged but exact-top membership ${exact.contains(v)}")
    }
  }

  test("GenerationStore.read: corrupt manifest fails loudly with the path named") {
    val root = java.nio.file.Files.createTempDirectory("genstore-spec").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(root, "manifest.json"), """{"gen":"gen-""")
    val e = intercept[IllegalStateException] { GenerationStore.read(root) }
    assert(e.getMessage.contains(root) && e.getMessage.contains("corrupt"))
  }
}
