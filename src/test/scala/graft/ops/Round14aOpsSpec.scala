package graft.ops

import graft.olist.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-14 batch A invariants: the IVF mutual-NN grade, the
  * emb-lof-ivf recall CONTRACT (r13 verdict item 6 — a floor the
  * suite enforces, not just a column the output carries), and the
  * hardened storedOnce publish protocol (r13 advice items 1-2). */
class Round14aOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("IVF candidate-edge recall@10 floor — the density family's candidate-generation contract") {
    // The contract grades the metric that actually measures candidate
    // generation: the fraction of exact top-10 kNN EDGES the 2/8-cell
    // IVF probe recovers. Measured on this fixture (500 vectors):
    // 425 pm, and 433 pm at sf0.1's 2000 vectors (DuckDB cross-check,
    // r14) — scale-stable, as the two-tier geometry predicts. The
    // canonical degradation (a dropped probe: nprobe 2 -> 1) measures
    // 250 pm, so floor 330 pm separates healthy from broken with
    // ~±25% margin on each side. (The LOF TOP-10 SET overlap is NOT
    // the contract metric: LOF ranks distort under candidate
    // truncation — this fixture measures 1/10 set survival at a
    // healthy 425 pm edge recall — so asserting on it would grade
    // LOF's sensitivity, not the probe.)
    import graft.ops.RelMore168.{ivfIndex, ivfKnnEdges, knnExactStored}
    val ix = ivfIndex(spark, sf)
    val ivf = ivfKnnEdges(ix, 10).select("i", "j")
    val exact = knnExactStored(spark, sf).filter(col("rk") <= 10).select("i", "j")
    val total = exact.count()
    val common = ivf.join(exact, Seq("i", "j")).count()
    val recallPm = common * 1000 / total
    assert(recallPm >= 330,
      s"IVF candidate recall collapsed: $common/$total exact top-10 edges " +
        s"($recallPm pm) survive the 2/8-cell probe — floor 330 pm " +
        s"(healthy 425 pm, dropped-probe mode 250 pm)")
    // and the graded output still carries the per-row survival flags
    val rows = run("emb-lof-ivf").collect()
    assert(rows.length == 10 && rows.forall(r =>
      r.schema.fieldNames.contains("in_exact_top10")))
  }

  test("emb-kdist-elbow-ivf: IVF curve is an upper envelope with bounded inflation") {
    // Directional contract: candidate truncation can only push a
    // point's apparent 5th-NN farther, so with equal curve populations
    // (this fixture: all 500 vectors keep >= 5 IVF candidates) every
    // decile satisfies ivf >= exact. Measured inflation 25-50 pm,
    // monotone-ish toward the tail; ceiling 150 pm leaves 3x headroom —
    // a broken probe (wrong cell join, dropped candidates) inflates the
    // tail deciles far past it.
    val rows = run("emb-kdist-elbow-ivf").collect()
    assert(rows.map(_.getAs[Int]("decile")).toSeq == (1 to 10))
    rows.foreach { r =>
      val ex = r.getAs[Long]("kdist_exact_milli")
      val iv = r.getAs[Long]("kdist_ivf_milli")
      val err = r.getAs[Long]("err_pm")
      assert(iv >= ex, s"decile ${r.getAs[Int]("decile")}: IVF k-dist $iv " +
        s"below exact $ex — impossible under candidate truncation")
      assert(err <= 150, s"decile ${r.getAs[Int]("decile")}: inflation " +
        s"$err pm past the 150 pm ceiling (measured band 25-50)")
    }
  }

  test("emb-mutual-nn-ivf: well-formed grade — ranks, monotone distances, sane counts") {
    val rows = run("emb-mutual-nn-ivf").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to rows.length).map(_.toLong))
    val dists = rows.map(_.getAs[Double]("distance"))
    assert(dists.zip(dists.tail).forall { case (a, b) => a <= b },
      s"top list not sorted by distance: ${dists.mkString(",")}")
    val r0 = rows.head
    val recall = r0.getAs[Long]("recall_pm")
    assert(recall > 0 && recall <= 1000, s"recall_pm out of range: $recall")
    val frac = r0.getAs[Long]("cand_frac_pm")
    assert(frac > 0 && frac < 600, s"candidate fraction out of range: $frac")
    assert(r0.getAs[Long]("n_mutual_ivf") >= rows.length)
  }

  test("emb-mutual-nn-ivf: per-pair flags agree with an independently computed exact mutual set") {
    val nn = RelMore168.knnExactStored(spark, sf).filter(col("rk") === 1)
      .select("i", "j")
    val exactMutual = nn.as("x").join(nn.as("y"),
        expr("x.i = y.j AND x.j = y.i AND x.i < x.j"))
      .select(col("x.i"), col("x.j")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    run("emb-mutual-nn-ivf").collect().foreach { r =>
      val pair = (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))
      assert(r.getAs[Boolean]("in_exact_mutual") == exactMutual.contains(pair),
        s"pair $pair: flag disagrees with exact mutual membership")
    }
  }

  test("dq-l-diversity: entropy-l never exceeds distinct-l and flags the k-anon blind spot") {
    val rows = run("dq-l-diversity").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      val dl = r.getAs[Long]("distinct_l")
      val le = r.getAs[Double]("l_ent")
      // 2^H <= number of support points, with equality iff uniform —
      // the inequality IS the op's reason to exist (distinct-l
      // overstates protection on lopsided groups)
      assert(le <= dl + 1e-9, s"l_ent $le exceeds distinct_l $dl")
      assert(le >= 1.0 - 1e-9, s"l_ent $le below 1 is impossible")
    }
  }

  test("dq-t-closeness: tv_pm is an exact-integer distance inside [0, 1000]") {
    val rows = run("dq-t-closeness").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val tvs = rows.map(_.getAs[Long]("tv_pm"))
    assert(tvs.forall(t => t >= 0 && t <= 1000), s"tv out of range: ${tvs.mkString(",")}")
    assert(tvs.zip(tvs.tail).forall { case (a, b) => a >= b }, "worst-10 not sorted desc")
    val r0 = rows.head
    assert(r0.getAs[Long]("n_groups") >= r0.getAs[Long]("n_groups_above_t200"))
  }

  test("storedOnce: a lost publish race reads the winner and removes its own staging") {
    val root = java.nio.file.Files.createTempDirectory("storedonce-spec").toString
    val dir = root + "/store"
    val out = Tables.storedOnce(spark, dir) { tmpDir =>
      // simulate a concurrent winner: by the time this builder tries to
      // publish, the final dir already exists with complete content
      spark.range(3).toDF("winner").write.parquet(dir)
      spark.range(5).toDF("loser").write.parquet(tmpDir)
    }
    assert(out.columns.toSeq == Seq("winner") && out.count() == 3,
      "loser must read the winner's store, not its own staging")
    val leftover = new java.io.File(root).listFiles().map(_.getName)
      .filter(_.startsWith("store.building"))
    assert(leftover.isEmpty, s"staging dirs leaked: ${leftover.mkString(",")}")
  }

  test("storedOnce: a publish failure with no winner fails loudly, not with a missing-path read") {
    val root = java.nio.file.Files.createTempDirectory("storedonce-spec2").toString
    val dir = root + "/store"
    val e = intercept[IllegalStateException] {
      Tables.storedOnce(spark, dir) { _ => () } // never writes its staging dir
    }
    assert(e.getMessage.contains(dir) && e.getMessage.contains("publish"),
      s"error must name the store and the failed publish: ${e.getMessage}")
  }

  test("storedOnce: concurrent builders with distinct staging dirs never corrupt the store") {
    // the r13 advice scenario: two in-process builders racing; with the
    // per-attempt suffix each stages privately and exactly one publishes
    val root = java.nio.file.Files.createTempDirectory("storedonce-spec3").toString
    val dir = root + "/store"
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val results = Await.result(
      Future.sequence((1 to 4).map { _ =>
        Future(Tables.storedOnce(spark, dir) { tmpDir =>
          spark.range(7).toDF("c").write.parquet(tmpDir)
        }.count())
      }), 120.seconds)
    assert(results.forall(_ == 7L))
    assert(spark.read.parquet(dir).count() == 7L)
  }
}
