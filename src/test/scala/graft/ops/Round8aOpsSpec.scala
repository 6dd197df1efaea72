package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for round-8 batch A (oracle hash-compare
  * covers values; these pin the statistical/algebraic properties that
  * must survive any refactor). */
class Round8aOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-survival-km: survival is monotone non-increasing from <=1 and n_risk shrinks") {
    val rows = run("agg-survival-km").orderBy("t_days").collect()
    assert(rows.nonEmpty)
    val surv = rows.map(_.getAs[Double]("survival"))
    assert(surv.head <= 1.0 + 1e-9)
    assert(surv.zip(surv.tail).forall { case (a, b) => b <= a + 1e-9 },
      s"survival not monotone: ${surv.mkString(",")}")
    val risk = rows.map(_.getAs[Long]("n_risk"))
    assert(risk.zip(risk.tail).forall { case (a, b) => b <= a },
      "n_risk must be non-increasing in t")
    // every event row consumes at-risk mass
    assert(rows.forall(r => r.getAs[Long]("d_events") <= r.getAs[Long]("n_risk")))
  }

  test("agg-autocorrelation: acf bounded by 1 in magnitude, 7 lags present") {
    val rows = run("agg-autocorrelation").collect()
    assert(rows.map(_.getAs[Int]("lag")).toSet == (1 to 7).toSet)
    // Cauchy-Schwarz: |Σ c_t c_{t+k}| <= Σ c_t² — the floored ratio
    // stays within [-1, 1] up to the quantum
    assert(rows.forall(r => math.abs(r.getAs[Double]("acf")) <= 1.000001))
  }

  test("agg-changepoint-cusum: 5 ranked rows, |cusum| non-increasing with rank") {
    val rows = run("agg-changepoint-cusum").orderBy("rk").collect()
    assert(rows.length == 5)
    val mags = rows.map(r => math.abs(r.getAs[Long]("cusum_scaled")))
    assert(mags.zip(mags.tail).forall { case (a, b) => b <= a },
      s"rank order broken: ${mags.mkString(",")}")
  }

  test("agg-correlation-matrix: 6 pairs, all in [-1, 1], self-consistent scan") {
    val rows = run("agg-correlation-matrix").collect()
    assert(rows.length == 6)
    assert(rows.forall(r => math.abs(r.getAs[Double]("corr")) <= 1.0 + 1e-9))
    // all 6 unordered pairs of the 4 measures, each exactly once
    assert(rows.map(_.getAs[String]("pair")).toSet.size == 6)
  }

  test("dq-chi-square: contributions non-negative, observed counts partition the stream") {
    val df = run("dq-chi-square")
    val rows = df.collect()
    assert(rows.forall(_.getAs[Double]("chi2_contrib") >= 0.0))
    val total = rows.map(r => r.getAs[Long]("o1") + r.getAs[Long]("o2")).sum
    val n = Tables.events(spark, sf).count()
    assert(total == n, s"split counts $total != corpus $n")
  }

  test("graph-clustering-coeff: lcc in [0,1], triangle degrees feasible") {
    val rows = run("graph-clustering-coeff").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val deg = r.getAs[Long]("deg"); val tri = r.getAs[Long]("tri")
      val lcc = r.getAs[Double]("lcc")
      assert(lcc >= 0.0 && lcc <= 1.0)
      // a node's triangles cannot exceed C(deg, 2)
      assert(tri <= deg * (deg - 1) / 2, s"node ${r.get(0)}: tri=$tri deg=$deg")
    }
  }

  test("emb-assign-margin: margin in [0, 1e6) ppm and d1 is the nearer centroid") {
    val rows = run("emb-assign-margin").collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val m = r.getAs[Long]("margin_ppm"); m >= 0 && m < 1000000
    })
    assert(rows.forall(_.getAs[Long]("d1_q") >= 0))
  }

  test("sample-systematic: exact ceil(n/200) sample size across classes") {
    val rows = run("sample-systematic").collect()
    val sampled = rows.map(_.getAs[Long]("n_sampled")).sum
    val n = Tables.orders(spark, sf).count()
    assert(sampled == (n + 199) / 200,
      s"systematic sample $sampled != ceil($n/200)")
  }

  test("text-keyword-rake: scores are degree/freq and degree >= freq") {
    val rows = run("text-keyword-rake").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val deg = r.getAs[Long]("degree"); val f = r.getAs[Long]("freq")
      // every phrase containing w has length >= 1, so degree >= freq
      assert(deg >= f, s"${r.getAs[String]("word")}: degree $deg < freq $f")
      assert(r.getAs[Double]("score") >= 1.0 - 1e-9)
    }
    // ranking is by score desc
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => b <= a + 1e-9 })
  }
}
