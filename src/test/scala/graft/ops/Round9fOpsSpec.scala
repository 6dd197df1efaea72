package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for round-9 batch F. */
class Round9fOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-ams-f2: exact F2 dominates first-moment bound and estimates are sane") {
    val r = run("agg-ams-f2").head()
    val exact = r.getAs[Long]("exact_f2")
    val n = Tables.lineitem(spark, sf).count()
    assert(exact >= n, "F2 >= F1 always")
    assert(r.getAs[Long]("est_mean") >= 0 && r.getAs[Long]("est_mom") >= 0)
    // 16 counters: expect within an order of magnitude, not tight
    assert(r.getAs[Long]("mean_err_ppm") < 2000000L)
  }

  test("agg-ols-normal-eq: coefficients match a driver-side exact BigInt solve") {
    val r = run("agg-ols-normal-eq").head()
    assert(r.getAs[Long]("n") == Tables.lineitem(spark, sf).count())
    val rows = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .select(col("l_quantity").cast("long"),
        floor(col("p_retailprice")).cast("long"),
        floor(col("l_extendedprice")).cast("long")).collect()
      .map(x => (BigInt(x.getLong(0)), BigInt(x.getLong(1)), BigInt(x.getLong(2))))
    val n = BigInt(rows.length)
    val s1 = rows.map(_._1).sum; val s2 = rows.map(_._2).sum; val sy = rows.map(_._3).sum
    val s11 = rows.map(t => t._1 * t._1).sum; val s22 = rows.map(t => t._2 * t._2).sum
    val s12 = rows.map(t => t._1 * t._2).sum
    val s1y = rows.map(t => t._1 * t._3).sum; val s2y = rows.map(t => t._2 * t._3).sum
    val a11 = n * s11 - s1 * s1; val a22 = n * s22 - s2 * s2; val a12 = n * s12 - s1 * s2
    val b1 = n * s1y - s1 * sy; val b2 = n * s2y - s2 * sy
    val det = a11 * a22 - a12 * a12
    val beta1 = (b1 * a22 - b2 * a12).toDouble / det.toDouble
    val beta2 = (b2 * a11 - b1 * a12).toDouble / det.toDouble
    assert(math.abs(r.getAs[Long]("beta1_micro") - math.floor(beta1 * 1e6).toLong) <= 1)
    assert(math.abs(r.getAs[Long]("beta2_micro") - math.floor(beta2 * 1e6).toLong) <= 1)
  }

  test("sink-inferred-member: zero orphans and the census matches the key arithmetic") {
    val rows = run("sink-inferred-member").collect()
    rows.foreach(r => assert(r.getAs[Long]("orphans_after") == 0L))
    val types = rows.map(r => r.getAs[String]("member_type") -> r.getAs[Long]("n_members")).toMap
    val totalSup = Tables.supplier(spark, sf).count()
    assert(types("original") == Tables.supplier(spark, sf)
      .filter(col("s_suppkey") % 13 =!= 0).count())
    assert(types.getOrElse("resolved", 0L) <= totalSup - types("original"))
    assert(!types.contains("inferred"), "all placeholders must be resolved")
  }

  test("sink-crypto-shred: erased users' payloads are unrecoverable, others intact") {
    val rows = run("sink-crypto-shred").collect()
    val expect = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("t"),
        sum(when(col("user_id") % 7 =!= 0, 1L).otherwise(0L)).as("d")).collect()
      .map(r => r.getAs[String]("event_type") -> (r.getAs[Long]("t"), r.getAs[Long]("d"))).toMap
    rows.foreach { r =>
      val (t, dd) = expect(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_total") == t)
      assert(r.getAs[Long]("n_decryptable") == dd,
        "decryptable set must be exactly the non-erased users")
    }
  }
}
