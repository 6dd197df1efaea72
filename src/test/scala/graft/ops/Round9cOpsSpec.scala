package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for round-9 batch C. */
class Round9cOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("win-islands: island mass equals distinct (user, date) rows") {
    val rows = run("win-islands").collect()
    assert(rows.nonEmpty)
    val mass = rows.map(r => r.getAs[Long]("len") * r.getAs[Long]("n_islands")).sum
    val direct = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("dt")).distinct().count()
    assert(mass == direct, "every active day must land in exactly one island")
    rows.foreach(r => assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n_islands")))
  }

  test("agg-welch-ttest: group sizes partition users and t2 is non-negative") {
    val r = run("agg-welch-ttest").head()
    val users = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").select("user_id").distinct().count()
    assert(r.getAs[Long]("n1") + r.getAs[Long]("n2") == users)
    assert(r.getAs[Long]("t2_milli") >= 0)
    val sig = r.getAs[Boolean]("significant")
    // gate must agree with the quantized statistic (3.8416 = 1.96²)
    assert(sig == (r.getAs[Long]("t2_milli") > 3841) ||
      math.abs(r.getAs[Long]("t2_milli") - 3841) <= 1)
  }

  test("dedup-bbit-minhash: estimators bounded and bit agreement >= slot agreement") {
    val rows = run("dedup-bbit-minhash").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ks = r.getAs[Int]("k_slots"); val kb = r.getAs[Int]("k_bits")
      assert(ks >= 0 && ks <= 12 && kb >= 0 && kb <= 12)
      // equal slots force equal bits: bit agreement dominates
      assert(kb >= ks, s"slot match implies bit match: k_bits $kb < k_slots $ks")
      assert(r.getAs[Int]("bbit_est_twelfths") >= 0)
    }
  }

  test("src-csv-gzip: staged files are gzip and the aggregate round-trips") {
    val rows = run("src-csv-gzip").collect()
    val direct = Tables.lineitem(spark, sf).groupBy("l_returnflag")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("n")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n") == direct(r.getAs[String]("l_returnflag")))
    }
    val dir = new java.io.File(Tables.tmp("src-csv-gzip", sf))
    val gz = dir.listFiles().filter(_.getName.endsWith(".csv.gz"))
    assert(gz.length == 8, s"expected 8 gzip parts for read parallelism, got ${gz.length}")
  }
}
