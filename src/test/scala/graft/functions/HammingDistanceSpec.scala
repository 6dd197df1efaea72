package graft.functions

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

class HammingDistanceSpec extends SparkTestBase {

  test("known values, null handling, codegen path") {
    HammingDistance.register(spark)
    import spark.implicits._
    val df = Seq(
      ("10110", "10011", 2),
      ("0000", "1111", 4),
      ("abc", "abc", 0))
      .toDF("a", "b", "want")
      .withColumn("got", expr("hamming_distance(a, b)"))
    assert(df.filter(col("got") =!= col("want")).count() == 0)
    val withNull = Seq(("ab", null.asInstanceOf[String])).toDF("a", "b")
      .select(expr("hamming_distance(a, b)").as("h"))
    assert(withNull.head.isNullAt(0))
  }

  test("unequal lengths fail loudly, wrong types fail at analysis") {
    HammingDistance.register(spark)
    val lenErr = intercept[Exception] {
      spark.sql("SELECT hamming_distance('ab', 'abc')").collect()
    }
    assert(lenErr.getMessage.contains("equal-length"))
    val typeErr = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT hamming_distance(1, 2)").collect()
    }
    assert(typeErr.getMessage.contains("string"))
  }

  test("pigeonhole property of the 4-chunk LSH: hamming<=3 pairs share a chunk") {
    // structural guarantee the dedup-simhash-pairs candidates rely on
    val rnd = new scala.util.Random(11)
    (1 to 200).foreach { _ =>
      val a = Array.fill(64)(if (rnd.nextBoolean()) '1' else '0')
      val b = a.clone()
      val flips = rnd.nextInt(4) // 0..3 flips
      (1 to flips).foreach(_ => { val i = rnd.nextInt(64); b(i) = if (b(i) == '0') '1' else '0' })
      val shared = (0 until 4).exists(c =>
        new String(a, c * 16, 16) == new String(b, c * 16, 16))
      assert(shared, s"pair with <=3 flips must share a 16-bit chunk")
    }
  }
}
