package graft.functions

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** The native expression must agree bit-for-bit with the reference fold
  * (the ann/dedup oracle math) in both interpreted and codegen paths. */
class CosineSimilaritySpec extends SparkTestBase {

  private def foldCos = expr(
    """aggregate(zip_with(a, b, (p, q) -> p * q), CAST(0 AS DOUBLE), (acc, z) -> acc + z) /
      |(sqrt(aggregate(transform(a, x -> x * x), CAST(0 AS DOUBLE), (acc, z) -> acc + z)) *
      | sqrt(aggregate(transform(b, x -> x * x), CAST(0 AS DOUBLE), (acc, z) -> acc + z)))""".stripMargin)

  test("matches the declarative fold bit-for-bit on random vectors") {
    CosineSimilarity.register(spark)
    val rnd = new scala.util.Random(42)
    val rows = (1 to 200).map { i =>
      (i, Array.fill(64)(rnd.nextDouble() * 2 - 1), Array.fill(64)(rnd.nextDouble() * 2 - 1))
    }
    import spark.implicits._
    val df = rows.toDF("id", "a", "b")
      .select(col("id"), foldCos.as("fold"), expr("cosine_similarity(a, b)").as("native"))
    val mismatches = df.filter(col("fold") =!= col("native")).count()
    assert(mismatches == 0)
  }

  test("known values and null handling") {
    CosineSimilarity.register(spark)
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 0.0), Array(0.0, 1.0)),   // orthogonal → 0
      (Array(1.0, 2.0), Array(2.0, 4.0)),   // parallel → 1
      (Array(1.0, 0.0), Array(-1.0, 0.0)))  // opposite → -1
      .toDF("a", "b")
      .select(round(expr("cosine_similarity(a, b)"), 9).as("c"))
    assert(df.collect().map(_.getDouble(0)).sameElements(Array(0.0, 1.0, -1.0)))
    val withNull = Seq((Array(1.0), null.asInstanceOf[Array[Double]]))
      .toDF("a", "b").select(expr("cosine_similarity(a, b)").as("c"))
    assert(withNull.head.isNullAt(0))
  }

  test("rejects wrong arity and wrong types at analysis time") {
    CosineSimilarity.register(spark)
    val arity = intercept[IllegalArgumentException] {
      spark.sql("SELECT cosine_similarity(array(1.0d))").collect()
    }
    assert(arity.getMessage.contains("exactly 2 arguments"))
    val types = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cosine_similarity('a', 'b')").collect()
    }
    assert(types.getMessage.contains("array<double>"))
    val intArrays = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cosine_similarity(array(1, 0), array(0, 1))").collect()
    }
    assert(intArrays.getMessage.contains("array<int>"))
  }

  test("survives codegen in a wide pipeline (crossJoin hot path)") {
    CosineSimilarity.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vs = (1 to 50).map(i => (i.toLong, Array.fill(16)(rnd.nextDouble()))).toDF("id", "v")
    val a = vs.select(col("id").as("ia"), col("v").as("va"))
    val b = vs.select(col("id").as("ib"), col("v").as("vb"))
    val out = a.crossJoin(b).filter(col("ia") < col("ib"))
      .select(expr("cosine_similarity(va, vb)").as("c"))
    assert(out.count() == 50 * 49 / 2)
    assert(out.filter(col("c").isNull || col("c") > 1.0000001 || col("c") < -1.0000001).count() == 0)
  }
}
