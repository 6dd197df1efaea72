package graft.functions

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** The DotProductRewrite optimizer rule must turn the interpreted
  * aggregate(zip_with(a, b, *), 0d, +) fold into the codegen
  * dot_product expression — same values, native plan — and must leave
  * non-matching folds alone. (SparkTestBase installs GraftExtensions,
  * so the rule is active in the shared session.)
  */
class DotProductRewriteSpec extends SparkTestBase {

  private val foldExpr =
    "aggregate(zip_with(a, b, (p, q) -> p * q), CAST(0 AS DOUBLE), (acc, z) -> acc + z)"

  private def frame = {
    import spark.implicits._
    Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.5, -1.5), Array(2.0, 2.0)),
      (Array.empty[Double], Array.empty[Double]))
      .toDF("a", "b")
  }

  // plan-shape assertions need a non-local source: over a LocalRelation
  // the optimizer constant-folds the whole projection away before the
  // plan can be inspected
  private def parquetVecs = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("a"))

  test("fold is rewritten to the native dot_product expression") {
    val df = parquetVecs.select(expr(
      "aggregate(zip_with(a, a, (p, q) -> p * q), CAST(0 AS DOUBLE), (acc, z) -> acc + z)").as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("dot_product"), optimized)
    assert(!optimized.contains("aggregate("), optimized)
  }

  test("rewritten fold computes identical values (incl. empty arrays)") {
    val got = frame.select(expr(foldExpr).as("d")).collect().map(_.getDouble(0))
    assert(got.sameElements(Array(1.0 * 4 + 2 * 5 + 3 * 6, 0.5 * 2 + -1.5 * 2, 0.0)))
  }

  test("length mismatch yields NULL, matching zip_with null-padding semantics") {
    val df = parquetVecs
      .select(col("a"), expr("slice(a, 1, 3)").as("b"))
      .select(expr(foldExpr).as("d"))
    assert(df.queryExecution.optimizedPlan.toString.contains("dot_product"))
    assert(df.head.isNullAt(0))
  }

  test("non-matching folds are left untouched") {
    // subtraction merge is not a dot product — must stay an aggregate
    val other = frame.select(expr(
      "aggregate(zip_with(a, b, (p, q) -> p * q), CAST(0 AS DOUBLE), (acc, z) -> acc - z)").as("d"))
    assert(!other.queryExecution.optimizedPlan.toString.contains("dot_product"))
  }

  test("dot_product is directly callable via the extensions registry") {
    val v = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head.getDouble(0)
    assert(v == 11.0)
  }
}
