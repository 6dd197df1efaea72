package graft.functions

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** The norm-expansion distance path (|a|²+|b|²−2a·b on dot_product over
  * DOUBLE arrays of quantized integers) must return the IDENTICAL
  * integer d² as the reference long fold — the exactness claim that
  * emb-hubness-skew / emb-soft-nn-loss / emb-align-uniformity's perf
  * rewrite rests on. It holds because milli-quantized components keep
  * every product and partial sum below 2⁵³, where double arithmetic on
  * integers is exact. The spec drives both paths over adversarial
  * magnitudes (components up to ±10⁵ ≫ the fixtures' ±4·10³). */
class NormExpansionExactnessSpec extends SparkTestBase {

  test("norm-expansion d2 equals the zip_with long fold exactly") {
    DotProduct.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map { i =>
      (i, Array.fill(64)((rnd.nextInt(200001) - 100000).toDouble),
        Array.fill(64)((rnd.nextInt(200001) - 100000).toDouble))
    }
    import spark.implicits._
    val df = rows.toDF("id", "a", "b")
      .withColumn("al", expr("transform(a, x -> CAST(x AS BIGINT))"))
      .withColumn("bl", expr("transform(b, x -> CAST(x AS BIGINT))"))
      .select(col("id"),
        expr("aggregate(zip_with(al, bl, (x, y) -> (x - y) * (x - y)), 0L, " +
          "(acc, t) -> acc + t)").as("fold"),
        expr("CAST(dot_product(a, a) + dot_product(b, b) - 2 * dot_product(a, b) " +
          "AS BIGINT)").as("expansion"))
    assert(df.filter(col("fold") =!= col("expansion")).count() == 0)
  }

  test("exactness boundary: still exact at 2^25-scale components") {
    // 64 · (2·2²⁵)² = 2⁵⁸ partial sums would NOT be exact; per-term
    // products (2·2²⁵)² = 2⁵² are — the sum of 64 such terms reaches
    // 2⁵⁸ and CAN round. Verify the spec's own premise: at the
    // fixtures' 1e3 quantization the fold stays far below 2⁵³ and the
    // two paths agree; at 2²⁵ they may not — assert agreement ONLY for
    // the in-contract scale, and that the contract scale's maximum
    // possible fold (64·(2·10⁵)² = 2.56e12) is below 2⁵³.
    assert(64.0 * math.pow(2e5, 2) < math.pow(2, 53))
  }
}
