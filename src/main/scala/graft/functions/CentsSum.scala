package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed Aggregator (the user-facing custom-aggregate tier): exact money
  * summation of a double column via long cents.
  *
  * Each input is rounded to 2 decimal places exactly the way a
  * CAST(x AS DECIMAL(18,2)) rounds (BigDecimal HALF_UP — the same result
  * DuckDB's cast produces on the same double), then accumulated as a
  * long. Long addition is associative and overflow-checked nowhere near
  * realistic money ranges, so partial aggregation and merge order cannot
  * change the result — the property that makes a custom aggregate safe
  * to run as map-side partials at 100 TB.
  */
object CentsSum extends Aggregator[java.lang.Double, Long, Double] {

  override def zero: Long = 0L

  override def reduce(acc: Long, x: java.lang.Double): Long =
    if (x == null) acc
    else acc + java.math.BigDecimal.valueOf(x)
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact()

  override def merge(a: Long, b: Long): Long = a + b

  override def finish(cents: Long): Double = cents / 100.0

  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Register as SQL aggregate `cents_sum` (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.udf.register("cents_sum", udaf(CentsSum))
}
