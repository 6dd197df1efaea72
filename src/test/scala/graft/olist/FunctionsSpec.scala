package graft.olist

import org.apache.spark.sql.functions._

/** Unit tests for the T-SQL-semantics expressions (SURVEY §7 hard parts
  * 2-3): known-value checks against values verified on SQL Server
  * semantics, plus boundary cases and a seeded property sweep. */
class FunctionsSpec extends SparkTestBase {

  private def one[T](c: org.apache.spark.sql.Column): T =
    spark.range(1).select(c.as("v")).head.getAs[T]("v")

  test("weekOfYearTsql matches T-SQL DATEPART(WEEK) known values") {
    // (date, expected under DATEFIRST 7): week 1 contains Jan 1; weeks
    // start on Sunday.
    val cases = Seq(
      "2016-01-01" -> 1,  // Friday, week 1
      "2016-01-02" -> 1,  // Saturday, still week 1
      "2016-01-03" -> 2,  // Sunday starts week 2
      "2017-01-01" -> 1,  // Jan 1 is a Sunday → week 1
      "2017-12-31" -> 53, // Sunday, starts week 53
      "2018-12-31" -> 53,
      "2020-02-29" -> 9,
      "2022-12-31" -> 53)
    cases.foreach { case (d, expected) =>
      val got = one[Int](Functions.weekOfYearTsql(to_date(lit(d))))
      assert(got == expected, s"week($d): got $got, want $expected")
    }
  }

  test("datediffHours counts hour-boundary crossings, not elapsed time") {
    def hours(a: String, b: String): Long =
      one[Long](Functions.datediffHours(
        to_timestamp(lit(a)), to_timestamp(lit(b))))
    assert(hours("2024-01-01 10:59:59", "2024-01-01 11:00:01") == 1) // 2s elapsed, 1 boundary
    assert(hours("2024-01-01 10:00:00", "2024-01-01 10:59:59") == 0) // 59m59s, 0 boundaries
    assert(hours("2024-01-01 11:00:01", "2024-01-01 10:59:59") == -1) // negative direction
    assert(hours("2024-01-01 00:00:00", "2024-01-02 00:00:00") == 24)
  }

  test("datediffDays counts day boundaries (T-SQL DATEDIFF(DAY))") {
    def days(a: String, b: String): Int =
      one[Int](Functions.datediffDays(to_timestamp(lit(a)), to_timestamp(lit(b))))
    assert(days("2024-01-01 23:59:59", "2024-01-02 00:00:01") == 1)
    assert(days("2024-01-01 00:00:00", "2024-01-01 23:59:59") == 0)
    assert(days("2024-01-02 00:00:01", "2024-01-01 23:59:59") == -1)
  }

  test("accentFoldLower folds Portuguese diacritics case-insensitively") {
    assert(one[String](Functions.accentFoldLower(lit("São Paulo"))) == "sao paulo")
    assert(one[String](Functions.accentFoldLower(lit("BRASÍLIA"))) == "brasilia")
    assert(one[String](Functions.accentFoldLower(lit("Paraná"))) == "parana")
  }

  test("date keys: sentinel and null-preservation") {
    assert(one[Int](Functions.dateKeyOrSentinel(lit(null).cast("timestamp"))) == 19000101)
    assert(one[Int](Functions.dateKeyOrSentinel(to_timestamp(lit("2017-10-02 10:56:33")))) == 20171002)
    assert(spark.range(1)
      .select(Functions.dateKeyOrNull(lit(null).cast("timestamp")).as("v"))
      .head.isNullAt(0))
  }

  test("tryMoneyComma repairs decimal commas, NULL on garbage") {
    assert(one[java.math.BigDecimal](Functions.tryMoneyComma(lit("129,90")))
      .compareTo(new java.math.BigDecimal("129.90")) == 0)
    assert(one[java.math.BigDecimal](Functions.tryMoneyComma(lit("58.90")))
      .compareTo(new java.math.BigDecimal("58.90")) == 0)
    assert(spark.range(1).select(Functions.tryMoneyComma(lit("abc")).as("v")).head.isNullAt(0))
  }

  test("weekOfYearTsql property: monotone within a year, resets on Sundays") {
    // Full-column property sweep over the whole 2016-2022 calendar: the
    // week increments exactly on Sundays and never otherwise.
    val df = spark.range(1).select(
      explode(expr("sequence(to_date('2016-01-01'), to_date('2022-12-31'), interval 1 day)")).as("d"))
      .select(col("d"),
        Functions.weekOfYearTsql(col("d")).as("w"),
        Functions.weekOfYearTsql(date_sub(col("d"), 1)).as("wPrev"),
        dayofweek(col("d")).as("dow"),
        dayofyear(col("d")).as("doy"))
    val bad = df.filter(col("doy") > 1 &&
      !(col("w") === col("wPrev") + when(col("dow") === 1, 1).otherwise(0)))
    assert(bad.count() == 0, bad.limit(5).collect().mkString(";"))
    val range = df.agg(min("w"), max("w")).head
    assert(range.getInt(0) == 1 && range.getInt(1) <= 54)
  }
}
