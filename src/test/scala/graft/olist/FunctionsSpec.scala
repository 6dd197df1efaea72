package graft.olist

import org.apache.spark.sql.functions._

/** Unit tests for the T-SQL-semantics expressions (SURVEY §7 hard parts
  * 2-3): known-value checks against values verified on SQL Server
  * semantics, plus boundary cases and a seeded property sweep. */
class FunctionsSpec extends SparkTestBase {

  private def one[T](c: org.apache.spark.sql.Column): T =
    spark.range(1).select(c.as("v")).head.getAs[T]("v")

  test("weekOfYearTsql matches T-SQL DATEPART(WEEK) known values") {
    // Pinned (date, DATEPART(WEEK)) pairs under the SQL Server default
    // SET DATEFIRST 7: the week containing Jan 1 is week 1 and a new
    // week starts on each Sunday — so week(d) = 1 + #Sundays in
    // (Jan 1, d]. Pairs span every year 2016-2022, both leap years
    // (2016, 2020) incl. Feb 29 and the day after, every Jan-1 weekday
    // in the range (Fri, Sun, Mon, Tue, Wed, Fri, Sat), the first
    // Saturday→Sunday week boundary of each year, and every year end.
    val cases = Seq(
      // 2016 — Jan 1 is a Friday (leap year)
      "2016-01-01" -> 1,  // Friday, week 1
      "2016-01-02" -> 1,  // Saturday, still week 1
      "2016-01-03" -> 2,  // first Sunday starts week 2
      "2016-01-09" -> 2,  // Saturday, still week 2
      "2016-01-10" -> 3,  // Sunday
      "2016-02-29" -> 10, // leap day (Monday)
      "2016-12-31" -> 53, // Saturday year end
      // 2017 — Jan 1 is a Sunday
      "2017-01-01" -> 1,
      "2017-01-07" -> 1,  // Saturday closes week 1
      "2017-01-08" -> 2,
      "2017-12-31" -> 53, // Sunday, starts week 53
      // 2018 — Jan 1 is a Monday
      "2018-01-06" -> 1,
      "2018-01-07" -> 2,
      "2018-06-15" -> 24, // mid-year spot check
      "2018-12-31" -> 53,
      // 2019 — Jan 1 is a Tuesday
      "2019-01-05" -> 1,
      "2019-01-06" -> 2,
      "2019-12-31" -> 53,
      // 2020 — Jan 1 is a Wednesday (leap year)
      "2020-01-04" -> 1,
      "2020-01-05" -> 2,
      "2020-02-29" -> 9,  // leap day (Saturday)
      "2020-03-01" -> 10, // Sunday right after the leap day
      "2020-12-31" -> 53,
      // 2021 — Jan 1 is a Friday
      "2021-01-02" -> 1,
      "2021-01-03" -> 2,
      "2021-12-31" -> 53,
      // 2022 — Jan 1 is a Saturday
      "2022-01-01" -> 1,
      "2022-01-02" -> 2,  // Sunday on day 2 — earliest possible week 2
      "2022-07-04" -> 28,
      "2022-12-31" -> 53)
    cases.foreach { case (d, expected) =>
      val got = one[Int](Functions.weekOfYearTsql(to_date(lit(d))))
      assert(got == expected, s"week($d): got $got, want $expected")
    }
  }

  test("weekOfYearTsql equals an independent Sunday-count oracle over the full calendar") {
    // Independent re-derivation of DATEPART(WEEK): literally count the
    // Sundays in (Jan 1, d] with java.time, no shared arithmetic with
    // the production floor-formula. Checked for every day of 2016-2022.
    def tsqlWeekRef(d: java.time.LocalDate): Int = {
      var cur = d.withDayOfYear(1).plusDays(1)
      var sundays = 0
      while (!cur.isAfter(d)) {
        if (cur.getDayOfWeek == java.time.DayOfWeek.SUNDAY) sundays += 1
        cur = cur.plusDays(1)
      }
      1 + sundays
    }
    val got = spark.range(1).select(
      explode(expr("sequence(to_date('2016-01-01'), to_date('2022-12-31'), interval 1 day)")).as("d"))
      .select(col("d").cast("string"), Functions.weekOfYearTsql(col("d")).as("w"))
      .collect()
    assert(got.length == 2557)
    got.foreach { r =>
      val d = java.time.LocalDate.parse(r.getString(0))
      assert(r.getInt(1) == tsqlWeekRef(d), s"week($d)")
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
