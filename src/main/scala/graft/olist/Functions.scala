package graft.olist

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared cleansing / date / collation expressions used by the silver and
  * gold transforms. Everything is built from org.apache.spark.sql.functions
  * (codegen'd) — no UDFs (SURVEY §2.11: none are needed for parity).
  */
object Functions {

  /** TRIM(col) — reference uses it on every string column
    * (e.g. `sp_load_silver_customers.sql:34-41`). */
  def cleanse(c: Column): Column = trim(c)

  /** LEFT(TRIM(col), n) — zip-prefix truncation
    * (`sp_load_silver_customers.sql:37`). */
  def trimLeft(c: Column, n: Int): Column = substring(trim(c), 1, n)

  /** UPPER(LEFT(TRIM(col), 2)) — UF state standardization
    * (`sp_load_silver_customers.sql:39`). */
  def ufState(c: Column): Column = upper(substring(trim(c), 1, 2))

  /** NULLIF(TRIM(col), '') — empty string → NULL
    * (`sp_load_silver_order_reviews.sql:27-28`). */
  def nullifEmpty(c: Column): Column =
    when(trim(c) === "", lit(null).cast(StringType)).otherwise(trim(c))

  /** TRY_CAST(col AS INT) (`sp_load_silver_products.sql:39-41`). */
  def tryInt(c: Column): Column = c.try_cast(IntegerType)

  /** TRY_CAST(REPLACE(col, ',', '.') AS DECIMAL(10,2)) — decimal-comma
    * repair (`sp_load_silver_order_items.sql:38-39`). */
  def tryMoneyComma(c: Column): Column =
    translate(c, ",", ".").try_cast(Schemas.Money)

  /** TRY_CONVERT(DATETIME2(3), col) (`sp_load_silver_orders.sql:37-41`).
    * The Olist format yyyy-MM-dd HH:mm:ss parses under the default. */
  def tryTimestamp(c: Column): Column = c.try_cast(TimestampType)

  /** T-SQL DATEDIFF(DAY, a, b): counts day-boundary crossings — equals
    * Spark datediff after date truncation (`04:240-241`; SURVEY §2.8). */
  def datediffDays(a: Column, b: Column): Column =
    datediff(to_date(b), to_date(a)).cast(IntegerType)

  /** T-SQL DATEDIFF(HOUR, a, b): counts hour-boundary crossings, NOT
    * floored elapsed time (`07_etl_silver_to_gold.sql:228-230`; SURVEY §7
    * hard part 2). floor() on negative unix seconds is still correct:
    * boundaries are absolute epoch-hour marks. */
  def datediffHours(a: Column, b: Column): Column =
    (floor(unix_timestamp(b) / 3600) - floor(unix_timestamp(a) / 3600)).cast(LongType)

  /** DATEDIFF(HOUR,a,b)/24.0 → DECIMAL(10,2) lead-time metric
    * (`07:228-230`, target type `06:113-117`). */
  def leadTimeDays(a: Column, b: Column): Column =
    (datediffHours(a, b) / lit(24.0)).cast(Schemas.Money)

  /** FORMAT(ts,'yyyyMMdd') → INT date key (`07:217,221,224`). */
  def dateKey(ts: Column): Column =
    date_format(ts, "yyyyMMdd").cast(IntegerType)

  /** Null-preserving date key: CASE WHEN ts IS NULL THEN NULL ELSE key
    * (`07:220-224`). */
  def dateKeyOrNull(ts: Column): Column =
    when(ts.isNull, lit(null).cast(IntegerType)).otherwise(dateKey(ts))

  /** Date key with the 1900-01-01 unknown sentinel
    * (COALESCE(...,19000101), `07:217`). */
  def dateKeyOrSentinel(ts: Column): Column =
    coalesce(dateKey(ts), lit(19000101))

  /** Accent-fold for the SQL_Latin1_General_CP1_CI_AI collation used by
    * the geolocation dedup (`sp_load_silver_geolocation.sql:32,42`):
    * lower + Latin-1/Portuguese diacritic strip via translate (pure
    * built-in, SURVEY §7). Deviation note: the reference's CI_AI GROUP BY
    * returns an arbitrary representative of each accent-class; we store
    * the folded form itself, which is deterministic. */
  def accentFoldLower(c: Column): Column =
    translate(lower(c),
      "áàâãäéèêëíìîïóòôõöúùûüçñý",
      "aaaaaeeeeiiiiooooouuuucny")

  /** T-SQL DATEPART(WEEK) under the default DATEFIRST 7: Sunday-start
    * weeks anchored so the week containing Jan 1 is week 1
    * (`07_etl_silver_to_gold.sql:73`; SURVEY §7 hard part 3):
    * week = floor((dayofyear + dow(jan1) - 2) / 7) + 1, dow 1=Sunday. */
  def weekOfYearTsql(d: Column): Column =
    (floor((dayofyear(d) + dayofweek(trunc(d, "year")) - lit(2)) / lit(7)) + lit(1))
      .cast(IntegerType)

  /** DATEPART(WEEKDAY) under DATEFIRST 7 = Spark dayofweek exactly
    * (1=Sunday…7=Saturday, `07:74`). */
  def weekdayTsql(d: Column): Column = dayofweek(d).cast(IntegerType)

  /** CASE-flag helper: 1/0 INT flags (`04:242`, `07:233`). */
  def flag(cond: Column): Column = when(cond, 1).otherwise(0).cast(IntegerType)
}
