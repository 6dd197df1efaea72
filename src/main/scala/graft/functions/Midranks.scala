package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared value-domain midrank machinery for the rank-statistics family
  * (Mann-Whitney / Cliff's delta / DeLong AUC / Cramér-von Mises …).
  *
  * The scale trap in rank tests is the rank itself: `rank() OVER
  * (ORDER BY value)` over a fact table is a single-partition sort of
  * every row. But every midrank-based statistic only needs ranks as a
  * function of the VALUE, so the right shape is (1) collapse to a
  * per-distinct-value histogram with whatever per-class counts the
  * test needs — one map-side-combinable aggregate, output bounded by
  * the VALUE DOMAIN, not the row count — then (2) a [[PrefixScan]]
  * two-pass over that histogram stamps the cumulative counts from
  * which all midranks fall out in closed form:
  *
  *   first-of-ties rank  = cum − cnt + 1
  *   doubled midrank mr2 = 2·rank_first + cnt − 1 = 2·cum − cnt + 1
  *
  * (doubled so ties never produce a .5 — every statistic downstream
  * stays exact integer until its one terminal double).
  */
object Midranks {

  /** Per-distinct-value doubled-midrank table.
    *
    * Input rows are collapsed by `valueCol`; each `(name, predicate)`
    * in `classes` adds a per-value class count column `name`. Output
    * columns: `valueCol`, `cnt` (total rows at that value), each class
    * count, `mr2` (doubled midrank of the value in the OVERALL order)
    * and `<name>_mr2` (doubled midrank WITHIN that class — the
    * restriction of the value order to the class's rows). All Long.
    *
    * Row-level equivalence: a row with value v in class c has
    * rank-with-ties midrank mr2/2 overall and `<c>_mr2`/2 within its
    * class, so Σ_rows f(midranks) = Σ_values classCount·f(midranks). */
  def doubled(df: DataFrame, valueCol: String,
              classes: Seq[(String, Column)]): DataFrame = {
    val classCounts = classes.map { case (n, pred) =>
      sum(when(pred, 1L).otherwise(0L)).as(n)
    }
    val hist = df.groupBy(valueCol)
      .agg(count(lit(1)).as("cnt"), classCounts: _*)
    val sc = PrefixScan.withRankCumSums(hist, Seq(col(valueCol)),
      "cnt" +: classes.map(_._1), rankName = "vrk",
      cumNames = "cum" +: classes.map("cum_" + _._1))
    val base = sc.df
      .withColumn("mr2", lit(2) * col("cum") - col("cnt") + 1)
    classes.foldLeft(base) { case (acc, (n, _)) =>
      acc.withColumn(s"${n}_mr2", lit(2) * col(s"cum_$n") - col(n) + 1)
    }.drop("vrk")
  }
}
