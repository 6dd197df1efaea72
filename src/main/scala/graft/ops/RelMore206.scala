package graft.ops

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Tables._

/** Driver-round-9 batch B: observed-metrics auditing — the
  * CollectMetrics operator (`Dataset.observe`) rides audit aggregates
  * on the SAME scan as the real work, where the repo's earlier audit
  * ops (agg-rowcount-audit, sink-audit-append) pay a second pass.
  * At 100 TB a second pass is a second 100 TB scan; observe is the
  * accumulator-style free ride. */
object RelMore206 {

  /** dq-observe-metrics — one-pass audit counters. The per-status
    * rollup is the "real" query; `observe` plants row count, exact
    * cents total, and a nonpositive-price violation count on the scan
    * feeding it. The observation completes with the action that
    * materializes the rollup (localCheckpoint), and the audit values
    * are appended as literal columns — so the graded output proves
    * the observed numbers equal what a dedicated audit scan would
    * have produced (the oracle computes them the expensive way).
    * CollectMetrics is an accumulator merge: no extra shuffle, no
    * extra scan, safe under task retries (Spark deduplicates by task
    * attempt). */
  val dqObserveMetrics: Q = (s, d) => {
    val obs = Observation()
    val base = orders(s, d).select(col("o_orderstatus"), col("o_totalprice"))
    val observed = base.observe(obs,
      count(lit(1)).as("n_total"),
      sum(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
        .as("cents_total"),
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("n_nonpositive"))
    // the action that drives both the rollup and the observation
    val byStatus = observed.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"))
      .localCheckpoint()
    val m = obs.get
    byStatus
      .withColumn("audit_n_total", lit(m("n_total").asInstanceOf[Long]))
      .withColumn("audit_cents_total", lit(m("cents_total").asInstanceOf[Long]))
      .withColumn("audit_n_nonpositive", lit(m("n_nonpositive").asInstanceOf[Long]))
      .orderBy("o_orderstatus")
  }

  val dqObserveMetricsSql: String =
    """WITH audit AS (
      |  SELECT count(*) AS nt,
      |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |           AS BIGINT) AS ct,
      |         CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
      |           AS BIGINT) AS np
      |  FROM orders)
      |SELECT o_orderstatus, count(*) AS n_orders,
      |       nt AS audit_n_total, ct AS audit_cents_total,
      |       np AS audit_n_nonpositive
      |FROM orders CROSS JOIN audit
      |GROUP BY 1, nt, ct, np
      |ORDER BY 1""".stripMargin

  val queries: Map[String, Q] = Map(
    "dq-observe-metrics" -> dqObserveMetrics)

  val oracles: Map[String, String] = Map(
    "dq-observe-metrics" -> dqObserveMetricsSql)
}
