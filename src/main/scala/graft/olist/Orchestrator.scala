package graft.olist

import org.apache.spark.sql.SparkSession

/** End-to-end medallion pipeline: CSV → bronze → silver → gold → QA, the
  * Spark re-expression of running `03` + `etl.sp_master_orchestrator`
  * (`05_sp_master_orchestrator_silver.sql`) + `etl.sp_gold_orchestrator`
  * (`07_etl_silver_to_gold.sql:326-358`).
  *
  * Fail-fast contract (XACT_ABORT + THROW): any silver/gold load
  * exception aborts the remaining loads — plain Scala exception
  * propagation, with the audit trail recording the FAILED run. Bronze
  * file failures do NOT cascade (the reference's bulk loader swallows
  * them into the audit row, `03:65-72`).
  */
object Orchestrator {

  case class PipelineResult(
    bronzeRows: Map[String, Long],
    silverRows: Map[String, Long],
    goldRows: Map[String, Long],
    qa: Validate.QaReport)

  def runAll(spark: SparkSession, csvDir: String, warehouse: String,
             assertQa: Boolean = true): PipelineResult = {
    val audit = new Audit(spark, warehouse)
    val bronze = new Bronze(spark, warehouse, audit)
    val bronzeRows = bronze.loadAll(csvDir)
    val silverRows = Silver.run(spark, warehouse, bronze, audit)
    val goldRows = Gold.run(spark, warehouse, audit)
    val qa = Validate.run(spark, warehouse)
    if (assertQa) Validate.assertInvariants(qa)
    PipelineResult(bronzeRows, silverRows, goldRows, qa)
  }
}
