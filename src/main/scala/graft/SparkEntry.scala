package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 (plus the training-data pipeline ops)
  * is registered here as a named query over /root/testdata/sf* with a
  * DuckDB-oracle ANSI SQL twin. Column aliases match exactly between the
  * Spark plan and the oracle (the driver's compare sorts columns by name
  * before hashing).
  */
object SparkEntry {

  private[graft] val modules: Seq[(Map[String, Tables.Q], Map[String, String])] = Seq(
    (RelSources.queries, RelSources.oracles),
    (RelProjCast.queries, RelProjCast.oracles),
    (RelJoins.queries, RelJoins.oracles),
    (RelAggs.queries, RelAggs.oracles),
    (RelWindowSort.queries, RelWindowSort.oracles),
    (RelSetGen.queries, RelSetGen.oracles),
    (RelScale.queries, RelScale.oracles),
    (RelExtra.queries, RelExtra.oracles),
    (RelMore.queries, RelMore.oracles),
    (RelMore2.queries, RelMore2.oracles),
    (RelMore3.queries, RelMore3.oracles),
    (RelMore4.queries, RelMore4.oracles),
    (RelMore5.queries, RelMore5.oracles),
    (RelMore6.queries, RelMore6.oracles),
    (RelMore7.queries, RelMore7.oracles),
    (RelMore8.queries, RelMore8.oracles),
    (RelMore9.queries, RelMore9.oracles),
    (RelMore10.queries, RelMore10.oracles),
    (RelMore11.queries, RelMore11.oracles),
    (RelMore12.queries, RelMore12.oracles),
    (RelMore13.queries, RelMore13.oracles),
    (RelMore14.queries, RelMore14.oracles),
    (RelMore15.queries, RelMore15.oracles),
    (RelMore16.queries, RelMore16.oracles),
    (RelMore17.queries, RelMore17.oracles),
    (RelMore18.queries, RelMore18.oracles),
    (RelMore19.queries, RelMore19.oracles),
    (RelMore20.queries, RelMore20.oracles),
    (RelMore21.queries, RelMore21.oracles),
    (RelMore22.queries, RelMore22.oracles),
    (RelMore23.queries, RelMore23.oracles),
    (RelMore24.queries, RelMore24.oracles),
    (RelMore25.queries, RelMore25.oracles),
    (RelMore26.queries, RelMore26.oracles),
    (RelMore27.queries, RelMore27.oracles),
    (RelMore28.queries, RelMore28.oracles),
    (RelMore29.queries, RelMore29.oracles),
    (RelMore30.queries, RelMore30.oracles),
    (RelMore31.queries, RelMore31.oracles),
    (RelMore32.queries, RelMore32.oracles),
    (RelMore33.queries, RelMore33.oracles),
    (RelMore34.queries, RelMore34.oracles),
    (RelMore35.queries, RelMore35.oracles),
    (RelMore36.queries, RelMore36.oracles),
    (RelMore37.queries, RelMore37.oracles),
    (RelMore38.queries, RelMore38.oracles),
    (RelMore39.queries, RelMore39.oracles),
    (RelMore40.queries, RelMore40.oracles),
    (RelMore41.queries, RelMore41.oracles),
    (RelMore42.queries, RelMore42.oracles),
    (RelMore43.queries, RelMore43.oracles),
    (RelMore44.queries, RelMore44.oracles),
    (RelMore45.queries, RelMore45.oracles),
    (RelMore46.queries, RelMore46.oracles),
    (RelMore47.queries, RelMore47.oracles),
    (RelMore48.queries, RelMore48.oracles),
    (RelMore49.queries, RelMore49.oracles),
    (RelMore50.queries, RelMore50.oracles),
    (RelMore51.queries, RelMore51.oracles),
    (RelMore52.queries, RelMore52.oracles),
    (RelMore53.queries, RelMore53.oracles),
    (RelMore54.queries, RelMore54.oracles),
    (RelMore55.queries, RelMore55.oracles),
    (RelMore56.queries, RelMore56.oracles),
    (RelMore57.queries, RelMore57.oracles),
    (RelMore58.queries, RelMore58.oracles),
    (RelMore59.queries, RelMore59.oracles),
    (RelMore60.queries, RelMore60.oracles),
    (RelMore61.queries, RelMore61.oracles),
    (RelMore62.queries, RelMore62.oracles),
    (RelMore63.queries, RelMore63.oracles),
    (RelMore64.queries, RelMore64.oracles),
    (RelMore65.queries, RelMore65.oracles),
    (RelMore66.queries, RelMore66.oracles),
    (RelMore67.queries, RelMore67.oracles),
    (RelMore68.queries, RelMore68.oracles),
    (RelMore69.queries, RelMore69.oracles),
    (RelMore70.queries, RelMore70.oracles),
    (RelMore71.queries, RelMore71.oracles),
    (RelMore72.queries, RelMore72.oracles),
    (RelMore73.queries, RelMore73.oracles),
    (RelMore74.queries, RelMore74.oracles),
    (RelMore75.queries, RelMore75.oracles),
    (RelMore76.queries, RelMore76.oracles),
    (RelMore77.queries, RelMore77.oracles),
    (RelMore78.queries, RelMore78.oracles),
    (RelMore79.queries, RelMore79.oracles),
    (RelMore80.queries, RelMore80.oracles),
    (RelMore81.queries, RelMore81.oracles),
    (RelMore82.queries, RelMore82.oracles),
    (RelMore83.queries, RelMore83.oracles),
    (RelMore84.queries, RelMore84.oracles),
    (RelMore85.queries, RelMore85.oracles),
    (RelMore86.queries, RelMore86.oracles),
    (RelMore87.queries, RelMore87.oracles),
    (RelMore88.queries, RelMore88.oracles),
    (RelMore90.queries, RelMore90.oracles),
    (RelMore91.queries, RelMore91.oracles),
    (RelMore92.queries, RelMore92.oracles),
    (RelMore93.queries, RelMore93.oracles),
    (RelMore94.queries, RelMore94.oracles),
    (RelMore95.queries, RelMore95.oracles),
    (RelMore96.queries, RelMore96.oracles),
    (RelMore97.queries, RelMore97.oracles),
    (RelMore98.queries, RelMore98.oracles),
    (RelMore99.queries, RelMore99.oracles),
    (RelMore89.queries, RelMore89.oracles),
    (RelMore100.queries, RelMore100.oracles),
    (RelMore101.queries, RelMore101.oracles),
    (RelMore102.queries, RelMore102.oracles),
    (RelMore103.queries, RelMore103.oracles),
    (RelMore104.queries, RelMore104.oracles),
    (RelMore105.queries, RelMore105.oracles),
    (RelMore106.queries, RelMore106.oracles),
    (RelMore107.queries, RelMore107.oracles),
    (RelMore108.queries, RelMore108.oracles),
    (RelMore109.queries, RelMore109.oracles),
    (RelMore110.queries, RelMore110.oracles),
    (RelMore111.queries, RelMore111.oracles),
    (RelMore112.queries, RelMore112.oracles),
    (RelMore113.queries, RelMore113.oracles),
    (RelMore114.queries, RelMore114.oracles),
    (RelMore115.queries, RelMore115.oracles),
    (RelMore116.queries, RelMore116.oracles),
    (RelMore117.queries, RelMore117.oracles),
    (RelMore118.queries, RelMore118.oracles),
    (RelMore119.queries, RelMore119.oracles),
    (RelMore120.queries, RelMore120.oracles),
    (RelMore121.queries, RelMore121.oracles),
    (FuncSuites.queries, FuncSuites.oracles),
    (RelWarehouse.queries, RelWarehouse.oracles),
    (TextDedup.queries, TextDedup.oracles),
    (Ann.queries, Ann.oracles),
    (GraphOps.queries, GraphOps.oracles),
    (TextAnalysis.queries, TextAnalysis.oracles),
    (Multimodal.queries, Multimodal.oracles),
    (StreamingOps.queries, StreamingOps.oracles))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Mirrors the reference's top-3-categories-by-revenue QA query
    * (08_validacionsql.sql:55-62) — the minimum end-to-end slice. */
  def entry(spark: SparkSession): DataFrame =
    RelAggs.aggTopk(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
