package graft.tools

import org.apache.spark.sql.SparkSession

/** Engine-wide unpartitioned-window census: builds every registered
  * query's plan and counts logical Window nodes with an EMPTY
  * partitionSpec — the shape that funnels the whole frame through one
  * task (`WindowExec: No Partition Defined`). This automates the
  * round-8 manual grep audit of `Window.orderBy` call sites, and
  * additionally sees windows the grep can't (SQL front doors, windows
  * introduced by rewrites).
  *
  * An unpartitioned window is NOT automatically a defect — the house
  * rule (SCALING.md) allows them over provably bounded frames (month
  * grains, value-domain histograms, post-limit top-k lists). The
  * census prints every query that has one, with the count, so each
  * new entry must be justified against the allowlist rationale.
  *
  * stream-* keys are skipped (building them executes streaming jobs);
  * their windows are over watermarked micro-batches, not global sorts.
  *
  * Usage: runMain graft.tools.WindowAudit [sfDir] [name1,name2,...]
  */
object WindowAudit {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val only = args.lift(1).map(_.split(",").toSet)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var flagged = 0
    var errored = 0
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => !n.startsWith("stream-"))
      .filter(n => only.forall(_.contains(n)))
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, d)
        val wins = df.queryExecution.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty => w
        }
        if (wins.nonEmpty) {
          flagged += 1
          println(s"[windowaudit] $name unpartitioned_windows=${wins.size}")
        }
      } catch {
        case e: Throwable =>
          errored += 1
          println(s"[windowaudit] $name ERROR ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).takeWhile(_ != '\n'))
      }
    }
    println(s"[windowaudit] done: ${names.size} queries, " +
      s"$flagged with unpartitioned windows, $errored errors")
    spark.stop()
  }
}
