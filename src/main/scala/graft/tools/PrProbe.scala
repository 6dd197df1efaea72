package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for the pagerank family: phase timings. */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("id % 7 AS k").groupBy("k").count().count()
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (rep <- 1 to 2) {
      println(s"=== rep $rep ===")
      val li = t("distinct-pairs") {
        val x = spark.read.parquet(s"$d/lineitem.parquet")
          .select((col("l_partkey") * 2).as("pn"), (col("l_suppkey") * 2 + 1).as("sn"))
          .distinct()
        x.count(); x
      }
      val edges = li.select(col("pn").as("src"), col("sn").as("dst"))
        .unionAll(li.select(col("sn").as("src"), col("pn").as("dst")))
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      val edgesDeg = t("edgesDeg-cache") {
        val x = edges.join(deg, "src").persist()
        x.count(); x
      }
      val n = t("countDistinct") {
        edgesDeg.select(countDistinct(col("src"))).head().getLong(0).toDouble
      }
      def iter(bcast: Boolean): DataFrame = {
        var ranks = deg.select(col("src").as("node"), (lit(1.0) / lit(n)).as("r"))
        for (_ <- 1 to 5) {
          val rside = ranks.withColumnRenamed("node", "src")
          ranks = edgesDeg
            .join(if (bcast) broadcast(rside) else rside, "src")
            .groupBy(col("dst"))
            .agg(round(lit(0.15 / n) + lit(0.85) * sum(col("r") / col("deg")), 8).as("r"))
            .select(col("dst").as("node"), col("r"))
        }
        ranks
      }
      t("iters-baseline") { iter(false).orderBy("node").count() }
      t("iters-baseline2") { iter(false).orderBy("node").count() }
      t("iters-bcast") { iter(true).orderBy("node").count() }
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      t("iters-p8") { iter(false).orderBy("node").count() }
      spark.conf.set("spark.sql.shuffle.partitions", cpus)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      t("iters-noaqe") { iter(false).orderBy("node").count() }
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      t("iters-aqe-coalesce") { iter(false).orderBy("node").count() }
      spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
      edgesDeg.unpersist()
    }
    spark.stop()
  }
}
