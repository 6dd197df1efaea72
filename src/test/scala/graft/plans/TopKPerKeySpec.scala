package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.olist.SparkTestBase

/** The custom TopKPerKey operator (logical node + strategy +
  * bounded-heap exec) must be result-identical to the window+filter
  * form it replaces, plan as partial→exchange→final, and handle
  * degenerate k. */
class TopKPerKeySpec extends SparkTestBase {

  private def orders = spark.read
    .parquet("/root/testdata/sf0.001/orders.parquet")
    .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))

  private def viaOperator(k: Int) =
    TopKPerKey.of(orders, Seq("o_orderstatus"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), k)
      .orderBy(col("o_orderstatus"), col("o_totalprice").desc, col("o_orderkey"))

  private def viaWindow(k: Int) = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
      .orderBy(col("o_orderstatus"), col("o_totalprice").desc, col("o_orderkey"))
  }

  test("equals the row_number window form for several k") {
    Seq(1, 3, 10).foreach { k =>
      val a = viaOperator(k).collect().toSeq
      val b = viaWindow(k).collect().toSeq
      assert(a == b, s"k=$k: ${a.take(3)} vs ${b.take(3)}")
    }
  }

  test("k beyond the group size returns every row of the group") {
    val statuses = orders.select(countDistinct(col("o_orderkey"))).head.getLong(0)
    assert(viaOperator(1000000).count() == statuses)
  }

  test("equals the window form on random skewed, tie-heavy data") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(1234)
    (1 to 4).foreach { trial =>
      val n = 200 + rnd.nextInt(600)
      val nGroups = 1 + rnd.nextInt(8)
      // scores from a tiny range → many exact ties, broken by id;
      // group sizes skewed (group 0 gets a quadratic share)
      val rows = (1 to n).map { i =>
        val g = math.min(rnd.nextInt(nGroups), rnd.nextInt(nGroups))
        (i.toLong, s"g$g", rnd.nextInt(5).toDouble)
      }
      val df = rows.toDF("id", "grp", "score").repartition(1 + rnd.nextInt(6))
      val k = 1 + rnd.nextInt(6)
      val viaOp = TopKPerKey.of(df, Seq("grp"), Seq("score" -> false, "id" -> true), k)
        .orderBy(col("grp"), col("score").desc, col("id")).collect().toSeq
      val w = Window.partitionBy(col("grp")).orderBy(col("score").desc, col("id"))
      val viaWin = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .drop("rn").orderBy(col("grp"), col("score").desc, col("id")).collect().toSeq
      assert(viaOp == viaWin, s"trial $trial (n=$n groups=$nGroups k=$k)")
    }
  }

  test("plans as partial and final exec with a key exchange between") {
    // exec nodes render without the Exec suffix
    val plan = viaOperator(3).queryExecution.executedPlan.toString
    assert("TopKPerKey \\[".r.findAllIn(plan).size == 2, plan)
    assert(plan.contains("Exchange hashpartitioning(o_orderstatus"), plan)
    // partial (true) feeds the exchange; final (false) consumes it
    val partialIdx = plan.indexOf(", 3, true")
    val finalIdx = plan.indexOf(", 3, false")
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
    assert(finalIdx < exchangeIdx && exchangeIdx < partialIdx, plan)
  }

  test("key-clustered partitioning passes through: downstream groupBy adds no exchange") {
    val grouped = TopKPerKey.of(orders, Seq("o_orderstatus"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    val plan = grouped.queryExecution.executedPlan.toString
    // exactly one exchange: the one between partial and final topk;
    // the aggregate reuses the final exec's declared key clustering
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }
}
