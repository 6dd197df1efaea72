package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for the RelMore4 batch + dedup-minhash-estimate. */
class Round4jOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("sql-tpch-q3: top-10 by revenue, non-increasing") {
    val rows = run("sql-tpch-q3").collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getDouble(1))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("join-null-safe: the NULL bucket joins (key -1 present)") {
    val df = run("join-null-safe").cache()
    assert(df.filter(col("key") === -1).count() == 1)
    assert(df.filter(col("key") === 3).count() == 0) // nullif folded 3 away
    assert(df.filter(col("n_orders") < 1).count() == 0)
  }

  test("expr-try-arith: overflow and parse failures degrade to sentinels") {
    val df = run("expr-try-arith").cache()
    assert(df.filter(col("o_orderkey") > 1 && col("safe_mul") =!= -1).count() == 0)
    assert(df.filter(col("status_num") =!= -1).count() == 0)
    assert(df.filter(col("prio_num") < 1 || col("prio_num") > 5).count() == 0)
    assert(df.filter((col("o_custkey") % 3 === 0) && col("safe_div") =!= -1.0).count() == 0)
  }

  test("agg-moments-suite: variance non-negative, counts cover the table") {
    val df = run("agg-moments-suite").cache()
    assert(df.filter(col("var_micro") < 0).count() == 0)
    assert(df.agg(sum("n")).head().getLong(0) == Tables.lineitem(spark, sf).count())
  }

  test("agg-unpivot: 4 metrics per (order, line)") {
    val df = run("agg-unpivot").cache()
    assert(df.select("metric").distinct().count() == 4)
    // (l_orderkey, l_linenumber) is not unique in the synthetic data:
    // each source row contributes exactly 4 metric rows
    val per = df.groupBy("l_orderkey", "l_linenumber").count()
    assert(per.filter(col("count") % 4 =!= 0).count() == 0)
    assert(df.count() == 4 * Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") % 100 === 0).count())
  }

  test("dedup-minhash-estimate: estimates and truth in [0,1], err is |diff|") {
    val df = run("dedup-minhash-estimate").cache()
    assert(df.count() > 0)
    assert(df.filter(col("est_micro") < 0 || col("est_micro") > 1000000).count() == 0)
    assert(df.filter(col("jac_micro") < 0 || col("jac_micro") > 1000000).count() == 0)
    assert(df.filter(col("err_micro") =!= abs(col("est_micro") - col("jac_micro"))).count() == 0)
  }
}
