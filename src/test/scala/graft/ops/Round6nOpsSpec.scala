package graft.ops

import graft.olist.SparkTestBase

/** Round-6 batch N: CUPED, SQL scalar UDFs. */
class Round6nOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("agg-cuped-adjust: variance reduction is a valid rho-squared") {
    val rows = run("agg-cuped-adjust").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) > 0, "units present")
    assert(r.getLong(1) > 0 && r.getLong(2) > 0, "both periods carry spend")
    val rho2 = r.getLong(4)
    assert(rho2 >= 0 && rho2 <= 1000000L, "rho^2 in [0,1] by Cauchy-Schwarz")
  }

  test("sql-scalar-udf: the SQL UDF computes exactly the inlined expression") {
    val viaUdf = run("sql-scalar-udf").collect()
    val inlined = spark.sql(
      """SELECT l_returnflag, count(*) AS n_items,
        |       sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS margin_c100
        |FROM lineitem_udf GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin).collect()
    assert(viaUdf.toSeq == inlined.toSeq, "SQL UDF must inline transparently")
    assert(viaUdf.nonEmpty)
  }
}
