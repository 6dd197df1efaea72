package graft.ops

import graft.olist.SparkTestBase

/** Round-6 batch D: LSH banding S-curve, manifest time travel,
  * EXECUTE IMMEDIATE. */
class Round6dOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("dedup-banding-curve: candidates grow and precision falls as bands narrow") {
    val rows = run("dedup-banding-curve").collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("01x12", "02x06", "03x04", "04x03", "06x02", "12x01"), "all six splits, ordered")
    rows.foreach { r =>
      val (cand, conf, prec) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(conf <= cand, "confident pairs are a subset of candidates")
      assert(prec == (if (cand == 0) 0L else conf * 1000000L / cand), "exact integer ratio")
    }
    val byCfg = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    // the S-curve's defining property: 12 bands of 1 row admit far more
    // candidates than 1 band of 12 rows
    assert(byCfg("12x01") >= byCfg("01x12"),
      "narrow bands must admit at least as many candidates as the full-signature band")
    val prec01 = rows.find(_.getString(0) == "01x12").get.getLong(3)
    val prec12 = rows.find(_.getString(0) == "12x01").get.getLong(3)
    assert(prec01 >= prec12, "full-signature band cannot be less precise than 1-row bands")
  }

  test("sink-time-travel: v1 stays readable after v2 commit, HEAD points at v2") {
    val rows = run("sink-time-travel").collect()
    assert(rows.length == 2)
    val v1 = rows.find(_.getString(0) == "v1").get
    val v2 = rows.find(_.getString(0) == "v2").get
    assert(v1.getInt(3) == 0 && v2.getInt(3) == 1, "HEAD is v2")
    assert(v2.getLong(1) > v1.getLong(1), "v2 appended rows on top of v1's files")
    assert(v2.getLong(2) > v1.getLong(2), "checksum grows with the appended keys")
  }

  test("sql-execute-immediate: bound parameter filters like the literal query") {
    val viaEi = run("sql-execute-immediate").collect()
    val literal = spark.sql(
      """SELECT o_orderpriority, count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders_ei WHERE o_orderstatus = 'O'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin).collect()
    assert(viaEi.toSeq == literal.toSeq,
      "EXECUTE IMMEDIATE ... USING must bind exactly like the literal predicate")
    assert(viaEi.nonEmpty)
  }
}
