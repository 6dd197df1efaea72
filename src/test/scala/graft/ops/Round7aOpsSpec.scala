package graft.ops

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** Structural invariants for round-7 batch A (oracle hash-compare
  * covers values; these pin scale-relevant properties). */
class Round7aOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("layout-zonemap-skipping: sorted layout skips strictly more than arrival") {
    val rows = run("layout-zonemap-skipping").collect()
      .map(r => r.getAs[String]("layout") -> r.getAs[Long]("skip_ratio_milli")).toMap
    assert(rows.keySet == Set("arrival", "sorted"))
    // the clustered layout must dominate — that dominance IS the op's
    // decision signal; equality would mean the modeled rewrite is useless
    assert(rows("sorted") > rows("arrival"),
      s"sorted=${rows("sorted")} should beat arrival=${rows("arrival")}")
    assert(rows.values.forall(v => v >= 0 && v <= 1000))
  }

  test("agg-hll-precision-curve: error shrinks monotonically with precision outside the linear regime") {
    val rows = run("agg-hll-precision-curve").orderBy("p").collect()
    assert(rows.length == 3)
    assert(rows.forall(r => r.getAs[Long]("est") > 0))
    // theory: stderr ~ 1.04/sqrt(m); between p=6 and p=9 the raw-regime
    // error must improve (p=12 may sit in linear-counting territory at
    // sf0.001, where the raw estimator's bias is the documented lesson)
    val raw = rows.filter(_.getAs[Int]("linear_regime") == 0)
    if (raw.length >= 2)
      assert(raw.head.getAs[Long]("err_ppm") >= raw.last.getAs[Long]("err_ppm") / 2 ||
        raw.head.getAs[Long]("err_ppm") >= raw.last.getAs[Long]("err_ppm"),
        raw.map(r => (r.getAs[Int]("p"), r.getAs[Long]("err_ppm"))).mkString(","))
  }

  test("dq-join-fanout-preflight: total row dominates and equals sum over keys") {
    val df = run("dq-join-fanout-preflight").cache()
    val total = df.filter(col("rank") === 0).collect().head
    assert(total.getAs[Long]("supp_key") == -1L)
    val topSum = df.filter(col("rank") > 0).agg(sum("est_pairs")).head().getLong(0)
    // top-5 contributions can never exceed the grand total
    assert(topSum <= total.getAs[Long]("est_pairs"))
    // fan-out estimate >= left row count (every row matches itself)
    assert(total.getAs[Long]("est_pairs") >= total.getAs[Long]("n_left"))
    assert(df.count() == 6)
  }
}
