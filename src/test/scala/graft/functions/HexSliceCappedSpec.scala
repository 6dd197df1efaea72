package graft.functions

import org.apache.spark.sql.functions._
import graft.olist.SparkTestBase

/** The two r11 native expressions behind the MinHash-family rewrite:
  * hex_slice_long (LONG signature slots → HashAggregate instead of the
  * SortAggregate that min(STRING) forces) and capped_distinct_list
  * (one-shuffle df-capped inverted index, state bounded at cap+1). */
class HexSliceCappedSpec extends SparkTestBase {

  test("hex_slice_long parses slices, preserves order, handles bad input") {
    import spark.implicits._
    // parse correctness against java.lang.Long.parseLong
    val rows = Seq("0123456789abcdef", "fedcba9876543210", "00000ffff1a2b3c4")
    val got = rows.toDF("h")
      .selectExpr("h",
        "hex_slice_long(h, 1, 5) AS a",
        "hex_slice_long(h, 6, 5) AS b",
        "hex_slice_long(h, 12, 5) AS c")
      .collect()
    got.foreach { r =>
      val h = r.getString(0)
      assert(r.getLong(1) == java.lang.Long.parseLong(h.substring(0, 5), 16))
      assert(r.getLong(2) == java.lang.Long.parseLong(h.substring(5, 10), 16))
      assert(r.getLong(3) == java.lang.Long.parseLong(h.substring(11, 16), 16))
    }
    // ORDER PRESERVATION — the property the min() swap relies on:
    // lexicographic order of equal-length lowercase hex = numeric order
    val rnd = new scala.util.Random(7)
    val hexes = (1 to 500).map(_ => f"${rnd.nextInt(0x100000)}%05x")
    val parsed = hexes.map(x => java.lang.Long.parseLong(x, 16))
    assert(hexes.sorted.map(x => java.lang.Long.parseLong(x, 16)) == parsed.sorted,
      "lexicographic hex order must equal numeric order")
    assert(hexes.min == f"${parsed.min}%05x")
    // non-hex chars and out-of-range slices → NULL, not garbage
    val bad = Seq("xyz12", "ab").toDF("h")
      .selectExpr("hex_slice_long(h, 1, 5) AS v").collect()
    assert(bad.forall(_.isNullAt(0)))
  }

  test("min(hex_slice_long) plans as HashAggregate; min(substring) as SortAggregate") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i % 10, f"${i * 2654435761L % 0x100000000L}%08x"))
      .toDF("g", "h")
    val fast = df.groupBy("g").agg(min(expr("hex_slice_long(h, 1, 5)")))
    val slow = df.groupBy("g").agg(min(substring(col("h"), 1, 5)))
    def plan(q: org.apache.spark.sql.DataFrame): String =
      q.queryExecution.executedPlan.toString
    assert(plan(fast).contains("HashAggregate"), "long mins must hash-aggregate")
    assert(!plan(fast).contains("SortAggregate"))
    assert(plan(slow).contains("SortAggregate"),
      "if Spark ever hash-aggregates string mins, the hex_slice_long " +
        "rationale is stale — revisit TextDedup.minhashSigFrom")
  }

  test("capped_distinct_list: exact sorted set under cap, NULL over cap, dedup") {
    import spark.implicits._
    val df = Seq(
      ("a", 3L), ("a", 1L), ("a", 2L), ("a", 2L),      // 3 distinct = cap
      ("b", 1L), ("b", 2L), ("b", 3L), ("b", 4L),      // 4 distinct > cap
      ("c", 9L)                                        // singleton
    ).toDF("k", "v").repartition(4)                    // force partial merges
    val got = df.groupBy("k")
      .agg(expr("capped_distinct_list(v, 3)").as("docs"))
      .orderBy("k").collect()
    assert(got(0).getSeq[Long](1) == Seq(1L, 2L, 3L))
    assert(got(1).isNullAt(1), "over-cap group must be NULL (the hot-key cut)")
    assert(got(2).getSeq[Long](1) == Seq(9L))
  }

  test("capped_distinct_list agrees with collect_set on non-hot keys across partitionings") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (1 to 2000).map(_ => (rnd.nextInt(50), rnd.nextInt(40).toLong))
    for (parts <- Seq(1, 7)) {
      val df = rows.toDF("k", "v").repartition(parts)
      val a = df.groupBy("k")
        .agg(expr("capped_distinct_list(v, 40)").as("docs"))
      val b = df.groupBy("k")
        .agg(array_sort(collect_set(col("v"))).as("docs"))
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"capped (cap>=all dfs) must equal collect_set at $parts partitions")
    }
  }
}
