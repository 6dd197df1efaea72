package graft.functions

import graft.olist.SparkTestBase

/** Randomized (seeded, reproducible) property: the partition-offset SK
  * assigner must equal `row_number() OVER (ORDER BY key)` for any
  * input order, any partitioning, any key distribution — that identity
  * is what lets the oracle stay the plain window SQL. */
class SurrogateKeysPropertySpec extends SparkTestBase {

  test("withSk equals the rank of the key, on random frames and partitionings") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 6).foreach { trial =>
      val n = 50 + rnd.nextInt(400)
      val stride = 1 + rnd.nextInt(9)
      // unique keys with gaps, inserted in shuffled order
      val keys = rnd.shuffle((1 to n).map(_.toLong * stride).toList)
      val df = keys.map(k => (k, s"payload$k")).toDF("k", "v")
        .repartition(1 + rnd.nextInt(8))
      val got = SurrogateKeys.withSk(df, "sk", Seq("k"))
        .select("k", "sk").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = keys.sorted.zipWithIndex
        .map { case (k, i) => k -> (i + 1L) }.toMap
      assert(got == expected, s"trial $trial (n=$n stride=$stride)")
    }
  }

  test("withSk with a composite key orders lexicographically") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = rnd.shuffle((for { a <- 1 to 20; b <- 1 to 10 } yield (a.toLong, b.toLong)).toList)
    val df = rows.toDF("a", "b").repartition(5)
    val got = SurrogateKeys.withSk(df, "sk", Seq("a", "b"))
      .select("a", "b", "sk").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expected = rows.sorted.zipWithIndex.map { case (p, i) => p -> (i + 1L) }.toMap
    assert(got == expected)
  }
}
