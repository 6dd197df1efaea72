package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the driver contract: every query has an oracle, no
  * module silently shadows another's key, and names stay stable. */
class SparkEntryContractSpec extends AnyFunSuite {

  test("every query has an oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q diff o).isEmpty, s"queries without oracle: ${q diff o}")
    assert((o diff q).isEmpty, s"oracles without query: ${o diff q}")
  }

  test("no duplicate keys across modules (Map ++ would silently shadow)") {
    val perModule = SparkEntry.modules.map(_._1.keySet)
    val total = perModule.map(_.size).sum
    val combined = perModule.reduce(_ union _).size
    assert(total == combined,
      s"duplicate query keys across modules: ${
        perModule.flatten.groupBy(identity).collect { case (k, v) if v.size > 1 => k }}")
  }

  test("oracle SQL is non-empty and references no Spark-only syntax") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: empty oracle")
      // get_json_object / try_to_timestamp etc. are Spark-side; the
      // oracle must stay DuckDB-runnable
      assert(!sql.contains("get_json_object"), s"$name: Spark-only fn in oracle")
      assert(!sql.contains("try_to_timestamp"), s"$name: Spark-only fn in oracle")
    }
  }

  test("query count covers the SURVEY §2 inventory breadth") {
    assert(SparkEntry.queries.size >= 70, s"only ${SparkEntry.queries.size} queries registered")
  }
}
