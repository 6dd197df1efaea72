package graft.functions

import graft.olist.SparkTestBase
import org.apache.spark.sql.functions._

/** Direct contract tests for the shared bounded-iteration lifecycle
  * (the graph family exercises it end-to-end; these pin the helper's
  * OWN guarantees so a regression is attributed to the helper, not
  * triaged through seven graph ops). */
class IterativeFixpointSpec extends SparkTestBase {

  test("eager: iterates to the right result with constant-size plans") {
    val init = spark.range(10).toDF("v")
    val out = IterativeFixpoint.eager(init, 3) { (df, _) =>
      df.select((col("v") + 1).as("v"))
    }
    assert(out.agg(sum("v")).collect().head.getLong(0) == (3L to 12L).sum)
    // state is a materialized checkpoint: lineage is a leaf, not 3 selects
    assert(out.queryExecution.logical.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD])
  }

  test("eager: a step that accretes lineage fails the no-plan-growth contract") {
    val init = spark.range(10).toDF("v")
    var leaked: org.apache.spark.sql.DataFrame = init
    val e = intercept[IllegalArgumentException] {
      IterativeFixpoint.eager(init, 3) { (df, _) =>
        // wrong by construction: unions the UNCHECKPOINTED previous
        // frame, so round r's plan contains rounds 1..r-1
        leaked = leaked.union(df)
        leaked
      }
    }
    assert(e.getMessage.contains("plan grew"))
  }

  test("eager: earlier rounds' checkpoint storage is released") {
    val init = spark.range(100).toDF("v")
    val before = spark.sparkContext.getPersistentRDDs.size
    val out = IterativeFixpoint.eager(init, 4) { (df, _) =>
      df.select((col("v") * 2).as("v"))
    }
    out.count()
    val after = spark.sparkContext.getPersistentRDDs.size
    // only the FINAL round's checkpoint may remain beyond the baseline
    assert(after <= before + 1,
      s"expected at most one live checkpoint, found ${after - before}")
    IterativeFixpoint.releaseCheckpoint(out)
  }

  test("eagerUntil: stops on convergence before maxRounds") {
    val init = spark.range(64).toDF("v")
    var rounds = 0
    val out = IterativeFixpoint.eagerUntil(init, 20) { (df, _) =>
      rounds += 1
      df.filter(col("v") % 2 === 0)
        .select((col("v") / 2).cast("long").as("v"))
    } { (prev, next, _) => prev.count() == next.count() }
    // halve the even half each round: 64 -> 32 -> 16 -> ... -> {0} fixpoint
    assert(out.count() == 1L)
    assert(rounds < 20, s"did not converge early: $rounds rounds")
    IterativeFixpoint.releaseCheckpoint(out)
  }

  test("lazyChain: folds the step without materializing") {
    val out = IterativeFixpoint.lazyChain(spark.range(5).toDF("v"), 4) { (df, r) =>
      df.select((col("v") + r).as("v"))
    }
    // +1 +2 +3 +4 = +10 per row
    assert(out.orderBy("v").collect().map(_.getLong(0)).toSeq ==
      (10L to 14L))
  }
}
