package graft.ops

import graft.olist.SparkTestBase
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Crash-atomicity contracts for GenerationStore, the commit protocol
  * under stream-mv-incremental / stream-kmv-incremental. Each test
  * kills a writer at a specific point in the commit sequence and
  * asserts the committed view stays consistent — the properties the
  * r11 delete-then-move swap could not give. */
class GenerationStoreSpec extends SparkTestBase {

  private def freshRoot(tag: String): String = {
    val r = s"/tmp/genstore-spec/$tag"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r))
    r
  }

  test("crash BETWEEN data write and pointer swap leaves the previous state readable") {
    val root = freshRoot("crash-mid")
    GenerationStore.commit(root, 0L) { dir =>
      spark.range(5).toDF("v").write.parquet(dir)
    }
    // simulated crash: the next generation's data lands fully, but the
    // process dies before the manifest move — exactly the window where
    // delete-then-move had already destroyed the old target
    intercept[RuntimeException] {
      GenerationStore.commit(root, 1L) { dir =>
        spark.range(99).toDF("v").write.parquet(dir)
        throw new RuntimeException("kill -9 between write and swap")
      }
    }
    val st = GenerationStore.read(root)
    assert(st.lastBatchId == 0L, st)
    assert(spark.read.parquet(st.dataDir.get).count() == 5)
    // and the recovery path reuses the batchId cleanly
    GenerationStore.commit(root, 1L) { dir =>
      spark.range(7).toDF("v").write.parquet(dir)
    }
    assert(spark.read.parquet(GenerationStore.read(root).dataDir.get).count() == 7)
  }

  test("replayed batch is detected: committed swap + uncommitted offset cannot double-count") {
    val root = freshRoot("replay")
    def applyBatch(batchId: Long, add: Long): Unit =
      if (!GenerationStore.alreadyApplied(root, batchId)) {
        val prev = GenerationStore.read(root).dataDir
          .map(spark.read.parquet(_).head.getLong(0)).getOrElse(0L)
        GenerationStore.commit(root, batchId) { dir =>
          spark.range(1).select(lit(prev + add).as("sum")).write.parquet(dir)
        }
      }
    applyBatch(0L, 10L)
    applyBatch(1L, 5L)
    // restart replays batch 1 (its swap committed, the stream offset
    // didn't) — the additive merge must NOT run again
    applyBatch(1L, 5L)
    val st = GenerationStore.read(root)
    assert(st.lastBatchId == 1L)
    assert(spark.read.parquet(st.dataDir.get).head.getLong(0) == 15L)
  }

  test("superseded generations are pruned; orphans from killed writers are invisible") {
    val root = freshRoot("prune")
    GenerationStore.commit(root, 0L) { dir =>
      spark.range(3).toDF("v").write.parquet(dir)
    }
    // orphan from a writer that died pre-swap
    Files.createDirectories(Paths.get(root, "gen-9"))
    Files.writeString(Paths.get(root, "gen-9", "junk"), "partial")
    GenerationStore.commit(root, 1L) { dir =>
      spark.range(4).toDF("v").write.parquet(dir)
    }
    val left = Paths.get(root).toFile.listFiles().map(_.getName).toSet
    assert(left == Set("gen-1", "manifest.json"), left)
  }

  test("stream-mv-incremental end-to-end state matches after the store rewire") {
    // the op-level guarantee: 4 merge generations through the store,
    // final state equals the batch recompute (oracle parity in-Spark)
    val sf = "/root/testdata/sf0.001"
    val mv = graft.SparkEntry.queries("stream-mv-incremental")(spark, sf)
    val full = Tables.t(spark, sf, "events")
      .groupBy("user_id").agg(
        count(lit(1)).as("n"),
        sum(expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")).as("sum_cents"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n_click"),
        max(col("event_id")).as("max_event_id"))
    assert(mv.except(full).isEmpty && full.except(mv).isEmpty)
  }
}
