package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scale-safe global rank + running sum — the [[SurrogateKeys]] two-pass
  * generalized from "position under a total order" to "position AND
  * prefix sum of a value column under a total order".
  *
  * Semantics are bit-identical to
  * `row_number() OVER (ORDER BY ...)` plus
  * `sum(v) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)` — the oracle
  * twins stay plain window SQL — but the physical plan has NO
  * single-partition window (`WindowExec: No Partition Defined`), which
  * at fact/customer cardinality funnels the whole frame through one
  * task. Instead:
  *
  *  1. `repartitionByRange` on the order expressions — partition i
  *     holds a contiguous slice of the global order (the same range
  *     exchange a global sort needs anyway);
  *  2. `sortWithinPartitions` — partition order ∘ local order is the
  *     global ORDER BY order;
  *  3. a stats pass collects ONE (count, sum) pair per partition
  *     (|partitions| longs to the driver — the only global
  *     coordination), prefix-summed into per-partition offsets;
  *  4. a stamping pass emits rank = offset_n(p) + local position and
  *     cum = offset_s(p) + local running sum, fully parallel.
  *
  * The order must be TOTAL (unique tiebreak columns at every call
  * site) so the re-sort between the two passes reproduces the same
  * order — the same invariant [[SurrogateKeys.withSk]] documents. The
  * input is persisted across the two passes (stats job materializes
  * the range shuffle; the stamping job reuses the shuffle files and
  * re-runs only the post-shuffle partition sort).
  *
  * The value column must be LongType (cast at the call site); null
  * values count as 0 toward the running sum.
  */
object PrefixScan {

  /** Result of [[withRankCumSum]]: the stamped frame plus the two
    * grand totals the stats pass produced for free (callers that need
    * `count(*) OVER ()` / `sum(v) OVER ()` use these as literals
    * instead of a second global window). */
  final case class Scanned(df: DataFrame, n: Long, total: Long)

  /** Append `rankName` (1-based Long position under ORDER BY `order`)
    * and, when `valueCol` is set, `cumName` (inclusive running Long sum
    * of `valueCol` in that order). Runs one eager stats job at call
    * time (like SurrogateKeys' zipWithIndex). */
  def withRankCumSum(df: DataFrame, order: Seq[Column],
                     valueCol: Option[String],
                     rankName: String = "rn",
                     cumName: String = "cum"): Scanned = {
    val spark = df.sparkSession
    val parts = math.max(1,
      spark.conf.getOption("spark.sql.shuffle.partitions").flatMap(_.toIntOption)
        .getOrElse(spark.sparkContext.defaultParallelism))
    val input = df.persist()
    val ordered = input
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    val vIdx = valueCol.map(ordered.schema.fieldIndex)
    val rdd = ordered.rdd
    // Pass 1 (eager): per-partition (count, sum) — materializes the
    // range shuffle; pass 2 reuses the shuffle files (map stage
    // skipped), so the input cache can be dropped right after.
    val stats = rdd.mapPartitionsWithIndex { (pid, it) =>
      var n = 0L; var s = 0L
      it.foreach { r =>
        n += 1
        vIdx.foreach(i => if (!r.isNullAt(i)) s += r.getLong(i))
      }
      Iterator((pid, n, s))
    }.collect().sortBy(_._1)
    input.unpersist(blocking = false)
    val nTotal = stats.iterator.map(_._2).sum
    val sTotal = stats.iterator.map(_._3).sum
    val offs: Map[Int, (Long, Long)] = {
      var n = 0L; var s = 0L
      stats.map { case (pid, pn, ps) =>
        val e = pid -> (n, s); n += pn; s += ps; e
      }.toMap
    }
    val baseFields = ordered.schema.fields :+
      StructField(rankName, LongType, nullable = false)
    val schema = StructType(
      if (vIdx.isDefined) baseFields :+ StructField(cumName, LongType, nullable = false)
      else baseFields)
    val stamped = rdd.mapPartitionsWithIndex { (pid, it) =>
      val (r0, s0) = offs.getOrElse(pid, (0L, 0L))
      var i = 0L; var run = s0
      it.map { row =>
        i += 1
        vIdx match {
          case Some(ix) =>
            if (!row.isNullAt(ix)) run += row.getLong(ix)
            Row.fromSeq(row.toSeq :+ (r0 + i) :+ run)
          case None =>
            Row.fromSeq(row.toSeq :+ (r0 + i))
        }
      }
    }
    Scanned(spark.createDataFrame(stamped, schema), nTotal, sTotal)
  }

  /** `ntile(k) OVER (ORDER BY ...)` reconstructed from a [[withRankCumSum]]
    * rank and the total row count — the SQL-standard bucket split (first
    * `n % k` buckets hold `n/k + 1` rows, the rest `n/k`), matching
    * Spark's and DuckDB's ntile exactly. Integer arithmetic via floor of
    * a Long/Long division — exact while ranks stay below 2^53, i.e. for
    * any realizable row count. */
  def ntileFromRank(k: Long, n: Long, rank: Column): Column = {
    val q = n / k; val rem = n % k; val cut = rem * (q + 1)
    val bucket =
      if (q == 0L) rank // n < k: one row per bucket, bucket = rank
      else if (rem == 0L) floor((rank - 1) / q) + 1
      else when(rank <= cut, floor((rank - 1) / (q + 1)) + 1)
        .otherwise(lit(rem) + floor((rank - 1 - cut) / q) + 1)
    bucket.cast(IntegerType)
  }
}
