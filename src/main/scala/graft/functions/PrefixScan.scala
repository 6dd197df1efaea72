package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

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
    val callerCached = df.storageLevel != StorageLevel.NONE
    val input = if (callerCached) df else df.persist()
    val ordered = input
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    val vIdx = valueCol.map(ordered.schema.fieldIndex)
    val rdd = ordered.rdd
    // Pass 1 (eager): per-partition (count, sum) — materializes the
    // range shuffle; pass 2 reuses the shuffle files (map stage
    // skipped), so the input cache can be dropped right after.
    // A caller-owned cache (sharedCache / explicit persist) is left
    // alone — ops that scan the same input through several PrefixScan
    // calls (e.g. three ntile axes) keep one materialization.
    val stats = rdd.mapPartitionsWithIndex { (pid, it) =>
      var n = 0L; var s = 0L
      it.foreach { r =>
        n += 1
        vIdx.foreach(i => if (!r.isNullAt(i)) s += r.getLong(i))
      }
      Iterator((pid, n, s))
    }.collect().sortBy(_._1)
    if (!callerCached) input.unpersist(blocking = false)
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

  /** Result of [[withRunningMax]]: stamped frame, grand row count, and
    * the grand max (None when every value was null). */
  final case class ScannedMax(df: DataFrame, n: Long, grandMax: Option[Long])

  /** Running MAX under a total order — the prefix-scan twin of
    * [[withRankCumSum]] for `max(v) OVER (ORDER BY ...)` (inclusive) or
    * `max(v) OVER (ORDER BY ... ROWS BETWEEN UNBOUNDED PRECEDING AND 1
    * PRECEDING)` (exclusive — the record-high / prior-peak frame).
    * Same two passes over the same range exchange: the stats job
    * collects one (count, max) pair per partition, a driver prefix-max
    * turns them into per-partition seed maxes, and the stamping pass
    * emits each row's running max fully in parallel. Max is
    * associative and order-insensitive within the prefix, so the
    * result is bit-identical to the single-partition WindowExec form
    * at any partition count. `maxName` is nullable: exclusive scans
    * have no prior for the global first row (and an all-null prefix
    * has no max). Null values never update the running max. Ports
    * win-drawdown / win-ulcer-index / win-record-highs off the
    * unpartitioned-window allowlist (r10 verdict item 7). */
  def withRunningMax(df: DataFrame, order: Seq[Column], valueCol: String,
                     maxName: String = "runmax",
                     inclusive: Boolean = true): ScannedMax = {
    val spark = df.sparkSession
    val parts = math.max(1,
      spark.conf.getOption("spark.sql.shuffle.partitions").flatMap(_.toIntOption)
        .getOrElse(spark.sparkContext.defaultParallelism))
    val callerCached = df.storageLevel != StorageLevel.NONE
    val input = if (callerCached) df else df.persist()
    val ordered = input
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    val vIdx = ordered.schema.fieldIndex(valueCol)
    val rdd = ordered.rdd
    val stats = rdd.mapPartitionsWithIndex { (pid, it) =>
      var n = 0L; var has = false; var m = Long.MinValue
      it.foreach { r =>
        n += 1
        if (!r.isNullAt(vIdx)) { has = true; m = math.max(m, r.getLong(vIdx)) }
      }
      Iterator((pid, n, has, m))
    }.collect().sortBy(_._1)
    if (!callerCached) input.unpersist(blocking = false)
    val nTotal = stats.iterator.map(_._2).sum
    // seed max of everything BEFORE partition pid
    val seeds: Map[Int, Option[Long]] = {
      var cur: Option[Long] = None
      stats.map { case (pid, _, has, m) =>
        val e = pid -> cur
        if (has) cur = Some(cur.fold(m)(math.max(_, m)))
        e
      }.toMap
    }
    val grand = {
      val ms = stats.filter(_._3).map(_._4)
      if (ms.isEmpty) None else Some(ms.max)
    }
    val schema = StructType(
      ordered.schema.fields :+ StructField(maxName, LongType, nullable = true))
    val stamped = rdd.mapPartitionsWithIndex { (pid, it) =>
      var run: Option[Long] = seeds.getOrElse(pid, None)
      it.map { row =>
        val v = if (row.isNullAt(vIdx)) None else Some(row.getLong(vIdx))
        if (inclusive) {
          v.foreach(x => run = Some(run.fold(x)(math.max(_, x))))
          Row.fromSeq(row.toSeq :+ run.map(Long.box).orNull)
        } else {
          val prior = run
          v.foreach(x => run = Some(run.fold(x)(math.max(_, x))))
          Row.fromSeq(row.toSeq :+ prior.map(Long.box).orNull)
        }
      }
    }
    ScannedMax(spark.createDataFrame(stamped, schema), nTotal, grand)
  }

  /** Result of [[withRankCumSums]]: stamped frame, grand row count and
    * the grand total of each value column, in `valueCols` order. */
  final case class ScannedN(df: DataFrame, n: Long, totals: Seq[Long])

  /** Multi-value generalization of [[withRankCumSum]]: one rank column
    * plus an inclusive running Long sum per entry of `valueCols`, all
    * from the same two passes (one range exchange, one stats collect of
    * |partitions|·(1+|valueCols|) longs, one stamping pass). Use when an
    * op needs several `sum(v) OVER (ORDER BY ...)` columns on the same
    * total order — e.g. per-class cumulative counts for midranks. Same
    * invariants as [[withRankCumSum]]: total order, LongType values
    * (nulls count as 0). */
  def withRankCumSums(df: DataFrame, order: Seq[Column], valueCols: Seq[String],
                      rankName: String, cumNames: Seq[String]): ScannedN = {
    require(valueCols.length == cumNames.length, "one cum name per value column")
    val spark = df.sparkSession
    val parts = math.max(1,
      spark.conf.getOption("spark.sql.shuffle.partitions").flatMap(_.toIntOption)
        .getOrElse(spark.sparkContext.defaultParallelism))
    val callerCached = df.storageLevel != StorageLevel.NONE
    val input = if (callerCached) df else df.persist()
    val ordered = input
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    val vIdx = valueCols.map(ordered.schema.fieldIndex).toArray
    val k = vIdx.length
    val rdd = ordered.rdd
    val stats = rdd.mapPartitionsWithIndex { (pid, it) =>
      var n = 0L; val s = new Array[Long](k)
      it.foreach { r =>
        n += 1
        var j = 0
        while (j < k) { if (!r.isNullAt(vIdx(j))) s(j) += r.getLong(vIdx(j)); j += 1 }
      }
      Iterator((pid, n, s))
    }.collect().sortBy(_._1)
    if (!callerCached) input.unpersist(blocking = false)
    val nTotal = stats.iterator.map(_._2).sum
    val totals = (0 until k).map(j => stats.iterator.map(_._3(j)).sum)
    val offs: Map[Int, (Long, Array[Long])] = {
      var n = 0L; val s = new Array[Long](k)
      stats.map { case (pid, pn, ps) =>
        val e = pid -> (n, s.clone())
        n += pn
        var j = 0; while (j < k) { s(j) += ps(j); j += 1 }
        e
      }.toMap
    }
    val schema = StructType(ordered.schema.fields ++
      (StructField(rankName, LongType, nullable = false) +:
        cumNames.map(c => StructField(c, LongType, nullable = false))))
    val stamped = rdd.mapPartitionsWithIndex { (pid, it) =>
      val (r0, s0) = offs.getOrElse(pid, (0L, new Array[Long](k)))
      var i = 0L; val run = s0.clone()
      it.map { row =>
        i += 1
        var j = 0
        while (j < k) { if (!row.isNullAt(vIdx(j))) run(j) += row.getLong(vIdx(j)); j += 1 }
        Row.fromSeq((row.toSeq :+ (r0 + i)) ++ run.toSeq)
      }
    }
    ScannedN(spark.createDataFrame(stamped, schema), nTotal, totals)
  }

  /** Boundary-stitched neighbor stamp — the scale-safe replacement for
    * `lag(c, 1) OVER (ORDER BY ...)` / `lead(c, 1) OVER (ORDER BY ...)`
    * with NO partition clause, which Spark executes as a full sort into
    * one task. Range exchange + local sort as in [[withRankCumSum]];
    * one tiny stats pass collects each partition's FIRST and LAST values
    * of the tracked columns (2·|partitions| tuples to the driver), so
    * the stamping pass fills every partition's edge row from its
    * neighbor partition's edge value and all interior rows from the
    * adjacent local row. The global first (lag) / last (lead) row gets
    * null, exactly like the window builtin with no default. Stamped
    * columns are named `<col><suffix>` and keep the source type. The
    * order must be TOTAL (same re-sort invariant as withRankCumSum). */
  def withNeighbor(df: DataFrame, order: Seq[Column], cols: Seq[String],
                   lead: Boolean = false, suffix: String = "_adj"): DataFrame = {
    val spark = df.sparkSession
    val parts = math.max(1,
      spark.conf.getOption("spark.sql.shuffle.partitions").flatMap(_.toIntOption)
        .getOrElse(spark.sparkContext.defaultParallelism))
    val callerCached = df.storageLevel != StorageLevel.NONE
    val input = if (callerCached) df else df.persist()
    val ordered = input
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    val idxs = cols.map(ordered.schema.fieldIndex).toArray
    val rdd = ordered.rdd
    val edges: Array[(Int, Option[(Seq[Any], Seq[Any])])] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        if (!it.hasNext) Iterator((pid, None))
        else {
          val first = it.next()
          var last = first
          while (it.hasNext) last = it.next()
          Iterator((pid,
            Some((idxs.toSeq.map(first.get), idxs.toSeq.map(last.get)))))
        }
      }.collect().sortBy(_._1)
    if (!callerCached) input.unpersist(blocking = false)
    // carry per partition: nearest non-empty neighbor's edge tuple
    val carry = new Array[Seq[Any]](edges.length)
    if (!lead) {
      var prev: Seq[Any] = null
      edges.foreach { case (pid, e) =>
        carry(pid) = prev
        e.foreach { case (_, lastV) => prev = lastV }
      }
    } else {
      var nxt: Seq[Any] = null
      edges.reverse.foreach { case (pid, e) =>
        carry(pid) = nxt
        e.foreach { case (firstV, _) => nxt = firstV }
      }
    }
    val nulls: Seq[Any] = idxs.toSeq.map(_ => null)
    val schema = StructType(ordered.schema.fields ++ cols.map(c =>
      StructField(c + suffix, ordered.schema(c).dataType, nullable = true)))
    val stamped = rdd.mapPartitionsWithIndex { (pid, it) =>
      val boundary = Option(carry(pid)).getOrElse(nulls)
      if (!lead) {
        var prev: Seq[Any] = boundary
        it.map { row =>
          val out = Row.fromSeq(row.toSeq ++ prev)
          prev = idxs.toSeq.map(row.get)
          out
        }
      } else new Iterator[Row] {
        private var cur: Row = if (it.hasNext) it.next() else null
        def hasNext: Boolean = cur != null
        def next(): Row = {
          val nx = if (it.hasNext) it.next() else null
          val nv = if (nx != null) idxs.toSeq.map(nx.get) else boundary
          val out = Row.fromSeq(cur.toSeq ++ nv)
          cur = nx
          out
        }
      }
    }
    spark.createDataFrame(stamped, schema)
  }

  /** `ntile(k) OVER (ORDER BY ...)` reconstructed from a [[withRankCumSum]]
    * rank and the total row count — the SQL-standard bucket split (first
    * `n % k` buckets hold `n/k + 1` rows, the rest `n/k`), matching
    * Spark's and DuckDB's ntile exactly. Integer arithmetic via floor of
    * a Long/Long division — exact while ranks stay below 2^53, i.e. for
    * any realizable row count. */
  /** Result of [[ntileSpans]]: the span table plus the grand row count. */
  final case class Spans(df: DataFrame, n: Long)

  /** ntile(k) bucket assignment WITHOUT a row-level rank, for ops whose
    * per-bucket statistics depend only on a value histogram: rows that
    * share the leading order value are interchangeable, so collapse to
    * the per-value histogram FIRST (caller does this — map-side
    * combine, |domain| rows out), then split each value's contiguous
    * rank interval across the ntile bucket boundaries it crosses. The
    * output has every histogram column plus `fileName` (1-based bucket,
    * Long) and `rowsName` (rows of that value in that bucket, Long) —
    * ≤ |domain| + k − 1 rows total. Per-bucket min/max/count over the
    * value column aggregate from it exactly as from a row-level
    * ntile with any tiebreak WITHIN the value. The histogram pass is a
    * PrefixScan two-pass, so there is no single-partition sort at any
    * cardinality. */
  def ntileSpans(hist: DataFrame, order: Seq[Column], countCol: String, k: Long,
                 fileName: String = "f", rowsName: String = "rows_f"): Spans = {
    val sc = withRankCumSum(hist, order, Some(countCol),
      rankName = "__vrk", cumName = "__cum")
    val n = sc.total
    val q = n / k; val rem = n % k; val cut = rem * (q + 1)
    def fileOf(r: Column): Column =
      if (q == 0L) r
      else if (rem == 0L) floor((r - 1) / q) + 1
      else when(r <= cut, floor((r - 1) / (q + 1)) + 1)
        .otherwise(lit(rem) + floor((r - 1 - cut) / q) + 1)
    def firstRank(f: Column): Column =
      if (q == 0L) f
      else if (rem == 0L) (f - 1) * q + 1
      else when(f <= rem, (f - 1) * (q + 1) + 1)
        .otherwise(lit(cut) + (f - lit(rem) - 1) * q + 1)
    def lastRank(f: Column): Column =
      if (q == 0L) f
      else if (rem == 0L) f * q
      else when(f <= rem, f * (q + 1)).otherwise(lit(cut) + (f - rem) * q)
    val out = sc.df
      .withColumn("__rs", col("__cum") - col(countCol) + 1)
      .withColumn("__re", col("__cum"))
      .withColumn(fileName, explode(sequence(
        fileOf(col("__rs")).cast(LongType), fileOf(col("__re")).cast(LongType))))
      .withColumn(rowsName,
        least(col("__re"), lastRank(col(fileName))) -
          greatest(col("__rs"), firstRank(col(fileName))) + 1)
      .drop("__vrk", "__cum", "__rs", "__re")
    Spans(out, n)
  }

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
