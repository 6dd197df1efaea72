package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{classic, Column, DataFrame}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom plan (preference tier (c), see the builder
  * guidelines): top-k rows per key under a total sort order.
  *
  * Spark expresses this as `row_number() OVER (PARTITION BY key ORDER
  * BY ord) <= k` — a WindowExec that shuffles EVERY row of every key
  * and fully sorts each key partition before discarding all but k rows.
  * At 100 TB that is a full-data shuffle + sort for an output that is
  * k·|keys| rows. This operator plans the same semantics as two bounded
  * heaps:
  *
  *  - partial [[TopKPerKeyExec]] (map side, no distribution
  *    requirement): one k-bounded heap per key per input partition —
  *    at most k·|local keys| rows survive to the shuffle;
  *  - final [[TopKPerKeyExec]] (requires `ClusteredDistribution(keys)`
  *    — Catalyst inserts the hash exchange): merges the partial
  *    survivors with the same heap.
  *
  * Memory is O(|keys in partition| · k) rows instead of a sort buffer
  * over the partition; shuffle volume is bounded by k per key per map
  * partition instead of the full table. The sort order must be total
  * (tiebreak included) for deterministic results — same contract as
  * every query in this engine.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                      child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKPerKey {
  /** Keep the first k rows per key under `order` — (column, ascending)
    * pairs, first entry highest priority; include a tiebreak for a
    * total order. Attributes resolve by name against the input's
    * analyzed output (plain Catalyst expressions — the public Column
    * API's sort nodes carry non-serializable internals in Spark 4).
    * Registers the planner strategy on the session idempotently, so
    * the operator works with or without the GraftExtensions
    * injection. */
  def of(df: DataFrame, keys: Seq[String], order: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    val analyzed = df.queryExecution.analyzed
    // resolve with the session's resolver (case-insensitive unless
    // spark.sql.caseSensitive) — matching every other API path; a
    // strict == here would reject "O_ORDERSTATUS" that select() accepts
    val resolver = spark.sessionState.conf.resolver
    def attr(n: String): Attribute = {
      val hits = analyzed.output.filter(a => resolver(a.name, n))
      hits match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"column $n not in ${analyzed.output.map(_.name).mkString(", ")}")
        case many => throw new IllegalArgumentException(
          s"column $n is ambiguous among ${many.map(_.name).mkString(", ")}")
      }
    }
    val sortOrders = order.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    Bridge.ofRows(spark, TopKPerKey(keys.map(attr), sortOrders, k, analyzed))
  }
}

/** Physical bounded-heap top-k-per-key. `partial = true` runs pre-shuffle
  * with no distribution requirement; `partial = false` declares
  * `ClusteredDistribution(keys)` so all survivors of a key meet in one
  * partition. Both phases run the identical heap, so the merge is
  * associative by construction. */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution) else Seq(ClusteredDistribution(keys))

  // rows are only filtered within partitions, so the child's (post-
  // exchange, key-clustered) partitioning survives — declaring it lets
  // a downstream groupBy/join on the same keys skip its own exchange
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    val kLocal = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // total comparator from the SortOrder spec; max under it = the
      // worst kept row, which is what a k-bounded keep-best heap evicts
      val rowOrd = RowOrdering.create(sortOrder, childOutput)
      val heaps = scala.collection.mutable.HashMap
        .empty[InternalRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        // probe with the reused projection output first; copy() the key
        // only on first sight — the common hit path allocates nothing
        val probe = keyProj(row)
        val heap = heaps.get(probe) match {
          case Some(h) => h
          case None =>
            val h = scala.collection.mutable.PriorityQueue.empty[InternalRow](rowOrd)
            heaps.put(probe.copy(), h)
            h
        }
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (rowOrd.lt(row, heap.head)) { heap.dequeue(); heap.enqueue(row.copy()) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Plans the logical [[TopKPerKey]] as partial-then-final
  * [[TopKPerKeyExec]]; EnsureRequirements inserts the key exchange
  * between them. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}
