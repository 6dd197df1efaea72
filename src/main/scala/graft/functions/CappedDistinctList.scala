package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `capped_distinct_list(col, cap)` — collect_set with a HARD state
  * bound, the one-pass df-capped inverted-index builder.
  *
  * Semantics: per group, the sorted array of distinct BIGINT values if
  * the group holds at most `cap` distinct values, else NULL. The NULL
  * is the point: "more than cap distinct" is exactly the hot-key
  * signal LLM-dedup pipelines cut on (a shingle shared by >cap docs is
  * boilerplate, not near-dup signal), so
  *
  *   occurrences.groupBy(k).agg(capped_distinct_list(doc_id, 50))
  *              .filter($"docs".isNotNull)
  *
  * replaces the three-pass form (count-distinct pass → broadcast-anti
  * hot cut → collect_set pass) with ONE shuffle while keeping the
  * bounded-by-construction guarantee the three-pass form existed for:
  * the aggregation state NEVER exceeds cap+1 elements — insertion
  * stops the moment the set proves itself hot — so a skewed key costs
  * O(cap) memory, not O(df). collect_set alone cannot do this (its
  * state grows with the group); the cap must live INSIDE the
  * aggregate, which is why this is a native TypedImperativeAggregate
  * and not a composition.
  *
  * Distributed correctness of the truncation: for a non-hot key the
  * bound is never hit on any partial (a subset of ≤cap distinct values
  * is ≤cap), so no element is ever dropped and the final array is
  * exact. For a hot key, some partial or the merge reaches cap+1
  * elements and stops — the final set still has ≥cap+1 elements, which
  * is all eval() needs to emit NULL. Values beyond cap+1 are
  * irrelevant by construction, so partial aggregation and merge order
  * cannot change the answer.
  *
  * Used by dedup-eval-prf (RelMore52); cap must be a foldable INT
  * literal, the value column BIGINT. */
@ExpressionDescription(
  usage = "_FUNC_(col, cap) - sorted array of distinct values, or NULL if the group has more than cap distinct values.")
case class CappedDistinctList(
    child: Expression,
    capExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashSet[Long]] {

  private lazy val cap: Int = capExpr.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"capped_distinct_list cap must be a foldable integer literal, got $other")
  }

  override def createAggregationBuffer(): java.util.HashSet[Long] =
    new java.util.HashSet[Long]()

  override def update(buffer: java.util.HashSet[Long], input: InternalRow): java.util.HashSet[Long] = {
    val v = child.eval(input)
    // once the set holds cap+1 elements the group is proven hot —
    // stop inserting; the buffer is bounded at cap+1 by construction
    if (v != null && buffer.size() <= cap) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: java.util.HashSet[Long], other: java.util.HashSet[Long]): java.util.HashSet[Long] = {
    val it = other.iterator()
    while (it.hasNext && buffer.size() <= cap) buffer.add(it.next())
    buffer
  }

  override def eval(buffer: java.util.HashSet[Long]): Any =
    if (buffer.size() > cap) null
    else {
      val arr = new Array[Long](buffer.size())
      val it = buffer.iterator()
      var i = 0
      while (it.hasNext) { arr(i) = it.next(); i += 1 }
      java.util.Arrays.sort(arr)
      new GenericArrayData(arr)
    }

  override def serialize(buffer: java.util.HashSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.size())
    bb.putInt(buffer.size())
    val it = buffer.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val set = new java.util.HashSet[Long](Math.max(16, n * 2))
    var i = 0
    while (i < n) { set.add(bb.getLong); i += 1 }
    set
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedDistinctList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedDistinctList =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def children: Seq[Expression] = Seq(child, capExpr)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), capExpr = newChildren(1))
  override def prettyName: String = "capped_distinct_list"
}
