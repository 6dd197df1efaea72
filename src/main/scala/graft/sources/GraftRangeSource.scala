package graft.sources

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

/** A full DataSource V2 connector (`spark.read.format("graft-range")`):
  * a deterministic synthetic fact generator with the two pushdowns a
  * production connector must implement to be usable at 100 TB —
  *
  *  - **column pruning** (`SupportsPushDownRequiredColumns`): the
  *    readers materialize only the projected fields, so
  *    `select(bucket)` never pays for the others (the parquet
  *    ReadSchema discipline, source-side);
  *  - **predicate pushdown** (`SupportsPushDownFilters`): range
  *    predicates on `id` narrow the generated interval BEFORE
  *    partition planning — the source plans fewer/smaller input
  *    partitions instead of generating rows a Filter node then drops
  *    (the connector-level analogue of partition pruning). Accepted
  *    filters are removed from the residual: the scan's output
  *    already satisfies them exactly.
  *
  * Data is split into `slices` equal ranges, one `InputPartition`
  * each — generation is embarrassingly parallel with zero driver-side
  * materialization, the property every genuinely scalable source
  * shares. Row values are pure functions of `id` so any engine can
  * reproduce them (the DuckDB oracle uses `generate_series` + the
  * same arithmetic).
  */
class GraftRangeSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-range"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftRangeSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new GraftRangeTable(properties.asScala.toMap)
}

object GraftRangeSource {
  val Schema: StructType = new StructType()
    .add("id", LongType, nullable = false)
    .add("val", DoubleType, nullable = false)
    .add("bucket", IntegerType, nullable = false)

  /** The deterministic row function, shared with tests/oracles:
    * val = ((id*37) mod 1000) / 10.0, bucket = id mod 10. */
  def valOf(id: Long): Double = ((id * 37) % 1000).toDouble / 10.0
  def bucketOf(id: Long): Int = (id % 10).toInt
}

private[sources] class GraftRangeTable(props: Map[String, String])
  extends Table with SupportsRead {
  override def name(): String = s"graft_range(${props.getOrElse("rows", "0")})"
  override def schema(): StructType = GraftRangeSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftRangeScanBuilder(
      options.getLong("rows", props.getOrElse("rows", "1000").toLong),
      options.getInt("slices", props.getOrElse("slices", "8").toInt))
}

private[sources] class GraftRangeScanBuilder(rows: Long, slices: Int)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = 0L          // inclusive
  private var hi = rows        // exclusive
  private var accepted = Array.empty[Filter]
  private var required: StructType = GraftRangeSource.Schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, residual) = filters.partition {
      case GreaterThan("id", _: Long) | GreaterThanOrEqual("id", _: Long) |
           LessThan("id", _: Long) | LessThanOrEqual("id", _: Long) |
           EqualTo("id", _: Long) => true
      case _ => false
    }
    ours.foreach {
      case GreaterThan("id", v: Long)        => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long)           => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: Long)    => hi = math.min(hi, v + 1)
      case EqualTo("id", v: Long)            => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _                                 => ()
    }
    accepted = ours
    residual // accepted filters are satisfied exactly by the narrowed range
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new GraftRangeScan(lo, math.max(lo, hi), slices, required)
}

private[sources] class GraftRangeScan(lo: Long, hi: Long, slices: Int,
                                      required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftRangeScan[$lo,$hi) slices=$slices cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    if (n <= 0) return Array.empty
    val per = math.max(1L, (n + slices - 1) / slices)
    (lo until hi by per).map(s =>
      GraftRangePartition(s, math.min(hi, s + per)): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftRangeReaderFactory(required.fieldNames)
}

private[sources] case class GraftRangePartition(start: Long, end: Long)
  extends InputPartition

private[sources] class GraftRangeReaderFactory(cols: Array[String])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftRangePartition]
    new PartitionReader[InternalRow] {
      private var id = p.start - 1
      override def next(): Boolean = { id += 1; id < p.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(cols.toSeq.map {
          case "id"     => id
          case "val"    => GraftRangeSource.valOf(id)
          case "bucket" => GraftRangeSource.bucketOf(id)
        })
      override def close(): Unit = ()
    }
  }
}
