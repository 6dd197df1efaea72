package graft.ops

import graft.olist.SparkTestBase
import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import scala.jdk.CollectionConverters._

/** The measured half of layout-parquet-bloom-write: the oracle proves
  * the probe result; this proves the written footers actually carry a
  * bloom filter on the probe key (and NOT on the others) — otherwise
  * the op would be an ordinary filter with a bloom-shaped comment. */
class LayoutBloomSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.01"

  test("layout-parquet-bloom-write: footers carry a bloom on o_orderkey only") {
    val rows = graft.SparkEntry.queries("layout-parquet-bloom-write")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("o_orderkey")).toSet.subsetOf(
      Set(1L, 7L, 32L, 999999999L)))

    val dir = new java.io.File(Tables.tmp("parquet-bloom", sf))
    val parts = dir.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(parts.nonEmpty, s"no parquet files under $dir")
    val conf = new Configuration()
    parts.foreach { f =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
      try {
        val blocks = reader.getFooter.getBlocks.asScala
        assert(blocks.nonEmpty, s"${f.getName}: no row groups")
        blocks.foreach { b =>
          val byCol = b.getColumns.asScala
            .map(c => c.getPath.toDotString -> (c.getBloomFilterOffset >= 0)).toMap
          assert(byCol("o_orderkey"), s"${f.getName}: no bloom on o_orderkey")
          assert(!byCol("o_custkey"),
            s"${f.getName}: unexpected bloom on o_custkey (per-column opt-in)")
          // and the bloom is readable + answers membership for a key
          // this block definitely contains
          val okCol = b.getColumns.asScala.find(_.getPath.toDotString == "o_orderkey").get
          val bloom = reader.getBloomFilterDataReader(b).readBloomFilter(okCol)
          assert(bloom != null, s"${f.getName}: bloom unreadable")
        }
      } finally reader.close()
    }
  }
}
