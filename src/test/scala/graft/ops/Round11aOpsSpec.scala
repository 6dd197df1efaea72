package graft.ops

import graft.olist.SparkTestBase

/** Round-11 invariants: mm-decode-header (real container bytes) and
  * the MinHash LONG-slot signature rewrite. */
class Round11aOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("mm-decode-header: dimensions parsed from genuine container bytes") {
    val rows = run("mm-decode-header").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val fmt = r.getAs[String]("format")
      // format must come from the magic bytes and match the writer's
      // alternation; dimensions must match the generator formula —
      // i.e. the parser read the right offsets of a REAL header
      assert(fmt == (if ((id / 25) % 2 == 0) "png" else "jpeg"))
      assert(r.getAs[Int]("width") == Multimodal.headerWidth(id))
      assert(r.getAs[Int]("height") == Multimodal.headerHeight(id))
      assert(r.getAs[Long]("n_bytes") == (if (fmt == "png") 45L else 41L))
    }
    assert(rows.exists(_.getAs[String]("format") == "png"))
    assert(rows.exists(_.getAs[String]("format") == "jpeg"))
  }

  test("mediaBytes writes spec-conformant containers (independent parse)") {
    // parse with an independent hand-rolled reader, not the op's SQL
    val png = Multimodal.mediaBytes(0L) // (0/25)%2==0 -> png
    assert(png.take(8).map(_ & 0xff).sameElements(
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)))
    def be32(b: Array[Byte], off: Int): Long =
      ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
        ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
    assert(new String(png.slice(12, 16), "US-ASCII") == "IHDR")
    assert(be32(png, 16) == Multimodal.headerWidth(0L))
    assert(be32(png, 20) == Multimodal.headerHeight(0L))
    // IHDR CRC must be the real CRC32 over type+payload
    val crc = new java.util.zip.CRC32()
    crc.update(png.slice(12, 29))
    assert(be32(png, 29) == crc.getValue)
    val jpg = Multimodal.mediaBytes(25L) // (25/25)%2==1 -> jpeg
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8)
    assert((jpg.last & 0xff) == 0xd9)
    // SOF0 scan exactly as a real decoder does
    val sof = jpg.indices.dropRight(1)
      .find(i => (jpg(i) & 0xff) == 0xff && (jpg(i + 1) & 0xff) == 0xc0).get
    def be16(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
    assert(be16(jpg, sof + 5) == Multimodal.headerHeight(25L))
    assert(be16(jpg, sof + 7) == Multimodal.headerWidth(25L))
  }

  test("minhash LONG slots: sig values are the parsed hex slices") {
    // dedup-minhash-lsh candidates must be insensitive to the slot
    // representation swap: re-derive one doc's 12 slots both ways
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val hashed = Seq((1L, "0123456789abcdef0123456789abcdef" +
      "fedcba9876543210fedcba9876543210")).toDF("doc_id", "h")
    val viaLong = TextDedup.minhashSigFrom(hashed).head()
    val h = "0123456789abcdef0123456789abcdef" +
      "fedcba9876543210fedcba9876543210"
    (1 to 12).foreach { j =>
      val want = java.lang.Long.parseLong(h.substring((j - 1) * 5, (j - 1) * 5 + 5), 16)
      assert(viaLong.getAs[Long](s"m$j") == want)
    }
  }
}
