package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-10 batch G (charset source, Data
  * Vault, HNSW layers). */
class Round10gOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("src-csv-charset: accents survive the Latin-1 round trip") {
    val rows = run("src-csv-charset").collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      val note = r.getAs[String]("note")
      assert(note.endsWith(" à Zürich é"), s"accents corrupted: $note")
      assert(r.getAs[Long]("n_chars") == note.length.toLong)
      assert(!note.contains("Ã"), "UTF-8 mojibake detected")
    }
  }

  test("sink-data-vault: delta load inserts exactly the changed keys") {
    val r = run("sink-data-vault").head()
    assert(r.getAs[Long]("n_hub_customers") == r.getAs[Long]("n_sat_keys"))
    assert(r.getAs[Long]("n_changed") >= 1)
    assert(r.getAs[Long]("max_versions") == 2)
    assert(r.getAs[Long]("orphan_links") == 0)
    assert(r.getAs[Long]("n_hub_orders") > r.getAs[Long]("n_hub_customers"))
  }

  test("ann-hnsw-layers: geometric decay, level-0 holds ~15/16 of vectors") {
    val rows = run("ann-hnsw-layers").collect()
    assert(rows.nonEmpty)
    val l0 = rows.find(_.getAs[Int]("level") == 0).get
    val n = rows.map(_.getAs[Long]("n_vectors")).sum
    assert(l0.getAs[Long]("n_vectors") > n * 8 / 10)
    val ns = rows.sortBy(_.getAs[Int]("level")).map(_.getAs[Long]("n_vectors"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a > b })
  }
}
