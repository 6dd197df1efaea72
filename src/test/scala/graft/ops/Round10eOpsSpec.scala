package graft.ops

import graft.olist.SparkTestBase

/** Structural invariants for round-10 batch E (bloom sizing, row-group
  * advisor, modern SQL surfaces). */
class Round10eOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("layout-bloom-fpp-curve: measured FPP falls as bits/key rise") {
    val rows = run("layout-bloom-fpp-curve").collect()
    assert(rows.length == 4)
    val measured = rows.map(_.getAs[Double]("measured_fpp"))
    val modeled = rows.map(_.getAs[Double]("modeled_fpp"))
    assert(modeled.zip(modeled.tail).forall { case (a, b) => a > b })
    // more bits never hurt (measured is noisy but monotone at 4x steps)
    assert(measured.head >= measured.last)
    // measured within 3x of the textbook model at 4 and 8 bits/key
    rows.take(2).foreach { r =>
      val (mo, me) = (r.getAs[Double]("modeled_fpp"), r.getAs[Double]("measured_fpp"))
      assert(me < mo * 3 + 0.01, s"measured $me vs modeled $mo")
    }
  }

  test("layout-rowgroup-advisor: consistent widths and shared advisory") {
    val rows = run("layout-rowgroup-advisor").collect()
    assert(rows.length == 5)
    val rgRows = rows.map(_.getAs[Long]("rg_rows")).distinct
    assert(rgRows.length == 1, "rows-per-rowgroup is a table-level advisory")
    rows.foreach { r =>
      assert(r.getAs[Long]("bytes_per_value") >= 1)
      assert(r.getAs[Long]("pages_per_rowgroup") >= 1)
      assert(r.getAs[Long]("row_bytes") ==
        rows.map(_.getAs[Long]("bytes_per_value")).sum)
    }
  }

  test("sql-identifier-clause: indirection resolves to the plain query") {
    val rows = run("sql-identifier-clause").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_orders")).sum == 1500)
  }

  test("sql-named-arguments: mask leaves structure, redacts classes") {
    val rows = run("sql-named-arguments").collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val m = r.getAs[String]("masked_name")
      assert(!m.exists(_.isDigit), s"digits must be redacted: $m")
      assert(m.contains("#") || !m.exists(_.isLetterOrDigit) || m.exists(c => c == 'X' || c == 'x'))
    }
  }

  test("sql-session-variable: threshold filters via session state") {
    val rows = run("sql-session-variable").collect()
    assert(rows.nonEmpty && rows.length <= 5)
    assert(rows.map(_.getAs[Long]("n_big")).sum > 0)
  }
}
