package graft.functions

import graft.olist.SparkTestBase
import org.apache.spark.sql.functions._

/** Contract tests for the native quantize_lattice expression. */
class QuantizeLatticeSpec extends SparkTestBase {

  private def withFn[T](f: => T): T = { QuantizeLattice.register(spark); f }

  test("matches the declarative fold on doubles, including negatives") {
    withFn {
      import spark.implicits._
      val df = Seq(
        (1L, Seq(0.0015, -0.0021, 1.9999, -2.0)),
        (2L, Seq(0.0, 0.001, -0.001, 0.0009999))
      ).toDF("id", "v")
      val r = df.select(
        expr("quantize_lattice(v, 1000.0D)").as("nat"),
        expr("transform(v, x -> CAST(CAST(floor(x * 1000) AS BIGINT) AS DOUBLE))")
          .as("fold")).collect()
      r.foreach { row =>
        assert(row.getSeq[Double](0) == row.getSeq[Double](1))
      }
    }
  }

  test("null array yields null; null elements stay null elementwise") {
    withFn {
      import spark.implicits._
      val df = Seq(
        (1L, Seq[java.lang.Double](1.5, null, -0.25)),
        (2L, null)
      ).toDF("id", "v")
      val rows = df.select(col("id"),
        expr("quantize_lattice(v, 4.0D)").as("q")).orderBy("id").collect()
      val q1 = rows(0).getSeq[java.lang.Double](1)
      assert(q1(0) == 6.0 && q1(1) == null && q1(2) == -1.0)
      assert(rows(1).isNullAt(1))
    }
  }

  test("float input widens to double before scaling") {
    withFn {
      import spark.implicits._
      val df = Seq((1L, Seq(0.1f, -0.3f))).toDF("id", "v")
      val r = df.select(expr("quantize_lattice(v, 1000.0D)")).head()
      val out = r.getSeq[Double](0)
      // identical to the CAST-first declarative semantics
      assert(out(0) == math.floor(0.1f.toDouble * 1000))
      assert(out(1) == math.floor(-0.3f.toDouble * 1000))
    }
  }
}
