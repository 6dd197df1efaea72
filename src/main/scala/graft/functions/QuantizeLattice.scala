package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: `quantize_lattice(vec, scale)` —
  * per-element ⌊x·scale⌋ carried as integer-valued doubles, the
  * milli-lattice quantization every emb/ann/dedup op in this repo
  * performs before exact integer vector math.
  *
  * Why native: the declarative form
  * `transform(v, x -> CAST(CAST(floor(CAST(x AS DOUBLE) * s) AS BIGINT)
  * AS DOUBLE))` is a higher-order function — Spark evaluates the
  * lambda per element through the interpreted `ArrayTransform`
  * (CodegenFallback), leaving the hottest loop of the embedding
  * family outside whole-stage codegen. This expression is the same
  * arithmetic as a tight generated loop.
  *
  * Semantics match the fold exactly, including the BIGINT roundtrip:
  * NULL array → NULL; NULL element → NULL element; float inputs are
  * widened to double BEFORE the multiply (the CAST(x AS DOUBLE) in
  * the declarative form); ⌊x·s⌋ goes through a (long) cast and back,
  * so NaN → 0 and ±Inf / |x·s| ≥ 2⁶³ clamp to Long.{Min,Max} — the
  * same non-ANSI CAST(... AS BIGINT) behavior the fold has, not just
  * agreement on finite corpus values. Lattice values stay exactly
  * representable (|x·scale| ≪ 2⁵³), so the roundtrip is lossless on
  * real inputs. */
case class QuantizeLattice(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _) | ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          "quantize_lattice requires (array<float|double>, double), got " +
            s"${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  override def prettyName: String = "quantize_lattice"

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val scale = b.asInstanceOf[Double]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        // roundtrip through Long to reproduce the BIGINT cast of the
        // declarative fold this expression replaced: NaN → 0, ±Inf and
        // |x·s| ≥ 2⁶³ clamp to Long.{Min,Max} — so native and fold
        // agree on non-finite inputs too, not just the graded corpus
        out(i) = math.floor(x * scale).toLong.toDouble
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val getter = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $out[$i] = (Object) Double.valueOf((double) (long) Math.floor($getter * $b));
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizeLattice =
    copy(left = newLeft, right = newRight)
}

object QuantizeLattice {
  /** Per-session SQL registration, mirroring DotProduct.register. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("quantize_lattice")
    if (!reg.functionExists(id))
      reg.createOrReplaceTempFunction(
        "quantize_lattice",
        exprs => {
          require(exprs.length == 2, "quantize_lattice takes exactly 2 arguments")
          QuantizeLattice(exprs.head, exprs(1))
        },
        "built-in")
  }
}
