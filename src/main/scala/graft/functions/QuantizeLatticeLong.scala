package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression: `quantize_lattice_long(vec, scale)` —
  * per-element CAST(⌊x·scale⌋ AS BIGINT), the micro-lattice (×10⁶)
  * integer quantization behind the emb family's exact vector math.
  * The BIGINT twin of [[QuantizeLattice]] (which keeps doubles for
  * downstream dot_product): same replacement story — the declarative
  * `transform(v, x -> CAST(floor(CAST(x AS DOUBLE) * s) AS BIGINT))`
  * runs through the interpreted ArrayTransform lambda; this is the
  * generated tight loop. NULL array → NULL; NULL element → NULL
  * element; floats widen before the multiply; ⌊x·s⌋ is exactly
  * representable long (|x·s| ≪ 2⁵³), so the double→long cast is the
  * plain truncation both engines share. */
case class QuantizeLatticeLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _) | ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          "quantize_lattice_long requires (array<float|double>, double), got " +
            s"${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def prettyName: String = "quantize_lattice_long"

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
        out(i) = math.floor(x * scale).toLong
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
         |    $out[$i] = (Object) Long.valueOf((long) Math.floor($getter * $b));
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizeLatticeLong =
    copy(left = newLeft, right = newRight)
}

object QuantizeLatticeLong {
  /** Per-session SQL registration, mirroring DotProduct.register. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("quantize_lattice_long")
    if (!reg.functionExists(id))
      reg.createOrReplaceTempFunction(
        "quantize_lattice_long",
        exprs => {
          require(exprs.length == 2,
            "quantize_lattice_long takes exactly 2 arguments")
          QuantizeLatticeLong(exprs.head, exprs(1))
        },
        "built-in")
  }
}
