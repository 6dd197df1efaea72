package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Hamming distance between two equal-length
  * strings (position-wise mismatch count), fully codegen'd.
  *
  * Motivation: SimHash near-dup verification compares millions of
  * candidate fingerprint pairs; a byte-wise loop inside whole-stage
  * codegen keeps that pipeline jit-compiled, where a UDF would break the
  * codegen span and pay per-row (de)serialization. Semantics match
  * DuckDB's mismatches()/hamming() for the ASCII fingerprints it is used
  * on (byte-wise compare; both engines error/degrade only on non-ASCII,
  * which cannot occur for '0'/'1' bit strings).
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hamming_distance requires two string arguments, got ${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "hamming_distance"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String].getBytes
    val y = b.asInstanceOf[UTF8String].getBytes
    require(x.length == y.length,
      s"hamming_distance requires equal-length inputs (${x.length} vs ${y.length})")
    var diff = 0; var i = 0
    while (i < x.length) { if (x(i) != y(i)) diff += 1; i += 1 }
    diff
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xa = ctx.freshName("xa")
      val xb = ctx.freshName("xb")
      val i = ctx.freshName("i")
      val diff = ctx.freshName("diff")
      s"""
         |byte[] $xa = $a.getBytes();
         |byte[] $xb = $b.getBytes();
         |if ($xa.length != $xb.length) {
         |  throw new IllegalArgumentException(
         |    "hamming_distance requires equal-length inputs (" + $xa.length + " vs " + $xb.length + ")");
         |}
         |int $diff = 0;
         |for (int $i = 0; $i < $xa.length; $i++) {
         |  if ($xa[$i] != $xb[$i]) $diff++;
         |}
         |${ev.value} = $diff;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

object HammingDistance {
  /** Register as SQL function `hamming_distance` (truly idempotent —
    * existence check avoids per-call replacement warnings). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("hamming_distance")
    if (!reg.functionExists(id))
      reg.createOrReplaceTempFunction(
        "hamming_distance",
        exprs => {
          require(exprs.length == 2, "hamming_distance takes exactly 2 arguments")
          HammingDistance(exprs.head, exprs(1))
        },
        "built-in")
  }
}
