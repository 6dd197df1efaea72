package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity between two double
  * arrays in a single fused pass (dot product + both norms), with full
  * whole-stage codegen.
  *
  * Why a custom Expression (preference tier (b), see the builder
  * guidelines): the declarative alternative —
  * aggregate(zip_with(a, b, …)) — is a higher-order function that Spark
  * evaluates interpreted (per-element lambda invocation, no codegen);
  * measured ~30× slower in pairwise similarity hot paths. This fuses the
  * three reductions into one primitive loop inside the generated Java,
  * keeping the whole operator pipeline in WholeStageCodegen.
  *
  * Summation order is the sequential left fold (((0+t0)+t1)+…) — the
  * same order as the SQL fold, the Scala kernel in TextDedup.dotLoop,
  * and DuckDB's list_inner_product, so all implementations agree
  * bit-for-bit on the same input.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // ExpectsInputTypes would be the idiomatic coercion hook, but its
  // AbstractDataType signature is private[sql]; a checkInputDataTypes
  // override gives the same analysis-time rejection without coercion.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_similarity requires two array<double> arguments, got " +
            s"${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_similarity"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i);
         |  double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Register as SQL function `cosine_similarity` in the session —
    * truly idempotent: re-registering an existing name would log a
    * "replaced a previously registered function" warning per call, so
    * the existence check keeps repeated op invocations (Verify/Bench
    * run hundreds in one session) silent. Usable from
    * expr("cosine_similarity(a, b)"). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_similarity")
    if (!reg.functionExists(id))
      reg.createOrReplaceTempFunction(
        "cosine_similarity",
        exprs => {
          require(exprs.length == 2, "cosine_similarity takes exactly 2 arguments")
          CosineSimilarity(exprs.head, exprs(1))
        },
        "built-in")
  }
}
