package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, BinaryExpression, Cast, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: sequential-order dot product of two
  * double arrays (((0 + t0) + t1) + …), fully whole-stage-codegen'd.
  *
  * Semantics mirror the declarative fold
  * `aggregate(zip_with(a, b, (p, q) -> p * q), 0d, (acc, z) -> acc + z)`
  * exactly, including its null behavior: `zip_with` pads the shorter
  * array with NULLs and the running `+` then poisons the whole sum, so
  * a length mismatch or a NULL element yields NULL (empty arrays yield
  * 0.0 — the fold's zero). Matching the fold bit-for-bit is what makes
  * the [[DotProductRewrite]] substitution semantics-preserving.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product requires two array<double> arguments, got " +
            s"${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = DoubleType

  // NULL on length mismatch / NULL element, independent of child nullability
  override def nullable: Boolean = true

  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    var acc = 0.0; var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; }
         |  else { $acc += $a.getDouble($i) * $b.getDouble($i); }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Per-session SQL registration (truly idempotent — existence check
    * avoids per-call "replaced a previously registered function"
    * warnings), mirroring CosineSimilarity.register. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product")
    if (!reg.functionExists(id))
      reg.createOrReplaceTempFunction(
        "dot_product",
        exprs => {
          require(exprs.length == 2, "dot_product takes exactly 2 arguments")
          DotProduct(exprs.head, exprs(1))
        },
        "built-in")
  }
}

/** Optimizer rule: rewrite the interpreted higher-order-function dot
  * product — `aggregate(zip_with(a, b, (p, q) -> p * q), 0.0,
  * (acc, z) -> acc + z)` — into the codegen [[DotProduct]] expression.
  *
  * Higher-order functions evaluate their lambda per element in the
  * interpreter (measured ~30× slower than codegen in similarity hot
  * paths, see CosineSimilarity), so declarative plans that fold vector
  * products — e.g. the sign-LSH plane projections in `ann-lsh-bucket` —
  * silently pay an interpretation tax. With this rule injected
  * (`spark.sql.extensions=graft.functions.GraftExtensions`) they get
  * the native loop without rewriting a line of query code — the
  * optimizer is the right place for a pattern this syntactic.
  *
  * The match is deliberately strict: both lambda bodies must be exactly
  * the bound lambda variables under `*` / `+` (either operand order —
  * both ops commute bitwise in IEEE 754), the fold zero must be 0.0
  * (literal or foldable cast), and the finish lambda must be the
  * identity. Anything else is left untouched.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isZeroDouble(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case c @ Cast(Literal(_, _), DoubleType, _, _) =>
      c.foldable && c.eval() == 0.0
    case _ => false
  }

  private def isVars(f: Expression, u: NamedLambdaVariable, v: NamedLambdaVariable,
                     ctor: Expression => Option[(Expression, Expression)]): Boolean =
    ctor(f).exists {
      case (x: NamedLambdaVariable, y: NamedLambdaVariable) =>
        (x.exprId == u.exprId && y.exprId == v.exprId) ||
          (x.exprId == v.exprId && y.exprId == u.exprId)
      case _ => false
    }

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      v.exprId == arg.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b, LambdaFunction(mul, Seq(p: NamedLambdaVariable, q: NamedLambdaVariable), _)),
        zero,
        LambdaFunction(add, Seq(acc: NamedLambdaVariable, z: NamedLambdaVariable), _),
        finish)
      if a.dataType.isInstanceOf[ArrayType] &&
        a.dataType.asInstanceOf[ArrayType].elementType == DoubleType &&
        b.dataType.isInstanceOf[ArrayType] &&
        b.dataType.asInstanceOf[ArrayType].elementType == DoubleType &&
        isVars(mul, p, q, { case Multiply(x, y, _) => Some((x, y)); case _ => None }) &&
        isVars(add, acc, z, { case Add(x, y, _) => Some((x, y)); case _ => None }) &&
        isZeroDouble(zero) && isIdentity(finish) =>
      DotProduct(a, b)
  }
}
