package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `hex_slice_long(hex, pos, len)` — parse `len` lowercase-hex chars of
  * `hex` starting at 1-based `pos` into a BIGINT (len ≤ 15).
  *
  * Purpose: keep MinHash signature aggregation inside HashAggregate.
  * The per-seed hash functions are 5-hex-char slices of one md5
  * digest; `min(substring(h, p, 5))` is semantically right but its
  * STRING min buffer is not a mutable fixed-width type, so Spark
  * plans the whole signature build as SortAggregate — a full sort of
  * the shingle-occurrence table per query (measured: the single
  * slowest stage of dedup-eval-prf/dedup-minhash-lsh at sf0.1). A
  * fixed-width-hex parse is ORDER-PRESERVING and INJECTIVE
  * (lexicographic order on equal-length lowercase hex = numeric order
  * of the parsed value), so `min(hex_slice_long(h, p, 5))` selects the
  * same shingle as the string min, equality of signature slots is
  * preserved exactly (band keys keep their equality classes; match
  * counts are unchanged), and the 12 min buffers become LONGs —
  * HashAggregate, no sort.
  *
  * Codegen: a `len`-step shift-or loop over the UTF8String's bytes —
  * no allocation per row (substring would copy bytes). Non-hex bytes
  * or an out-of-range slice return NULL (defensive; md5 output can't
  * produce either). */
@ExpressionDescription(
  usage = "_FUNC_(hex, pos, len) - BIGINT value of len lowercase-hex chars at 1-based pos.")
case class HexSliceLong(str: Expression, pos: Expression, len: Expression)
  extends TernaryExpression {

  override def first: Expression = str
  override def second: Expression = pos
  override def third: Expression = len

  override def checkInputDataTypes(): TypeCheckResult =
    if (str.dataType == StringType && pos.dataType == IntegerType &&
        len.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hex_slice_long expects (STRING, INT, INT), got " +
        s"(${str.dataType.sql}, ${pos.dataType.sql}, ${len.dataType.sql})")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "hex_slice_long"

  override protected def nullSafeEval(s: Any, p: Any, l: Any): Any = {
    val u = s.asInstanceOf[UTF8String]
    val base = p.asInstanceOf[Int] - 1
    val n = l.asInstanceOf[Int]
    if (base < 0 || n < 0 || n > 15 || base + n > u.numBytes()) null
    else {
      var v = 0L
      var i = 0
      while (i < n) {
        val b = u.getByte(base + i)
        val d =
          if (b >= '0' && b <= '9') b - '0'
          else if (b >= 'a' && b <= 'f') b - 'a' + 10
          else -1
        if (d < 0) return null
        v = (v << 4) | d
        i += 1
      }
      v
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (s, p, l) => {
      val v = ctx.freshName("v")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val d = ctx.freshName("d")
      val base = ctx.freshName("base")
      val bad = ctx.freshName("bad")
      s"""
         |int $base = $p - 1;
         |boolean $bad = ($base < 0 || $l < 0 || $l > 15 || $base + $l > $s.numBytes());
         |long $v = 0L;
         |if (!$bad) {
         |  for (int $i = 0; $i < $l; $i++) {
         |    byte $b = $s.getByte($base + $i);
         |    int $d = ($b >= '0' && $b <= '9') ? ($b - '0')
         |           : ($b >= 'a' && $b <= 'f') ? ($b - 'a' + 10) : -1;
         |    if ($d < 0) { $bad = true; break; }
         |    $v = ($v << 4) | $d;
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $v; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(str = newFirst, pos = newSecond, len = newThird)
}
