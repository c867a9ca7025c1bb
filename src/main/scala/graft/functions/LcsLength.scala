package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftcompat.ColumnCompat
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Longest-common-subsequence LENGTH of two token arrays — the ROUGE-L
  * kernel as ONE native call per row. Classic O(|a|·|b|) DP with two
  * rolling int rows; tokens are compared by their xxHash64 fingerprint
  * (hashed once per token, so the inner loop compares longs, not
  * strings — the [[NgramClip]] 64-bit identity precedent: a colliding
  * pair of DISTINCT tokens needs ~2⁻⁶⁴ odds). Null tokens cannot occur
  * in `split` output and hash as empty strings if present (same
  * contract as NgramClip).
  *
  * There is no shuffle and no gram materialization: the whole ROUGE-L
  * family is a row-local projection over the candidate/reference pair
  * table, which is what keeps it linear at corpus scale (the
  * generation-eval plan guard's family). */
case class LcsLength(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  private def ok(t: DataType) = t match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lcs_length requires two array<string> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    LcsLength.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.LcsLength$$.MODULE$$.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LcsLength {
  /** Column-facing constructor. */
  def apply(a: Column, b: Column): Column =
    ColumnCompat.column(LcsLength(
      ColumnCompat.expression(a), ColumnCompat.expression(b)))

  private def hashes(a: ArrayData): Array[Long] = {
    val n = a.numElements()
    val h = new Array[Long](n)
    var i = 0
    while (i < n) {
      val t = if (a.isNullAt(i)) UTF8String.EMPTY_UTF8 else a.getUTF8String(i)
      h(i) = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(t, StringType, 42L)
      i += 1
    }
    h
  }

  /** Called from generated code. */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements(); val m = b.numElements()
    if (n == 0 || m == 0) return 0L
    val ah = hashes(a); val bh = hashes(b)
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      val ai = ah(i - 1)
      var j = 1
      while (j <= m) {
        cur(j) =
          if (ai == bh(j - 1)) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m).toLong
  }
}
