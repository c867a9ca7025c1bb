package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftcompat.ColumnCompat
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** TOKEN-level Levenshtein distance of two token arrays — the WER
  * kernel as ONE native call per row. Spark's built-in `levenshtein`
  * is CHARACTER-level, which is the wrong unit for ASR / generation
  * word-error-rate (a one-word substitution of different lengths must
  * cost exactly 1); this is the same DP at token granularity:
  * unit-cost insert / delete / substitute, classic O(|a|·|b|) with two
  * rolling int rows. Tokens are compared by their xxHash64 fingerprint
  * (hashed once per token, so the inner loop compares longs — the
  * [[LcsLength]] / [[NgramClip]] 64-bit identity precedent: a
  * colliding pair of DISTINCT tokens needs ~2⁻⁶⁴ odds, and any
  * reachable collision would surface as an oracle hash mismatch since
  * DuckDB compares true strings).
  *
  * Zero shuffles, zero gram materialization: like the ROUGE-L family
  * the whole WER metric is a row-local projection over the
  * candidate/reference pair table (the generation-eval plan-guard
  * family), which keeps it linear at corpus scale.
  *
  * Reference behavior: numaflow UDF containers score generation output
  * per message; WER is the standard sequence-eval companion to the
  * repo's ROUGE-L/BLEU/chrF surface. */
case class TokenEditDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  private def ok(t: DataType) = t match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_edit_distance requires two array<string> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TokenEditDistance.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TokenEditDistance$$.MODULE$$.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TokenEditDistance {
  /** Column-facing constructor. */
  def apply(a: Column, b: Column): Column =
    ColumnCompat.column(TokenEditDistance(
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

  /** Called from generated code. Borders dp[i][0]=i / dp[0][j]=j make
    * the empty-side answer the other side's length (delete/insert
    * everything) — no special-casing beyond the fast exits. */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements(); val m = b.numElements()
    if (n == 0) return m.toLong
    if (m == 0) return n.toLong
    val ah = hashes(a); val bh = hashes(b)
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      val ai = ah(i - 1)
      cur(0) = i
      j = 1
      while (j <= m) {
        val sub = prev(j - 1) + (if (ai == bh(j - 1)) 0 else 1)
        val del = prev(j) + 1
        val ins = cur(j - 1) + 1
        cur(j) = math.min(sub, math.min(del, ins))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m).toLong
  }
}
