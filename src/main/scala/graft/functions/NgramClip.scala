package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftcompat.ColumnCompat
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Clipped word-n-gram overlap of two token arrays — the BLEU/ROUGE
  * kernel's per-pair hot loop as ONE native call per row: Σ over
  * distinct candidate n-grams of min(count_cand, count_ref).
  *
  * The composable form (per-gram xxhash64 + sort_array HOFs feeding a
  * multiset merge) evaluates interpreted lambdas per token; this packs
  * the same computation into two tight JVM passes — hash each token's
  * bytes once (xxHash64 via Spark's own XXH64), combine adjacent
  * hashes into n-gram fingerprints (golden-ratio mix — both sides use
  * the identical combiner, so equality is preserved; a colliding PAIR
  * of distinct grams needs ~2⁶⁴ odds, the engine-wide 64-bit
  * shingle-identity precedent), sort, two-pointer intersect. Null
  * tokens cannot occur in `split` output and are hashed as empty
  * strings if present. */
case class NgramClip(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {

  require(n >= 1 && n <= 8, s"n in [1,8], got $n")

  override def dataType: DataType = LongType

  private def ok(t: DataType) = t match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ngram_clip requires two array<string> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def nullSafeEval(c: Any, r: Any): Any =
    NgramClip.compute(c.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, r) =>
      s"${ev.value} = graft.functions.NgramClip$$.MODULE$$.compute($c, $r, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NgramClip {
  /** Column-facing constructor. */
  def apply(cand: Column, ref: Column, n: Int): Column =
    ColumnCompat.column(NgramClip(
      ColumnCompat.expression(cand), ColumnCompat.expression(ref), n))

  private val Mix = 0x9E3779B97F4A7C15L // golden-ratio odd constant

  /** Sorted n-gram fingerprints of a token array. */
  private def grams(a: ArrayData, n: Int): Array[Long] = {
    val m = a.numElements()
    if (m < n) return Array.emptyLongArray
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      val t = if (a.isNullAt(i)) UTF8String.EMPTY_UTF8
        else a.getUTF8String(i)
      th(i) = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(t, StringType, 42L)
      i += 1
    }
    val out = new Array[Long](m - n + 1)
    i = 0
    while (i <= m - n) {
      var h = th(i)
      var j = 1
      while (j < n) { h = h * Mix + th(i + j); j += 1 }
      out(i) = h
      i += 1
    }
    java.util.Arrays.sort(out)
    out
  }

  /** Called from generated code. */
  def compute(cand: ArrayData, ref: ArrayData, n: Int): Long = {
    val a = grams(cand, n)
    val b = grams(ref, n)
    var (i, j) = (0, 0)
    var clip = 0L
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { clip += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    clip
  }
}
