package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftcompat.ColumnCompat
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native w-token word shingles: split on single spaces (Java
  * `split(" ", -1)` semantics — empty tokens from doubled/leading/
  * trailing spaces are KEPT, exactly like `split(text, " ")`), then one
  * space-joined string per token window.
  *
  * The composable form —
  * `transform(sequence(...), i => concat_ws(" ", slice(split(text," "), i+1, w)))`
  * — re-evaluates the regex split PER ELEMENT: higher-order functions
  * run interpreted, with no common-subexpression elimination across the
  * lambda boundary, so an n-token document pays n−w+1 full splits
  * (measured 2.6 s for one pass over sf0.1's 5 k docs — the hidden
  * constant under the whole shingle family). This expression splits
  * ONCE per row and builds each shingle with a rolling join.
  *
  * Null text returns null here; [[graft.ops.Dedup.shingleArray]] wraps
  * it in coalesce(…, array()) to preserve the composable form's
  * empty-array-on-null contract. */
case class WordShingles(child: Expression, w: Int) extends UnaryExpression {

  require(w >= 1, s"shingle width must be >= 1, got $w")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires a string input, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles$$.MODULE$$.compute($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  /** Column-facing constructor. */
  def apply(text: Column, w: Int): Column =
    ColumnCompat.column(WordShingles(ColumnCompat.expression(text), w))

  /** One split, n−w+1 rolling joins. Called from generated code. */
  def compute(s: UTF8String, w: Int): ArrayData = {
    val toks = s.toString.split(" ", -1)
    val n = toks.length
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - w + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= n - w) {
      sb.setLength(0)
      var j = 0
      while (j < w) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}
