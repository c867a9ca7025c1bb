package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftcompat.ColumnCompat
import org.apache.spark.sql.types.{DataType, DoubleType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The three Gopher repetition signals of one document in ONE native
  * call: most-frequent-bigram fraction, most-frequent-trigram fraction,
  * and the fraction of token positions covered by a duplicated
  * `dupW`-gram. Same values as the composable row-local form it
  * replaces (top-run = longest equal run over sorted grams — any total
  * order groups equals, so JVM sort vs array_sort's binary order cannot
  * change the answer; coverage = distinct union of [p, p+w) over
  * occurrences of grams seen twice), but the composable chain evaluated
  * interpreted lambdas per gram across three sorted-fold pipelines.
  * Divisions are the same exact-int-to-double ratios; the caller
  * applies the same round(…, 6). */
case class GopherRepetition(child: Expression, dupW: Int)
    extends UnaryExpression {

  require(dupW >= 2, s"dupW must be >= 2, got $dupW")

  override def dataType: DataType = StructType(Seq(
    StructField("top2", DoubleType, nullable = false),
    StructField("top3", DoubleType, nullable = false),
    StructField("dup", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gopher_repetition requires a string input, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    GopherRepetition.compute(input.asInstanceOf[UTF8String], dupW)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GopherRepetition$$.MODULE$$.compute($c, $dupW);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GopherRepetition {
  /** Column-facing constructor. */
  def apply(text: Column, dupW: Int): Column =
    ColumnCompat.column(GopherRepetition(ColumnCompat.expression(text), dupW))

  private def grams(toks: Array[String], w: Int): Array[String] = {
    val n = toks.length
    if (n < w) return Array.empty
    val out = new Array[String](n - w + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= n - w) {
      sb.setLength(0)
      var j = 0
      while (j < w) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j)); j += 1
      }
      out(i) = sb.toString; i += 1
    }
    out
  }

  /** Longest equal run in the (sorted-in-place) gram array / count. */
  private def topRunFrac(gs: Array[String]): Double = {
    if (gs.isEmpty) return 0.0
    java.util.Arrays.sort(gs.asInstanceOf[Array[AnyRef]])
    var best = 1; var run = 1
    var i = 1
    while (i < gs.length) {
      run = if (gs(i) == gs(i - 1)) run + 1 else 1
      if (run > best) best = run
      i += 1
    }
    best.toDouble / gs.length.toDouble
  }

  /** Called from generated code. */
  def compute(s: UTF8String, dupW: Int): InternalRow = {
    val toks = s.toString.split(" ", -1)
    val n = toks.length
    val top2 = topRunFrac(grams(toks, 2))
    val top3 = topRunFrac(grams(toks, 3))
    // duplicated-gram coverage: every occurrence of a dupW-gram that
    // appears >= 2 times covers positions [p, p+dupW)
    val g5 = grams(toks, dupW)
    var dup = 0.0
    if (g5.nonEmpty) {
      val counts = new java.util.HashMap[String, Integer](g5.length * 2)
      g5.foreach(g => counts.merge(g, 1, (a, b) => a + b))
      val covered = new Array[Boolean](n)
      var p = 0
      while (p < g5.length) {
        if (counts.get(g5(p)) >= 2) {
          var q = p
          while (q < p + dupW) { covered(q) = true; q += 1 }
        }
        p += 1
      }
      var c = 0
      covered.foreach(b => if (b) c += 1)
      dup = c.toDouble / n.toDouble
    }
    new GenericInternalRow(Array[Any](top2, top3, dup))
  }
}
