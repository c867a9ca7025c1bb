package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftcompat.ColumnCompat
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Binary-search membership in a SORTED array<string> column — the
  * O(log B) replacement for `array_contains`' linear scan when the
  * array is a corpus-derived set that GROWS with the data (boilerplate
  * segments, stop lists, purge manifests). With both the probe count
  * and the set size proportional to corpus size, the linear scan is a
  * hidden quadratic: the text_boilerplate SCALECURVE measured 54× at
  * 25× data through `array_contains`, and the swap to this expression
  * is what restored the linear curve — the [[SortedJaccard]] argument,
  * membership edition.
  *
  * Contract: the array is sorted ascending in Spark's UTF8String binary
  * order; null elements never match and may sit at EITHER end
  * (`array_sort` places them last, `sort_array` first — the search
  * clamps both ends past any null run before bisecting). */
case class SortedArrayContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_array_contains requires (array<string>, string), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val key = b.asInstanceOf[UTF8String]
    var lo = 0
    var hi = arr.numElements() - 1
    // clamp both ends past null runs (array_sort: last; sort_array: first)
    while (lo <= hi && arr.isNullAt(lo)) lo += 1
    while (lo <= hi && arr.isNullAt(hi)) hi -= 1
    var found = false
    while (lo <= hi && !found) {
      val mid = (lo + hi) >>> 1
      val c = arr.getUTF8String(mid).compareTo(key)
      if (c == 0) found = true
      else if (c < 0) lo = mid + 1
      else hi = mid - 1
    }
    found
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lo = ctx.freshName("lo"); val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid"); val c = ctx.freshName("cmp")
      val found = ctx.freshName("found")
      s"""
         |int $lo = 0; int $hi = $a.numElements() - 1;
         |while ($lo <= $hi && $a.isNullAt($lo)) { $lo++; }
         |while ($lo <= $hi && $a.isNullAt($hi)) { $hi--; }
         |boolean $found = false;
         |while ($lo <= $hi && !$found) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  int $c = $a.getUTF8String($mid).compareTo($b);
         |  if ($c == 0) { $found = true; }
         |  else if ($c < 0) { $lo = $mid + 1; } else { $hi = $mid - 1; }
         |}
         |${ev.value} = $found;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedArrayContains {
  /** Column-facing constructor: `sortedArr` MUST be array_sort output. */
  def apply(sortedArr: Column, key: Column): Column =
    ColumnCompat.column(SortedArrayContains(
      ColumnCompat.expression(sortedArr), ColumnCompat.expression(key)))
}
