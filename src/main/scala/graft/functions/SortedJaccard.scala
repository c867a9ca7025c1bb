package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftcompat.ColumnCompat
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Jaccard similarity over two SORTED, DISTINCT array<long>
  * columns (element-hash sets, e.g. sort_array of xxhash64'd shingles).
  *
  * The composable form — size(array_intersect) / size(array_union) —
  * walks both arrays twice and builds two intermediate arrays (plus the
  * hash sets Spark's set operations allocate) per comparison; this
  * expression is a single fused two-pointer merge with no allocation,
  * generated inside whole-stage codegen. The dedup verify stage runs it
  * once per candidate pair, so at crawl scale this inner loop is hot.
  *
  * Contract: inputs must be sorted ascending with distinct elements
  * (sort_array(array_distinct(...)) — or sort_array of values that are
  * unique by construction). Empty-vs-empty scores 0.0.
  */
case class SortedJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_jaccard requires array<bigint> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var common = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { common += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    val union = nx + ny - common
    if (union == 0) 0.0 else common.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val c = ctx.freshName("common"); val u = ctx.freshName("union")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |int $u = $nx + $ny - $c;
         |${ev.value} = ($u == 0) ? 0.0 : ((double) $c) / $u;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedJaccard {
  /** Column-facing constructor. */
  def apply(a: Column, b: Column): Column =
    ColumnCompat.column(SortedJaccard(
      ColumnCompat.expression(a), ColumnCompat.expression(b)))
}
