package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftcompat.ColumnCompat
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Multiset intersection size of two SORTED array<long> columns
  * (duplicates allowed — the two-pointer merge counts each element
  * min(count_left, count_right) times, which is exactly the "clipped"
  * match count BLEU/ROUGE/chrF are defined on).
  *
  * The HOF form — Σ over distinct left grams of min(count_left,
  * count_right) via filter/size — is O(|grams|·|distinct|) per row with
  * an allocation per lambda; this is one fused O(|grams|) merge with no
  * allocation, inside whole-stage codegen. The generation-eval
  * streaming twin runs it once per (candidate, reference) pair, so at
  * service throughput this inner loop is hot — the [[SortedJaccard]]
  * argument, multiset edition.
  *
  * Contract: inputs sorted ascending, duplicates preserved
  * (sort_array WITHOUT array_distinct). */
case class MultisetIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"multiset_intersect requires array<bigint> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  // NULL array elements never match anything (the HOF form's semantics:
  // a null-gram equality predicate is null, so it contributes nothing).
  // sort_array places nulls FIRST for ascending order, so both loops
  // skip the null prefix and the merge runs on the non-null suffix.
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var common = 0L
    while (i < nx && x.isNullAt(i)) i += 1
    while (j < ny && y.isNullAt(j)) j += 1
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { common += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    common
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val c = ctx.freshName("common")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $nx && $a.isNullAt($i)) { $i++; }
         |while ($j < $ny && $b.isNullAt($j)) { $j++; }
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MultisetIntersect {
  /** Column-facing constructor. */
  def apply(a: Column, b: Column): Column =
    ColumnCompat.column(MultisetIntersect(
      ColumnCompat.expression(a), ColumnCompat.expression(b)))
}
