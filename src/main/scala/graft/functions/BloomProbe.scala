package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftcompat.ColumnCompat
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native membership probe against a broadcast Bloom filter.
  *
  * The obvious formulation — a Scala UDF closing over the broadcast — is
  * a whole-stage-codegen boundary: every row crossing it pays the
  * ScalaUDF bridge (boxing, null-tracking, a megamorphic lambda call) on
  * exactly the operator whose purpose is to discard 98% of a huge scan
  * as cheaply as possible. This expression stays inside codegen: the
  * generated code resolves the broadcast ONCE per task into a local
  * field, then probes `mightContainLong` directly per row.
  *
  * The filter ships as a `Broadcast`, not an embedded literal: bloom bits
  * for 10^8 spans at 1% fpp are ~120 MB — torrent-broadcast once per
  * executor, never serialized per task into the plan.
  *
  * Bit-compatibility matters: the probe delegates to the SAME
  * `BloomFilter` implementation that built the filter
  * (`DataFrameStatFunctions.bloomFilter`), so the no-false-negative
  * guarantee is the library's own, not a reimplementation's.
  */
case class BloomProbe(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression with Predicate {

  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires a bigint hash input, got ${t.simpleString}")
  }

  override protected def nullSafeEval(h: Any): Any =
    bloom.value.mightContainLong(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[BloomFilter]].getName)
    // One broadcast dereference per task (constructor-time), not per row.
    val filter = ctx.addMutableState(classOf[BloomFilter].getName, "bloomFilter",
      v => s"$v = (${classOf[BloomFilter].getName}) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, h => s"${ev.value} = $filter.mightContainLong($h);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomProbe {
  /** Column-facing constructor: `probe(xxhash64(col), bc)`. */
  def apply(hash: Column, bloom: Broadcast[BloomFilter]): Column =
    ColumnCompat.column(BloomProbe(ColumnCompat.expression(hash), bloom))
}
