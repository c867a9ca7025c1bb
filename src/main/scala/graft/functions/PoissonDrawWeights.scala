package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftcompat.ColumnCompat
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All `b` Poisson(1) bootstrap weights of one row in ONE native call —
  * bit-identical to the composable md5 chain it replaces (and to the
  * DuckDB oracle's replay): replicate i reads hex slot i%4 of
  * md5(rowKey + "|" + i/4), u = slot/2³², and the weight is the first
  * k with u < PoissonCum(k) (else 7, the tail clamp — P(w > 6) ≈ 8·10⁻⁵). The composable
  * form evaluated one md5 STRING expression per 4-draw block plus a
  * conv/substr chain per draw through an explode fan-out; here the
  * digest bytes are hex-parsed directly and the weight array comes back
  * in one pass (a thread-local MessageDigest — the expression is
  * evaluated inside codegen across partitions). */
case class PoissonDrawWeights(child: Expression, b: Int)
    extends UnaryExpression {

  require(b >= 1 && b <= 4096, s"b in [1,4096], got $b")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"poisson_draw_weights requires a string row key, got ${t.simpleString}")
  }

  override protected def nullSafeEval(rk: Any): Any =
    PoissonDrawWeights.compute(rk.asInstanceOf[UTF8String], b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, rk =>
      s"${ev.value} = graft.functions.PoissonDrawWeights$$.MODULE$$.compute($rk, $b);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PoissonDrawWeights {
  /** Column-facing constructor. */
  def apply(rowKey: Column, b: Int): Column =
    ColumnCompat.column(PoissonDrawWeights(ColumnCompat.expression(rowKey), b))

  private val md5Local = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Poisson(1) CDF thresholds k = 0..6 — THE SAME array the oracle SQL
    * interpolates ([[graft.ops.Stats.PoissonCum]]); first index with
    * u < cum(k) is the weight, else 7 (cum.length), matching the
    * composable CASE's tail clamp. */
  private val cum: Array[Double] = graft.ops.Stats.PoissonCum

  /** Called from generated code. */
  def compute(rk: UTF8String, b: Int): ArrayData = {
    val md = md5Local.get()
    val out = new Array[Int](b)
    val blocks = (b + 3) / 4
    val base = rk.toString
    var blk = 0
    while (blk < blocks) {
      md.reset()
      val digest = md.digest((base + "|" + blk).getBytes(UTF_8))
      var s = 0
      while (s < 4 && blk * 4 + s < b) {
        // hex slot s = digest bytes [4s, 4s+4) — the same 8 hex chars
        // substr(s*8+1, 8) reads off md5()'s lowercase hex string
        var v = 0L
        var j = 0
        while (j < 4) { v = (v << 8) | (digest(s * 4 + j) & 0xffL); j += 1 }
        val u = v.toDouble / 4294967296.0
        var k = 0
        while (k < cum.length && !(u < cum(k))) k += 1
        out(blk * 4 + s) = k // k == cum.length == 7 past the table
        s += 1
      }
      blk += 1
    }
    new GenericArrayData(out)
  }
}
