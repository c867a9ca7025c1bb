package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftcompat.ColumnCompat
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native MinHash signature: the numPerm per-permutation minima over a
  * shingle array, in ONE compiled pass.
  *
  * Replaces the composable chain
  * `transform(shingles, s => conv(substring(md5(to_binary(s,"utf-8")),1,8),16,10))`
  * + numPerm × `array_min(transform(base, x => pmod(a·x+b, p)))`:
  * higher-order functions evaluate INTERPRETED (CodegenFallback, a
  * fresh lambda walk per element), so each doc paid 1 + numPerm
  * interpreted array traversals and one intermediate array per
  * permutation — the dominant per-row cost of the whole dedup family
  * and of the streaming near_dup twin (guide §4: eliminate non-codegen
  * expressions in the hot path).
  *
  * Value-identical to the composable form by construction:
  *  - base = first-8-hex-chars of md5(utf-8 bytes) parsed base-16 — the
  *    unsigned 32-bit int of the digest's first 4 bytes;
  *  - h_i = min over shingles of (A_i·base + B_i) mod P, all
  *    non-negative with A_i < 2³¹ and base < 2³², so the product stays
  *    below 2⁶³ — the same long arithmetic, no overflow on either path;
  *  - an empty shingle array yields null minima (array_min-of-empty
  *    semantics); callers pre-filter those rows out.
  * The grouped aggregate form ([[graft.ops.Dedup.minhashSignature]])
  * stays as the differential-testing twin.
  */
case class MinhashSignature(child: Expression, numPerm: Int)
    extends UnaryExpression {

  require(numPerm >= 1 && numPerm <= graft.ops.Dedup.MinhashA.length,
    s"numPerm in [1, ${graft.ops.Dedup.MinhashA.length}], got $numPerm")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<string>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinhashSignature.compute(input.asInstanceOf[ArrayData], numPerm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinhashSignature$$.MODULE$$.compute($c, $numPerm);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSignature {
  /** Column-facing constructor. */
  def apply(shingles: Column, numPerm: Int): Column =
    ColumnCompat.column(
      MinhashSignature(ColumnCompat.expression(shingles), numPerm))

  // MessageDigest is stateful; one instance per thread, reset per use
  // (a fresh getInstance per row measurably drags the tight loop).
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** One pass: md5 each shingle once, fold the numPerm minima. Called
    * from generated code. */
  def compute(shingles: ArrayData, numPerm: Int): ArrayData = {
    val n = shingles.numElements()
    if (n == 0)
      return new GenericArrayData(new Array[Any](numPerm)) // null minima
    val a = graft.ops.Dedup.MinhashA
    val b = graft.ops.Dedup.MinhashB
    val p = graft.ops.Dedup.MinhashP
    val mins = new Array[Long](numPerm)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = md5.get()
    var j = 0
    while (j < n) {
      md.reset()
      val d = md.digest(shingles.getUTF8String(j).getBytes)
      val base = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var i = 0
      while (i < numPerm) {
        val v = (a(i) * base + b(i)) % p
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }
}
