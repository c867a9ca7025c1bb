package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftcompat.ColumnCompat
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Squared L2 distances from one vector to a FIXED centroid matrix:
  * out(i) = Σ_j (v(j) − c(i)(j))², the inner kernel of every quantizer
  * pass (IVF cell assignment, PQ encoding, ADC lookup tables, SemDeDup
  * cells).
  *
  * Why a native expression: spelling the same math as per-centroid
  * literal expression chains unrolls nLists×dim (or m×k×sub) arithmetic
  * terms into one generated method — past ~1k terms Janino blows its
  * 64KB method limit, whole-stage codegen falls back, and every compile
  * attempt burns seconds per stage (measured 10 s for the IVF-PQ query
  * at sf0.1). Here the matrix rides along as a referenced `double[][]`
  * and the generated code is a two-line nested LOOP — constant code size
  * for any nLists/dim, stays inside whole-stage codegen, and the JIT
  * vectorizes it.
  *
  * Bit-compatibility contract (what the DuckDB oracles re-compute): the
  * accumulation is index-ordered from 0.0, and IEEE `0.0 + t0 == t0`, so
  * results are bit-identical to the left-associative literal chains
  * `((t0+t1)+t2)+…` the oracles spell out. Float inputs are widened per
  * element (`(double) v[j]`), matching `CAST(embedding[j+1] AS DOUBLE)`.
  * Null input → null; a null element or a vector shorter than the
  * centroid dim → null (the chains' element_at-out-of-bounds behavior),
  * never a partial distance.
  */
case class SquaredDistances(child: Expression,
                            centroids: Array[Array[Double]])
    extends UnaryExpression {

  require(centroids.nonEmpty && centroids.forall(_.length == centroids(0).length),
    "centroid matrix must be non-empty and rectangular")

  private val dim = centroids(0).length

  // Arrays compare by reference, which would make two SquaredDistances
  // over the same matrix never semanticEquals — defeating subexpression
  // elimination, exchange reuse, and plan canonicalization. Compare (and
  // hash) the matrix by VALUE.
  override def equals(other: Any): Boolean = other match {
    case SquaredDistances(c, m) =>
      child == c && java.util.Arrays.deepEquals(
        centroids.asInstanceOf[Array[AnyRef]], m.asInstanceOf[Array[AnyRef]])
    case _ => false
  }

  override def hashCode(): Int =
    31 * child.hashCode() +
      java.util.Arrays.deepHashCode(centroids.asInstanceOf[Array[AnyRef]])

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"squared_distances requires array<float|double> input, got ${t.simpleString}")
  }

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() < dim) return null
    val out = new Array[Double](centroids.length)
    var ki = 0
    while (ki < centroids.length) {
      val c = centroids(ki)
      var acc = 0.0; var j = 0
      while (j < dim) {
        if (v.isNullAt(j)) return null
        val x = (if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)) - c(j)
        acc += x * x; j += 1
      }
      out(ki) = acc; ki += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.addReferenceObj("centroids", centroids, "double[][]")
      val out = ctx.freshName("out"); val ki = ctx.freshName("ki")
      val j = ctx.freshName("j"); val acc = ctx.freshName("acc")
      val x = ctx.freshName("x"); val bad = ctx.freshName("bad")
      val get = if (isFloat) s"(double) $v.getFloat($j)" else s"$v.getDouble($j)"
      s"""
         |boolean $bad = $v.numElements() < $dim;
         |double[] $out = new double[${centroids.length}];
         |for (int $ki = 0; !$bad && $ki < ${centroids.length}; $ki++) {
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $dim; $j++) {
         |    if ($v.isNullAt($j)) { $bad = true; break; }
         |    double $x = ($get) - $m[$ki][$j];
         |    $acc += $x * $x;
         |  }
         |  $out[$ki] = $acc;
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SquaredDistances {
  /** Column-facing constructor. */
  def apply(v: Column, centroids: Array[Array[Double]]): Column =
    ColumnCompat.column(SquaredDistances(ColumnCompat.expression(v), centroids))
}
