package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** The per-partition Gram fold's two paths: the long fast path against
  * a BigInt-computed sequential reference, and the OVERFLOW-ESCALATION
  * path — scale = 2³¹ makes single products ≈ 2⁶², so two rows overflow
  * a long partial and the BigInteger side-sum must carry the cell
  * exactly (a silent wrap would corrupt the Gram at corpus scale). */
class GramFoldSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 4

  private def reference(vecs: Seq[Seq[Float]], scale: Long): Map[(Int, Int), BigInt] = {
    val qs = vecs.map(_.map(x =>
      BigInt(java.math.BigDecimal.valueOf(x.toDouble * scale)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact())))
    (for (i <- 0 until dim; j <- i until dim) yield {
      (i, j) -> qs.map(q => q(i) * q(j)).sum
    }).toMap
  }

  private def run(vecs: Seq[Seq[Float]], scale: Long, parts: Int)
      : Map[(Int, Int), BigInt] =
    Similarity.gramFixedPoint(
        vecs.toDF("embedding").repartition(parts), "embedding", dim, scale)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        BigInt(r.getDecimal(2).toBigInteger))
      .toMap

  test("fast path matches the sequential BigInt reference") {
    val rnd = new scala.util.Random(11)
    val vecs = Seq.fill(60)(Seq.fill(dim)(rnd.nextFloat() * 2 - 1))
    assert(run(vecs, 1L << 20, parts = 3) === reference(vecs, 1L << 20))
  }

  test("overflow escalation: 2^62-sized products sum exactly, never wrap") {
    // x ≈ ±1 at scale 2³¹ → each product ≈ ±2⁶²; four same-sign rows per
    // partition force the long partial past 2⁶³ and into the BigInteger
    // side-sum
    val vecs = Seq.fill(8)(Seq.fill(dim)(1.0f)) ++
      Seq.fill(4)(Seq.fill(dim)(-1.0f))
    val scale = 1L << 31
    val got = run(vecs, scale, parts = 1)
    val ref = reference(vecs, scale)
    assert(got === ref)
    // sanity: the reference really exceeds Long range, so a wrapped
    // long could not have produced it
    assert(ref((0, 0)) > BigInt(Long.MaxValue))
  }
}
