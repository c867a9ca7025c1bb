package graft

import org.apache.spark.sql.functions._

/** Fixed-point Gram + power iteration: recovers the planted dominant
  * direction, and the Gram table is exactly symmetric-complete. */
class PcaSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Similarity

  private val dim = 8

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  test("power iteration recovers the planted dominant direction") {
    val u = Array(0.5, 0.3, -0.2, 0.4, 0.1, -0.3, 0.2, 0.1)
    val w = Array(0.1, -0.1, 0.3, 0.0, -0.2, 0.1, 0.0, 0.2)
    // dominant direction u (coefficients up to 3x), minor direction w
    val vecs = (0 until 200).map { r =>
      val cu = 1.0 + (r % 7) * 0.4
      val cw = 0.2 * ((r % 3) - 1)
      (r.toLong, u.indices.map(i => (cu * u(i) + cw * w(i)).toFloat).toArray)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val gram = Similarity.gramFixedPoint(df, "embedding", dim)
    val pc = Similarity.topPcFixedPoint(gram, dim, iters = 3)
      .orderBy("i").collect().map(_.getLong(1).toDouble)
    assert(math.abs(cosine(pc, u)) > 0.99, s"got ${pc.mkString(",")}")
  }

  test("deflated second PC recovers the planted minor direction, ⟂ to v1") {
    // two orthogonal planted directions; u dominant (coefficients up to
    // 3.4x), w clearly second (up to ~1x) — deflation must strip u and
    // converge the residual iteration onto w.
    val u = Array(0.5, 0.3, -0.2, 0.4, 0.1, -0.3, 0.2, 0.1)
    val w = Array(0.3, -0.5, 0.2, 0.0, -0.2, 0.1, 0.4, 0.2)
    val uw = u.zip(w).map { case (a, b) => a * b }.sum
    val wOrth = w.indices.map(i => w(i) - uw / u.map(x => x * x).sum * u(i)).toArray
    val vecs = (0 until 200).map { r =>
      val cu = 1.0 + (r % 7) * 0.4
      val cw = 1.0 * ((r % 3) - 1)
      (r.toLong, u.indices.map(i => (cu * u(i) + cw * wOrth(i)).toFloat).toArray)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val gram = Similarity.gramFixedPoint(df, "embedding", dim)
    val v1 = Similarity.topPcFixedPoint(gram, dim, iters = 3)
      .orderBy("i").collect().map(_.getLong(1).toDouble)
    val v2 = Similarity.secondPcFixedPoint(gram, dim, iters = 3)
      .orderBy("i").collect().map(_.getLong(1).toDouble)
    assert(math.abs(cosine(v2, wOrth)) > 0.98, s"got ${v2.mkString(",")}")
    // near-orthogonal to the recovered top PC (trunc-division projection
    // leaves sub-ulp residue, not exact zero)
    assert(math.abs(cosine(v2, v1)) < 0.02, s"v1·v2 ${cosine(v2, v1)}")
  }

  test("avgPairwiseCosine: identical = 1, two orthogonal camps = 0.4") {
    def basis(i: Int): Array[Float] =
      Array.tabulate(dim)(j => if (j == i) 1.0f else 0.0f)
    val same = (1L to 5L).map((_, basis(0))).toDF("vec_id", "embedding")
    val r1 = graft.ops.Similarity
      .avgPairwiseCosine(same, "embedding", dim).collect()(0)
    assert(r1.getLong(0) === 5L && r1.getDouble(1) === 1.0)
    // 3 copies of e0 + 3 of e1: 12 ordered pairs at cos 1, 18 at 0
    val camps = ((1L to 3L).map((_, basis(0))) ++
      (4L to 6L).map((_, basis(1)))).toDF("vec_id", "embedding")
    val r2 = graft.ops.Similarity
      .avgPairwiseCosine(camps, "embedding", dim).collect()(0)
    assert(r2.getLong(0) === 6L && r2.getDouble(1) === 0.4)
  }

  test("gram is the exact upper triangle: diag positive, all pairs present") {
    val df = (0 until 50).map(r =>
      (r.toLong, Array.tabulate(dim)(i => ((r + i) % 5 - 2).toFloat))).toDF("vec_id", "embedding")
    val g = Similarity.gramFixedPoint(df, "embedding", dim).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDecimal(2).longValueExact)).toMap
    assert(g.size === dim * (dim + 1) / 2)
    assert(g.keys.forall { case (i, j) => i <= j })
    (0 until dim).foreach(i => assert(g((i, i)) >= 0L))
    // spot-check one entry against a direct computation
    val want = (0 until 50).map { r =>
      val x = Array.tabulate(dim)(i => math.round(((r + i) % 5 - 2).toDouble * (1L << 20)))
      x(1) * x(3)
    }.sum
    assert(g((1, 3)) === want)
  }
}
