package graft

import org.apache.spark.sql.functions._

/** KMV overlap estimation: accuracy against a known planted overlap and
  * layout-independence (the signature is a function of the SET). */
class KmvOverlapSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Sketches

  test("planted overlap: estimates land near truth, deterministic") {
    // |A| = 1000, |B| = 1000, |A∩B| = 500, union = 1500, J = 1/3
    val a = (0L until 1000L).toDF("id")
    val b = (500L until 1500L).toDF("id")
    val sa = Sketches.kmvSig(a, col("id"), 128)
    val sb = Sketches.kmvSig(b, col("id"), 128)
    val r = Sketches.kmvOverlap(sa, sb, 128).collect()(0)
    val (j, u, i) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    // k = 128 → σ ≈ 9%; assert generous 3σ-ish bands
    assert(math.abs(j - 1.0 / 3) < 0.15, s"jaccard $j")
    assert(math.abs(u - 1500) / 1500.0 < 0.35, s"union $u")
    assert(math.abs(i - 500) / 500.0 < 0.6, s"intersection $i")
    // layout independence
    val r2 = Sketches.kmvOverlap(
      Sketches.kmvSig(a.repartition(7), col("id"), 128), sb, 128).collect()(0)
    assert(r2.getDouble(0) === j && r2.getDouble(1) === u && r2.getDouble(2) === i)
  }

  test("disjoint sets estimate zero overlap; identical sets estimate J=1") {
    val a = (0L until 800L).toDF("id")
    val c = (10000L until 10800L).toDF("id")
    val sa = Sketches.kmvSig(a, col("id"), 128)
    val sc = Sketches.kmvSig(c, col("id"), 128)
    assert(Sketches.kmvOverlap(sa, sc, 128).collect()(0).getDouble(0) === 0.0)
    assert(Sketches.kmvOverlap(sa, sa, 128).collect()(0).getDouble(0) === 1.0)
  }
}
