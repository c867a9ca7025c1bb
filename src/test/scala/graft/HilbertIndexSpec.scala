package graft

import org.apache.spark.sql.functions._

import graft.functions.HilbertIndex

/** The Hilbert index's defining properties, proven over the WHOLE
  * 256×256 grid: bijectivity onto [0, 65536), unit Manhattan steps
  * between consecutive indices (the locality guarantee Z-order lacks),
  * and the codegen path agreeing with the static loop. */
class HilbertIndexSpec extends SparkSpec {
  import spark.implicits._

  private val bits = 8
  private val n = 1 << bits

  test("xy2d is a bijection onto [0, n^2)") {
    val ds = (for (x <- 0 until n; y <- 0 until n)
      yield HilbertIndex.compute(x.toLong, y.toLong, bits)).toVector
    assert(ds.distinct.size === n * n)
    assert(ds.min === 0L && ds.max === (n.toLong * n - 1))
  }

  test("consecutive indices are always grid-adjacent (Z-order is not)") {
    val byD = new Array[(Int, Int)](n * n)
    for (x <- 0 until n; y <- 0 until n)
      byD(HilbertIndex.compute(x.toLong, y.toLong, bits).toInt) = (x, y)
    val hilbertJumps = (1 until n * n).map { d =>
      val (x0, y0) = byD(d - 1); val (x1, y1) = byD(d)
      math.abs(x1 - x0) + math.abs(y1 - y0)
    }
    assert(hilbertJumps.forall(_ == 1), "every Hilbert step is one cell")

    // Z-order on the same grid: steps jump at quadrant seams — the mean
    // step length is strictly worse than Hilbert's 1 (the file-extent
    // argument for Hilbert clustering)
    def z(x: Long, y: Long): Long =
      (0 until bits).foldLeft(0L)((a, i) =>
        a | ((x >> i & 1) << (2 * i)) | ((y >> i & 1) << (2 * i + 1)))
    val byZ = new Array[(Int, Int)](n * n)
    for (x <- 0 until n; y <- 0 until n) byZ(z(x, y).toInt) = (x, y)
    val zJumps = (1 until n * n).map { d =>
      val (x0, y0) = byZ(d - 1); val (x1, y1) = byZ(d)
      math.abs(x1 - x0) + math.abs(y1 - y0)
    }
    assert(zJumps.exists(_ > 1), "Z-order jumps at seams")
    assert(zJumps.sum > hilbertJumps.sum)
  }

  test("the codegen expression matches the static loop; range-checks raise") {
    val df = Seq((0L, 0L), (255L, 0L), (0L, 255L), (255L, 255L),
      (17L, 200L), (128L, 127L))
      .toDF("x", "y")
      .select(col("x"), col("y"), HilbertIndex(col("x"), col("y"), bits).as("d"))
    df.collect().foreach { r =>
      assert(r.getLong(2) === HilbertIndex.compute(r.getLong(0), r.getLong(1), bits))
    }
    val e = intercept[Exception] {
      Seq((256L, 0L)).toDF("x", "y")
        .select(HilbertIndex(col("x"), col("y"), bits)).collect()
    }
    assert(e.getMessage != null)
  }
}
