package graft

import org.apache.spark.sql.functions._
import graft.ops.Sketches

/** Laws for the bounded-state quantile family: inversion correctness
  * against a sequential reference, table-vs-expression agreement, and
  * the label-collision guard. */
class BinnedQuantileSpec extends SparkSpec {
  import spark.implicits._

  // values engineered so p50 and p95 land in different bins and a bin
  // boundary sits exactly on a rank (the exact-integer compare's edge)
  private val values: Seq[Long] =
    (1L to 80L) ++ Seq.fill(15)(500L) ++ Seq.fill(5)(900L)

  private def refQuantile(xs: Seq[Long], binW: Long, q: Double): Long = {
    val hist = xs.groupBy(_ / binW).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    val n = xs.size.toLong
    val rank = BigInt(n) * (q * 1e6).round
    var cum = 0L
    hist.collectFirst {
      case (bin, c) if { cum += c; BigInt(cum) * 1000000 >= rank } =>
        bin * binW
    }.get
  }

  test("binnedQuantiles matches the sequential inversion; histQuantile agrees") {
    val df = values.map(("k", _)).toDF("k", "v")
    val got = Sketches.binnedQuantiles(df, Seq("k"), col("v"), 50L,
        Seq(0.5, 0.95)).select("n", "q50", "q95")
      .as[(Long, Long, Long)].head()
    assert(got === ((100L,
      refQuantile(values, 50L, 0.5), refQuantile(values, 50L, 0.95))))

    val viaExpr = df.groupBy("k")
      .agg(sort_array(collect_list(struct((col("v") / 50).cast("long")
        .as("bin"), lit(1L).as("c")))).as("hist"))
      .withColumn("hist", expr(
        "aggregate(hist, cast(array() as array<struct<bin:bigint,c:bigint>>)," +
          " (acc, h) -> case when size(acc) > 0 and element_at(acc, -1).bin = h.bin" +
          " then concat(slice(acc, 1, size(acc)-1)," +
          "   array(named_struct('bin', h.bin, 'c', element_at(acc, -1).c + h.c)))" +
          " else concat(acc, array(h)) end)"))
      .withColumn("n", aggregate(col("hist"), lit(0L), (a, h) => a + h.getField("c")))
      .select(Sketches.histQuantile(col("hist"), col("n"), 50L, 0.5).as("q50"),
        Sketches.histQuantile(col("hist"), col("n"), 50L, 0.95).as("q95"))
      .as[(Long, Long)].head()
    assert(viaExpr === ((got._2, got._3)))
  }

  test("colliding 2-digit quantile labels are rejected up front") {
    val df = values.map(("k", _)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Sketches.binnedQuantiles(df, Seq("k"), col("v"), 50L, Seq(0.995, 1.0))
    }
  }
}
