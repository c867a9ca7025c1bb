package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.TimeSeries

/** Streaming embedding-collapse monitor: per-window participation-ratio
  * isotropy of an embedding stream — the live guard for the pathology
  * batch `emb_isotropy` audits offline (an upstream encoder change or
  * a bad normalization deploy shows up as the variance mass collapsing
  * into few dimensions; PR falling is the alarm). Twin contract: a
  * frozen window reproduces the batch query over that window's rows
  * exactly (same fixed-point scale, same exact per-dim masses, same
  * dim-ordered fold).
  *
  * Shape: posexplode each vector, per-(window, dim) exact fixed-point
  * sums (stateful agg #1) → per-window dim-ordered collect + fold
  * (stateful agg #2, the CupedStream Spark 4 chained pattern; the list
  * is |dims|-bounded). State: open windows × dims longs, then one
  * bounded list per window. */
object IsotropyStream {

  private val dec = org.apache.spark.sql.types.DecimalType(38, 0)
  private val FixedPointScale = (1L << 20).toDouble

  def windowedIsotropy(stream: DataFrame, tsCol: String, vecCol: String,
                       windowLen: String = "1 hour",
                       delay: String = "5 minutes"): DataFrame = {
    val perDim = stream
      .withWatermark(tsCol, delay)
      .select(col(tsCol), posexplode(col(vecCol).cast("array<double>")))
      .select(col(tsCol), col("pos").as("dim"),
        round(col("col") * FixedPointScale).cast("long").as("v"))
      .groupBy(window(col(tsCol), windowLen).as("w"), col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("v").cast(dec)).as("s"),
        sum((col("v") * col("v")).cast(dec)).as("q"))
    val g = perDim
      .select(col("w"), col("dim"), col("n"),
        (col("n").cast(dec) * col("q") - col("s") * col("s")).as("a"))
      .groupBy(col("w"))
      .agg(max(col("n")).as("n_vecs"), count(lit(1)).as("d"),
        sum(col("a")).as("sa"), max(col("a")).as("amax"),
        sort_array(collect_list(struct(col("dim"), col("a")))).as("lst"))
    val sa2 = aggregate(col("lst"), lit(0.0), (acc, e) =>
      acc + e.getField("a").cast("double") * e.getField("a").cast("double"))
    val sad = col("sa").cast("double")
    val pr = sad * sad / sa2
    g.select(col("w.start").as("bucket"), col("n_vecs"), col("d"),
      TimeSeries.portableRound4(when(sa2 > 0, pr))
        .as("participation_ratio"),
      TimeSeries.portableRound4(when(sa2 > 0, pr / col("d").cast("double")))
        .as("eff_dim_frac"),
      TimeSeries.portableRound6(when(sa2 > 0,
        col("amax").cast("double") / sad)).as("top_dim_share"))
  }
}
