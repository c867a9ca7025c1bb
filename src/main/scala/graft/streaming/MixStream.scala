package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Windowed source-mix drift monitor — the live guard on the mixture
  * the corpus was DESIGNED to have (`mix_weights`' targets): per
  * event-time window, each target source's arriving share is compared
  * to its target weight and the total variation distance ½·Σ|share −
  * target| is the drift score (mass from sources OUTSIDE the target
  * map has target 0 — unknown-source mass IS drift). The crawl-mix
  * tripwire beside the token (OovStream), value (BenfordStream) and
  * embedding (DriftStream) monitors: a source outage or a scraper gone
  * rogue bends the mix long before any corpus audit runs.
  *
  * One stateful aggregation (the BenfordStream shape): the target keys
  * are FROZEN literals, so the per-window state is |targets|+1 longs of
  * conditional counters — no per-source state rows, no second stateful
  * stage — and the TV fold is row-local arithmetic after the aggregate.
  * Exact longs until the per-key share divisions. */
object MixStream {

  private def scored(grouped: DataFrame, keys: Seq[String],
                     targets: Map[String, Double]): DataFrame = {
    val n = col("n").cast("double")
    val knownTv = keys.zipWithIndex.map { case (k, i) =>
      abs(col(s"c$i").cast("double") / n - lit(targets(k)))
    }.reduce(_ + _)
    val otherMass =
      (col("n") - keys.indices.map(i => col(s"c$i")).reduce(_ + _))
        .cast("double") / n
    val worst = keys.zipWithIndex.map { case (k, i) =>
      struct((-abs(col(s"c$i").cast("double") / n - lit(targets(k))))
        .as("negdev"), lit(k).as("src"))
    }
    grouped.select(col("window_start"), col("n"),
      graft.ops.TimeSeries.portableRound6((knownTv + otherMass) / 2.0)
        .as("tv"),
      least(worst: _*).getField("src").as("worst_source"))
  }

  /** The one windowed aggregate both twins share. */
  private def mixAgg(df: DataFrame, srcCol: String, tsCol: String,
                     keys: Seq[String], windowDur: String): DataFrame =
    df.groupBy(window(col(tsCol), windowDur))
      .agg(count(lit(1)).as("n"),
        keys.zipWithIndex.map { case (k, i) =>
          sum(when(col(srcCol) === k, 1L).otherwise(0L)).as(s"c$i")
        }: _*)
      .select(col("window.start").as("window_start") +:
        col("n") +: keys.indices.map(i => col(s"c$i")): _*)

  def windowed(stream: DataFrame, srcCol: String, tsCol: String,
               targets: Map[String, Double], windowDur: String = "1 hour",
               delay: String = "10 minutes"): DataFrame = {
    val keys = targets.keys.toSeq.sorted
    scored(mixAgg(stream.withWatermark(tsCol, delay), srcCol, tsCol,
      keys, windowDur), keys, targets)
  }

  /** Batch twin on a static frame — the spec's equality reference. */
  def batch(df: DataFrame, srcCol: String, tsCol: String,
            targets: Map[String, Double],
            windowDur: String = "1 hour"): DataFrame = {
    val keys = targets.keys.toSeq.sorted
    scored(mixAgg(df, srcCol, tsCol, keys, windowDur), keys, targets)
  }
}
