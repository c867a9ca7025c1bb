package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Stats

/** Streaming experiment monitor: windowed one-way ANOVA F across
  * variants, emitted as event-time windows close under the watermark —
  * the live companion to the batch `stat_anova` (is this hour's spend
  * difference between variants larger than its within-variant noise?).
  *
  * Two CHAINED stateful aggregations (the Spark 4 multi-stateful
  * pattern, same as the windowed-HLL rollup): per-(window, variant)
  * exact moments first, then the per-window k-bounded combine — which
  * is [[Stats.fFromGroupMoments]] itself, keyed by the window column,
  * so stream ≡ batch is the SAME kernel running over the same moments,
  * not a transcription. State is bounded by open windows × variants.
  */
object AnovaStream {

  def windowedF(stream: DataFrame, tsCol: String, groupCol: String,
                valueCol: String, windowLen: String = "1 hour",
                delay: String = "5 minutes"): DataFrame = {
    val perGroup = Stats.groupMoments(
      stream.withWatermark(tsCol, delay), groupCol, valueCol,
      extraKeys = Seq(window(col(tsCol), windowLen).as("w")))
    Stats.fFromGroupMoments(perGroup, Seq("w"))
      .select(col("w.start").as("bucket"), col("n"),
        col("k").as("n_groups"), col("f"))
  }
}
