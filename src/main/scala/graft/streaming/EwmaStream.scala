package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming EWMA — the ingest-time twin of the batch
  * [[graft.ops.TimeSeries.ewma]]: per-key hourly event counts smoothed
  * recursively (ewmaₜ = α·xₜ + (1−α)·ewmaₜ₋₁) as event-time buckets
  * CLOSE under the watermark — the live health signal (queue-rate
  * smoothing, crawl-volume alarms) the daemon's rater series feeds.
  *
  * Since round 9's trend-aware generalization this is the β = 0
  * degenerate of [[HoltStream]] — bit-exactly: with trend pinned at
  * 0.0 the level recursion α·x + (1−α)·(level + 0.0) IS the EWMA (a
  * + 0.0 is the identity for every non-negative level), so one fold
  * carries both operators and the replay/gap/idle semantics cannot
  * drift apart.
  *
  * Stream ≡ batch law (EwmaStreamSpec): for ANY in-watermark arrival
  * order, once every key has expired the emitted rows equal
  * `TimeSeries.ewma` over the same events. State per key — see
  * [[HoltStream]]. */
object EwmaStream {

  def hourlyCounts(events: DataFrame, keyCol: String, tsCol: String,
                   alpha: Double, idleMs: Long): DataFrame =
    HoltStream.hourlyCounts(events, keyCol, tsCol, alpha, beta = 0.0,
        idleMs = idleMs)
      .select(col("key"), col("bucket"), col("n"),
        col("level").as("ewma"))
}
