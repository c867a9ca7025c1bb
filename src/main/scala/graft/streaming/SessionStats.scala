package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming session-level rollup — the ingest-time twin of the batch
  * `ev_session_stats` query, on Spark's native `session_window`: as a
  * user's session CLOSES under the watermark (no event within `gap` of
  * its end), one row emits with the session's event count, exact
  * integer duration, and conversion flag.
  *
  * Engine-native state: session_window merges events into dynamic
  * windows in the streaming agg store — no custom state code at all;
  * state per key is the open sessions inside the watermark horizon.
  * Boundary convention: session_window starts a NEW session when the
  * inter-event gap is ≥ `gap`, while the batch sessionize splits on
  * gap > 1800 s — the two agree everywhere except a gap of EXACTLY the
  * threshold (a measure-zero tie the spec data avoids; pick the batch
  * rule's threshold one microsecond lower to align them exactly). */
object SessionStats {

  /** `convertedExpr` is the per-event conversion predicate (defaults to
    * the events-table shape `event_type = 'purchase'`); streams without
    * an event_type column must pass their own — the default references
    * that column and fails analysis otherwise. */
  def sessions(events: DataFrame, userCol: String, tsCol: String,
               gap: String = "30 minutes",
               delay: String = "10 minutes",
               convertedExpr: Column = col("event_type") === "purchase"
              ): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(count(lit(1)).as("n_events"),
        (unix_micros(max(col(tsCol)).cast("timestamp")) -
          unix_micros(min(col(tsCol)).cast("timestamp"))).as("duration_us"),
        max(convertedExpr).as("converted"))
      .select(col(userCol), col("session_window.start").as("session_start"),
        col("n_events"), col("duration_us"), col("converted"))
}
