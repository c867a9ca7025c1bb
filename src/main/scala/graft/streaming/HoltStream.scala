package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming Holt double exponential smoothing — the ingest-time twin
  * of [[graft.ops.TimeSeries.holt]], the middle rung of the delegation
  * chain EWMA (β=0) ⊂ Holt (γ=0) ⊂ [[HoltWintersStream]], which now
  * carries the ONE general fold and all replay/gap/idle semantics. */
object HoltStream {

  /** Delegates to [[HoltWintersStream]] at γ = 0 — the seasonal history
    * stays identically 0.0, so every level/trend value (and the
    * watermark/gap/replay/idle mechanics) is bit-for-bit the Holt fold
    * this object used to carry inline; x − 0.0 ≡ x and
    * (l + t) + 0.0 ≡ l + t for the non-NaN values a count series
    * produces. One fold, three operators (EWMA ⊂ Holt ⊂ HW). */
  def hourlyCounts(events: DataFrame, keyCol: String, tsCol: String,
                   alpha: Double, beta: Double, idleMs: Long): DataFrame =
    HoltWintersStream.hourlyCounts(events, keyCol, tsCol,
        alpha, beta, gamma = 0.0, m = 1, idleMs = idleMs)
      .select(col("key"), col("bucket"), col("n"),
        col("level"), col("trend"), col("forecast_next"))
}
