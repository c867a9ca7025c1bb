package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming robust-MAD anomaly alarm: hourly per-key counts flag as
  * they CLOSE under the watermark when they sit more than `nMads` MADs
  * from the key's median — the ingest-time twin of
  * [[graft.ops.TimeSeries.robustAnomalies]], against a FROZEN baseline
  * (the production monitoring shape: stats train on settled history,
  * live traffic is judged against them, and the baseline refreshes on
  * its own cadence — so today's incident cannot drag today's threshold
  * toward itself, the same poisoning argument as the batch op, one
  * stronger: not even the median moves).
  *
  * Fully declarative — a windowed count in append mode (only
  * watermark-closed buckets emit) joined stream-static against the
  * broadcast baseline; no custom state, no foreachBatch. State is the
  * engine's windowed-agg store, bounded by keys × open windows. Keys
  * absent from the baseline never alarm (inner join — the warm-up
  * convention: no history, no verdict, same as ForecastAlarm's first
  * season).
  */
object MadAlarm {

  /** @param baseline (key, med2, mad4) as produced by
    *                 [[graft.ops.TimeSeries.madStats]] on history;
    *                 joined by `keyCol`, broadcast (|keys| rows). */
  def hourlyAlarms(stream: DataFrame, keyCol: String, tsCol: String,
                   baseline: DataFrame, nMads: Int = 3,
                   delay: String = "5 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), "1 hour").as("w"), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(baseline), keyCol)
      .withColumn("dev2", abs(col("cnt") * 2 - col("med2")))
      .where(col("dev2") * 2 > col("mad4") * nMads)
      .select(col(keyCol).as("key"), col("w.start").as("bucket"),
        col("cnt"), col("med2"), col("mad4"))
}
