package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming windowed top-k ("trending items"): per event-time window,
  * the k heaviest keys by count, emitted as one row per window when it
  * closes under the watermark — the live form of the batch grouped
  * top-k (`topk_*` family) for dashboards and hot-key alarms.
  *
  * Two CHAINED stateful aggregations, both fully declarative: counts
  * per (window, key), then a per-window rank over the collected
  * key-count array (second-agg state is each open window's key-count
  * set — the same keys × open-windows bound the first agg already
  * carries). Ordering is deterministic: count DESC, key ASC (one
  * ascending sort of (−cnt, key) structs), so the emitted array is a
  * pure function of the window's multiset — replay/batch-split
  * invariant and equal to the batch ranking of the same rows
  * (TrendStreamSpec).
  *
  * For unbounded key domains the exact per-window count state is the
  * honest cost of exact top-k; the sketched trade lives batch-side as
  * agg_cms_hh (CMS heavy hitters).
  */
object TrendStream {

  def windowedTopK(stream: DataFrame, tsCol: String, keyCol: String,
                   k: Int, windowLen: String = "1 hour",
                   delay: String = "5 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowLen).as("w"), col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("w"))
      .agg(
        slice(sort_array(collect_list(
          struct((-col("cnt")).as("nc"), col("key")))), 1, k).as("neg"),
        count(lit(1)).as("n_keys"))
      .select(col("w.start").as("bucket"), col("n_keys"),
        transform(col("neg"), e =>
          struct((-e.getField("nc")).as("cnt"),
            e.getField("key").as("key"))).as("top"))
}
