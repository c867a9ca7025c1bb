package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Sketches

/** Windowed quantiles on a stream from the MERGEABLE binned histogram —
  * the per-window latency/size percentile feed (p50/p95/p99 per key per
  * window) every pipeline daemon publishes.
  *
  * Exactly the [[graft.ops.Sketches.binnedQuantiles]] semantics, carried
  * to streams by the property that makes the histogram a sketch: partial
  * (bin, count) states from any split of the data merge by addition. Two
  * chained stateful aggregations on the window column (the Spark 4
  * multiple-stateful-operator pattern proven by the HLL stream): first
  * the (window, key, bin) counts, then the per-(window, key) histogram
  * packed into ONE sorted array whose quantile inversion is the shared
  * expression-only fold — state per group is |bins|, never the value
  * list, at every stage. Results for a closed window are bit-identical
  * to the batch operator over the same rows (spec-proven): a quantile
  * sketch with run-independent output, unlike t-digest/KLL whose merge
  * order changes the answer.
  */
object QuantileStream {

  def windowed(stream: DataFrame, keyCol: String, tsCol: String,
               valueCol: String, binWidth: Long, qs: Seq[Double],
               windowDur: String = "1 hour",
               delay: String = "5 minutes"): DataFrame = {
    // same duplicate-label guard as Sketches.binnedQuantiles: qs like
    // Seq(0.995, 1.0) would otherwise silently emit two q100 columns
    val labels = qs.map(q => s"q${(q * 100).round}")
    require(labels.distinct == labels,
      s"quantile labels collide: $labels — choose qs that round to distinct percents")
    val hist = stream
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowDur), col(keyCol),
        floor(col(valueCol) / binWidth).cast("long").as("bin"))
      .agg(count(lit(1)).as("c"))
    val packed = hist
      .groupBy(col("window"), col(keyCol))
      .agg(sort_array(collect_list(struct(col("bin"), col("c"))))
        .as("hist"))
      .withColumn("n",
        aggregate(col("hist"), lit(0L), (a, h) => a + h.getField("c")))
    packed.select(Seq(col("window.start").as("bucket"), col(keyCol),
      col("n")) ++
      qs.map(q => Sketches.histQuantile(col("hist"), col("n"), binWidth, q)
        .as(s"q${(q * 100).round}")): _*)
  }
}
