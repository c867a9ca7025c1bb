package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Stats

/** Windowed Benjamini–Hochberg alarm — the streaming twin of the batch
  * `stat_fdr` query: an experimentation platform monitors MANY metrics
  * concurrently, and per-metric alpha alarms fire spuriously in bulk
  * (five metrics at α=0.05 ≈ a 23% family-wise false-alarm rate per
  * window — paging someone hourly on noise). Each closing event-time
  * window runs the full multiple-testing correction ACROSS its metrics:
  * Welch t² per metric from exact cents moments, rank by t² descending,
  * step-up against the Φ⁻¹(1 − α·r/(2m))² bar matrix, reject ranks
  * ≤ r* — the expected false-discovery share among the window's
  * rejections stays ≤ α, window after window.
  *
  * Shape (the [[DriftStream.packedWindows]] two-level discipline): one
  * windowed (window, metric) moments aggregate over the stream — the
  * only corpus-sized shuffle, map-side partials absorb the volume —
  * then a per-window collect of the ≤`mMax` metric rows into an array,
  * where ranking, the bar lookup, and r* are ROW-LOCAL array ops (the
  * batch query's |metrics|-sized window functions re-expressed without
  * a second ranking shuffle). The bar matrix is the SAME Scala-computed
  * 6dp-quantized literal the batch plan embeds ([[Stats.bhT2Matrix]] —
  * Acklam Φ⁻¹, never an engine libm), so a frozen-window replay of the
  * stream reproduces the batch rejections bit for bit (spec).
  *
  * State: per open window, one moments row per live metric — bounded by
  * |metrics| × open windows, independent of event volume. More than
  * `mMax` metrics in one window raises (the batch query's guard): BH
  * bars depend on m, so a silent truncation would mis-correct. */
object FdrStream {

  /** @param stream     event rows: `tsCol` event time, `metricCol` the
    *                    monitored metric's name, `variantCol` 0/1 arm,
    *                    `valueCol` the money-like measurement.
    * @return per closed window and metric: bucket (window start), the
    *         arm sizes, 6dp t², the descending-t² rank, and the BH
    *         verdict at FDR level `alpha`. */
  def windowedRejections(stream: DataFrame, tsCol: String, metricCol: String,
                         variantCol: String, valueCol: String,
                         alpha: Double = 0.05, mMax: Int = 12,
                         windowDur: String = "1 hour",
                         delay: String = "5 minutes"): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val thrMat = array(Stats.bhT2Matrix(alpha, mMax)
      .map(row => array(row.map(x =>
        lit(math.round(x * 1e6) / 1e6)): _*)): _*)
    val cents = (col(valueCol).cast("decimal(18,2)") * 100)
      .cast("decimal(38,0)")

    val perMetric = stream
      .withWatermark(tsCol, delay)
      .select(col(tsCol), col(metricCol).as("metric"),
        col(variantCol).cast("long").as("variant"), cents.as("x"))
      .groupBy(window(col(tsCol), windowDur).as("w"), col("metric"))
      .agg(
        sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("variant") === 0, col("x"))).as("sx0"),
        sum(when(col("variant") === 0, col("x") * col("x"))).as("sxx0"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("variant") === 1, col("x"))).as("sx1"),
        sum(when(col("variant") === 1, col("x") * col("x"))).as("sxx1"))

    // the batch stat_fdr Welch kernel, verbatim — same casts, same order
    def mean(sx: Column, n: Column) = sx.cast("double") / n.cast("double")
    def svar(n: Column, sx: Column, sxx: Column) =
      (d38(n) * sxx - sx * sx).cast("double") /
        (d38(n) * (d38(n) - 1)).cast("double")
    val diff = mean(col("sx0"), col("n0")) - mean(col("sx1"), col("n1"))
    val se2 = svar(col("n0"), col("sx0"), col("sxx0")) / col("n0").cast("double") +
      svar(col("n1"), col("sx1"), col("sxx1")) / col("n1").cast("double")

    // se2 = 0 (a dead/constant metric) → null t2, NOT an ANSI
    // DIVIDE_BY_ZERO: an unguarded division would fail the streaming
    // query PERMANENTLY on the first zero-variance window — the exact
    // failure mode a monitoring stream must not have (batch stat_fdr
    // carries the same guard)
    val scored = perMetric.select(col("w"), col("metric"),
      col("n0"), col("n1"), when(se2 > 0, diff * diff / se2).as("t2"))

    // per-window pack: sort by (−t2, metric) = the batch wRank order.
    // Null alignment: a zero-variance metric's null t2 ranks LAST in
    // the batch (Spark DESC default NULLS LAST; the oracle says NULLS
    // LAST explicitly) — map null to +∞ here so the ascending −t2 sort
    // agrees instead of leaning on struct-field null ordering. A null
    // never clears a bar; it is rejected only when a lower rank's pass
    // pulls the step-up prefix over it, identically in both forms.
    val negKey = when(col("t2").isNull, lit(Double.PositiveInfinity))
      .otherwise(-col("t2"))
    val packed = scored
      .groupBy(col("w"))
      .agg(sort_array(collect_list(struct(negKey.as("negt2"),
        col("metric"), col("n0"), col("n1"), col("t2")))).as("arr"))
      .withColumn("m", size(col("arr")))
      .withColumn("bars", element_at(
        when(col("m") <= mMax, thrMat).otherwise(raise_error(lit(
          s"fdr stream: more than $mMax metrics in a window — widen the matrix"))),
        col("m")))
      // r* = max 1-based rank whose t² clears its own bar (0 if none)
      .withColumn("rstar", array_max(zip_with(col("arr"),
        sequence(lit(1), greatest(col("m"), lit(1))),
        (s, r) => when(s.getField("t2") >=
          element_at(col("bars"), r.cast("int")), r.cast("long"))
          .otherwise(0L))))

    packed
      .select(col("w"), col("rstar"), posexplode(col("arr")).as(Seq("pos", "s")))
      .select(col("w.start").as("bucket"),
        col("s.metric").as("metric"), col("s.n0").as("n0"),
        col("s.n1").as("n1"),
        (round(col("s.t2") * 1000000) / 1000000).as("t2"),
        (col("pos") + 1L).as("rank"),
        (col("pos") + 1L <= col("rstar")).as("rejected"))
  }
}
