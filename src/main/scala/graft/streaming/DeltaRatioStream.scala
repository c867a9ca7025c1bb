package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Stats

/** Streaming ratio-metric monitor: per-window delta-method point
  * estimate and SE of R = Σx/Σy over USERS — the experimentation
  * family's ratio leg (TostStream certifies a mean stayed put,
  * FdrStream alarms on movement; this reads the per-variant
  * revenue-per-event ratio with its correctly user-clustered SE, the
  * number a naive row-level SE gets anti-conservatively wrong).
  *
  * Shape: per-(window, user) x/y sums (stateful agg #1) → per-(window,
  * variant) moments with DECIMAL(38,0) squares (stateful agg #2, the
  * CupedStream Spark 4 chained pattern) → the SAME
  * [[graft.ops.Stats.deltaRatio]] expression tree as the batch
  * `stat_delta_ratio` query, so a frozen window reproduces the batch
  * row exactly. State is bounded by open windows × active users
  * (agg #1) + windows × 2 (agg #2); nothing emits before the
  * watermark closes the window.
  */
object DeltaRatioStream {

  /** @param xCents per-row metric contribution in cents (null/0 rows
    *               contribute nothing to x but still count in y) —
    *               e.g. `when(col("event_type") === "purchase",
    *               Stats.cents(col("value")))` for the batch query's
    *               revenue-per-event contract. */
  def windowedSe(stream: DataFrame, tsCol: String, userCol: String,
                 xCents: Column, windowLen: String = "1 hour",
                 delay: String = "5 minutes"): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val perUser = stream
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowLen).as("w"),
        col(userCol).as("u"))
      .agg(count(lit(1)).as("yu"),
        coalesce(sum(xCents), lit(0L)).as("xu"))
    val m = perUser
      .withColumn("variant", pmod(col("u"), lit(2)))
      .groupBy(col("w"), col("variant"))
      .agg(count(lit(1)).as("n"),
        sum(col("xu")).as("sx"), sum(col("yu")).as("sy"),
        sum(d38(col("xu")) * d38(col("xu"))).as("sxx"),
        sum(d38(col("yu")) * d38(col("yu"))).as("syy"),
        sum(d38(col("xu")) * d38(col("yu"))).as("sxy"))
    val dr = Stats.deltaRatio(col("n"), col("sx"), col("sy"),
      col("sxx"), col("syy"), col("sxy"))
    m.select(col("w.start").as("bucket"), col("variant"),
      col("n").as("n_users"),
      graft.ops.TimeSeries.portableRound6(dr.r / lit(100.0)).as("r"),
      graft.ops.TimeSeries.portableRound6(dr.se / lit(100.0))
        .as("se_delta"))
  }
}
