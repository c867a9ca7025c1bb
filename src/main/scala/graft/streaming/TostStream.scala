package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Stats

/** Streaming guardrail-equivalence monitor — the windowed twin of the
  * batch `stat_tost` query, and the complement of [[FdrStream]]'s
  * movement alarm: where FdrStream fires when a metric MOVED, this
  * certifies per closing window that each guardrail metric provably
  * stayed PUT (TOST: both one-sided Welch tests clear the
  * ±marginFrac·pooled-mean band). A rollout gate reads `equiv = 1`
  * across its guardrails before widening exposure — "no evidence of
  * movement" (a lazy t-test) is NOT that certificate.
  *
  * One windowed aggregate over exact integer-cents moments (map-side
  * partials absorb the event volume; state = one 6-number row per open
  * (window, metric)); the decision chain is [[Stats.tost]] — the SAME
  * expression tree as the batch query, so a frozen-window replay
  * reproduces the batch row bit for bit (TostStreamSpec). A
  * zero-variance metric (dead gauge, stuck price) yields null
  * statistics and a null flag, never a DIVIDE_BY_ZERO that kills the
  * monitoring job — the FdrStream lesson, inherited from the kernel. */
object TostStream {

  /** @param stream    event rows: `tsCol` event time, `metricCol` the
    *                  guardrail name, `variantCol` 0/1 arm, `valueCol`
    *                  the metric value (money-scale; cents-exact).
    * @return per closed (window, metric): per-arm counts, 6dp means and
    *         one-sided statistics, and the 1/0/null equivalence flag. */
  def windowedEquivalence(stream: DataFrame, tsCol: String, metricCol: String,
                          variantCol: String, valueCol: String,
                          windowDur: String = "1 hour",
                          delay: String = "5 minutes",
                          marginFrac: Double = 0.05): DataFrame = {
    val x = (col(valueCol).cast("decimal(18,2)") * 100).cast("decimal(38,0)")
    val m = stream
      .withWatermark(tsCol, delay)
      .select(col(tsCol), col(metricCol).as("metric"),
        col(variantCol).cast("long").as("variant"), x.as("x"))
      .groupBy(window(col(tsCol), windowDur).as("w"), col("metric"))
      .agg(
        sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("variant") === 0, col("x"))).as("sx0"),
        sum(when(col("variant") === 0, col("x") * col("x"))).as("sxx0"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("variant") === 1, col("x"))).as("sx1"),
        sum(when(col("variant") === 1, col("x") * col("x"))).as("sxx1"))
    val t = Stats.tost(col("n0"), col("sx0"), col("sxx0"),
      col("n1"), col("sx1"), col("sxx1"), marginFrac)
    def r6(c: org.apache.spark.sql.Column) = round(c * 1000000) / 1000000
    m.select(col("w.start").as("bucket"), col("metric"),
      col("n0"), col("n1"),
      r6(t.mean0c / 100.0).as("mean0"),
      r6(t.mean1c / 100.0).as("mean1"),
      r6(when(t.se2 > 0, t.tLow)).as("t_low"),
      r6(when(t.se2 > 0, t.tUp)).as("t_up"),
      t.equiv.as("equiv"))
  }
}
