package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{TextAnalysis, TimeSeries}

/** Windowed quality-yield monitor — the streaming twin of the batch
  * `curate_yield_curve`: per event-time window, the fraction of
  * arriving docs (and their tokens) that clear the FROZEN quality bar.
  * The live crawl dashboard: a yield drop means the crawl mix changed
  * (a junk source spiked, a parser broke) long before any downstream
  * corpus audit runs — the curation analog of the OOV / Benford drift
  * monitors.
  *
  * One stateful aggregation: the classifier score and token count
  * project ROW-LOCALLY (the [[TextAnalysis.classifierLogit]] expression
  * chain, zero shuffles before the window agg), then groupBy(window)
  * folds four exact longs per window — docs/tokens, kept docs/kept
  * tokens. The threshold is a frozen literal (the operating point the
  * batch yield curve picked); refitting it live would hide the drift
  * this monitor exists to catch.
  *
  * Stream ≡ batch: a closed window's row equals the same aggregate over
  * that window's rows in a batch frame — one shared plan builder. */
object YieldStream {

  private def agg(df: DataFrame, textCol: String, tsCol: String,
                  threshold: Double, windowDur: String): DataFrame = {
    df.select(col(tsCol),
        TextAnalysis.classifierScoreCol(col(textCol)).as("score"),
        TextAnalysis.tokenCount(col(textCol)).as("nt"))
      .groupBy(window(col(tsCol), windowDur))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nt")).as("n_tokens"),
        sum(when(col("score") >= threshold, 1L).otherwise(0L))
          .as("n_docs_kept"),
        sum(when(col("score") >= threshold, col("nt")).otherwise(0L))
          .as("n_tokens_kept"))
      .select(col("window.start").as("bucket"),
        col("n_docs"), col("n_docs_kept"), col("n_tokens_kept"),
        TimeSeries.portableRound6(col("n_tokens_kept").cast("double") /
          col("n_tokens").cast("double")).as("token_yield"))
  }

  /** The streaming monitor: append-mode per-window rows after close. */
  def windowed(stream: DataFrame, textCol: String, tsCol: String,
               threshold: Double, windowDur: String = "1 hour",
               delay: String = "10 minutes"): DataFrame =
    agg(stream.withWatermark(tsCol, delay), textCol, tsCol, threshold,
      windowDur)

  /** Batch twin on a static frame — the spec's equality reference. */
  def batch(df: DataFrame, textCol: String, tsCol: String,
            threshold: Double, windowDur: String = "1 hour"): DataFrame =
    agg(df, textCol, tsCol, threshold, windowDur)
}
