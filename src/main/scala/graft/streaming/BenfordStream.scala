package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Windowed Benford first-digit drift monitor — the streaming twin of
  * `ev_benford`: per event-time window, the first-digit distribution of
  * the value column against the Benford expectation, scored as a total
  * variation distance. A window whose TV crosses the threshold is the
  * live fraud/synthetic-data alarm (a bot burst of round-number
  * amounts bends the digit histogram long before any per-user rule
  * fires).
  *
  * One stateful aggregation: groupBy(window) with the nine digit
  * counters as conditional sums — per-window state is ten longs, the
  * TV fold over nine literal-injected expectations is row-local
  * arithmetic AFTER the aggregate, and the window emits once on
  * watermark close (append mode). No second stateful stage, no
  * per-digit state rows.
  *
  * Stream ≡ batch: a closed window's row equals the same arithmetic
  * over that window's rows in a batch frame (BenfordStreamSpec) — the
  * digit counts are exact longs and the TV is one deterministic double
  * chain from them.
  */
object BenfordStream {

  /** Benford mass for digits 1..9 — same literals as ev_benford. */
  val Expected: Seq[Double] = (1 to 9).map(d => math.log10(1.0 + 1.0 / d))

  private def digitOf(valueCol: Column): Column =
    substring((valueCol.cast("decimal(18,2)") * 100)
      .cast("decimal(38,0)").cast("string"), 1, 1).cast("int")

  /** Shared scoring: from (window-grouped) digit counters d1..d9 + n,
    * the TV distance ½·Σ|nᵢ/n − eᵢ| and the worst digit. */
  private def scored(grouped: DataFrame): DataFrame = {
    val tv = (1 to 9).map { i =>
      abs(col(s"d$i").cast("double") / col("n").cast("double")
        - lit(Expected(i - 1)))
    }.reduce(_ + _) / 2.0
    val worst = (1 to 9).map { i =>
      struct((-abs(col(s"d$i").cast("double") / col("n").cast("double")
        - lit(Expected(i - 1)))).as("negdev"), lit(i).cast("int").as("digit"))
    }
    grouped.select(col("window_start"), col("n"),
      round(tv * 1000000) / 1000000 as "tv",
      least(worst: _*).getField("digit").as("worst_digit"))
  }

  /** The one windowed digit aggregate both twins share — the stream ≡
    * batch guarantee is this being literally the same plan builder. */
  private def digitAgg(df: DataFrame, valueCol: String, tsCol: String,
                       windowDur: String): DataFrame =
    df.select(col(tsCol), digitOf(col(valueCol)).as("digit"))
      .where(col("digit").between(1, 9))
      .groupBy(window(col(tsCol), windowDur))
      .agg(count(lit(1)).as("n"),
        (1 to 9).map(i =>
          sum(when(col("digit") === i, 1L).otherwise(0L)).as(s"d$i")): _*)
      .select(col("window.start").as("window_start") +:
        col("n") +: (1 to 9).map(i => col(s"d$i")): _*)

  /** The streaming monitor: append-mode per-window rows after close. */
  def windowed(stream: DataFrame, valueCol: String, tsCol: String,
               windowDur: String = "1 hour",
               delay: String = "10 minutes"): DataFrame =
    scored(digitAgg(stream.withWatermark(tsCol, delay),
      valueCol, tsCol, windowDur))

  /** Batch twin on a static frame — the spec's equality reference. */
  def batch(df: DataFrame, valueCol: String, tsCol: String,
            windowDur: String = "1 hour"): DataFrame =
    scored(digitAgg(df, valueCol, tsCol, windowDur))
}
