package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation (SURVEY §2.5, the reference's Reduce).
  *
  * The reference assigns messages to fixed/sliding windows keyed by
  * `[truncate(event_time, L), +L)` (numaflow
  * `reduce/reducer/aligned/windower/fixed.rs:60-89`, `sliding.rs`) and to
  * gap-merged session windows (`unaligned/windower/session.rs:58-250`).
  * Spark's `window()` / `session_window()` implement the identical
  * assignment, and its partial+final HashAggregate replaces the reference's
  * one-task-per-window model — at 100 TB the map-side partial aggregation
  * means the shuffle carries one row per (key, window) per input partition,
  * not one row per message.
  *
  * Batch forms below double as the oracle-checkable analogs; the streaming
  * forms (same calls plus `withWatermark`) live in graft.streaming.
  */
object Windows {

  /** W1: tumbling window of `length`, optionally keyed (W5: keyed=false ->
    * global per-window aggregation, reference forces partitions=1 there;
    * Spark needs no such restriction because the final agg still
    * parallelizes over windows). */
  def fixed(df: DataFrame, tsCol: String, length: String,
            keys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(col(tsCol), length) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("w_start", col("window.start"))
      .withColumn("w_end", col("window.end"))
      .drop("window")

  /** W2: sliding window length L, slide S: each row lands in L/S windows. */
  def sliding(df: DataFrame, tsCol: String, length: String, slide: String,
              keys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(col(tsCol), length, slide) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("w_start", col("window.start"))
      .withColumn("w_end", col("window.end"))
      .drop("window")

  /** W3: session window with inactivity gap; Spark merges overlapping
    * per-key sessions natively (the reference's Merge/Expand ops). The
    * batch output keeps session start plus aggregates. */
  def session(df: DataFrame, tsCol: String, gap: String,
              keys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupBy(session_window(col(tsCol), gap) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("session_window.start"))
      .drop("session_window")
}
