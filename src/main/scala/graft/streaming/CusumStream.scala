package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming CUSUM change-point alarm — the ingest-time twin of
  * [[graft.ops.TimeSeries.cusum]]. Sequential detection is the natively
  * streaming computation (Page's statistic was designed for one pass over
  * an arriving series), so the stream carries the recursion itself:
  * Sₜ = max(0, Sₜ₋₁ + 2T·xₜ − 3Σx), alarm ⇔ Sₜ > 8Σx, with the reference
  * envelope (T, Σx) FROZEN from history per key (the MadAlarm convention:
  * train on settled data, judge live traffic, refresh on your own cadence
  * — a level shift cannot drag its own reference mean up mid-incident,
  * which the batch op's whole-series mean would allow).
  *
  * Shape: windowed hourly counts in APPEND mode (only watermark-closed
  * buckets emit) chained into flatMapGroupsWithState carrying one
  * (S, lastBucket) pair per key — the Spark 4 multi-stateful-operator
  * pattern. Closed buckets reach a key in watermark order across
  * triggers; within one trigger they sort by bucket before folding.
  * SILENT hours never emit a window, so the fold applies their drift
  * arithmetically on the next arrival: k missed buckets contribute
  * max(0, S − 3Σx·k) in one step, exactly the batch gap-fill semantics
  * (the max(0,·) clamp distributes over consecutive negative drifts).
  *
  * State per key is two longs — not the series, not the window — so
  * state size is |keys|, watermark-independent; keys without a frozen
  * envelope pass through silently (no history, no verdict). */
object CusumStream {

  /** One judged bucket of the streaming trajectory. */
  final case class CusumPoint(key: String, bucket: Timestamp, n: Long,
                              cusum_scaled: Long, alarm: Boolean)

  /** Two longs per key — the entire state (public: encoder codegen needs
    * the constructor). */
  final case class CusumState(s: Long, lastHour: Long)

  /** @param baseline per-key frozen envelope (key, t, sx): bucket count
    *                 and total events of the training series — the two
    *                 scalars [[graft.ops.TimeSeries.cusum]] derives
    *                 per key. Collected driver-side (|keys| rows). */
  def hourlyTrajectory(stream: DataFrame, keyCol: String, tsCol: String,
                       baseline: Map[String, (Long, Long)],
                       delay: String = "5 minutes"): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), "1 hour").as("w"), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col(keyCol).cast("string").as("key"),
        (unix_timestamp(col("w.start")) / 3600L).cast("long").as("h"),
        col("n"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CusumState, CusumPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (key, rows, state) =>
          baseline.get(key) match {
            case None => Iterator.empty
            case Some((t, sx)) =>
              var st = state.getOption.getOrElse(CusumState(0L, Long.MinValue))
              val out = rows.toSeq.sortBy(_._2).map { case (_, h, n) =>
                val gaps =
                  if (st.lastHour == Long.MinValue) 0L else h - st.lastHour - 1
                val afterGaps = math.max(0L, st.s - 3L * sx * gaps)
                val s = math.max(0L, afterGaps + 2L * t * n - 3L * sx)
                st = CusumState(s, h)
                CusumPoint(key, new Timestamp(h * 3600L * 1000L), n, s,
                  s > 8L * sx)
              }
              state.update(st)
              out.iterator
          }
      }
      .toDF()
  }
}
