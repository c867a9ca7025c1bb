package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.ops.Stats

/** Streaming Wald SPRT — the live twin of [[graft.ops.Stats.sprtDecision]]
  * (sequential testing IS the natively streaming computation: the whole
  * point of Wald's design is deciding while the data arrives instead of
  * waiting for a fixed horizon). The monitor checks the boundary after
  * each CLOSED event-time bucket: trials aggregate into watermark-closed
  * (bucket, arm) counts (append mode, so buckets reach an arm in
  * event-time order across triggers), and a per-arm fold adds each
  * bucket's (k trials, j successes) to the running exact µ-nat LLR —
  * the same [[Stats.sprtMicroNats]] constants as the batch op, so the
  * decision arithmetic is BIGINT-identical. One trajectory point emits
  * per closed bucket; a decided arm goes silent (the test is over).
  *
  * Granularity contract: the streaming decision lands on the first
  * BUCKET END whose cumulative LLR crosses, while the batch op reports
  * the exact trial index — if the bucket-level LLR crosses, the
  * trial-level statistic crossed at some trial inside or before that
  * bucket (the cumulative LLR at bucket end IS a trial-level LLR value).
  * Shrink `bucket` toward per-trial granularity when the exact stopping
  * trial matters live.
  *
  * State per arm is two longs + a flag — never the trials — so state
  * size is |arms| (bounded by experiment design), watermark-independent. */
object SprtStream {

  /** One judged bucket of the trajectory (µ-nat LLR, like the batch
    * op's internal llr_u; divide by 1e6 for nats). */
  final case class SprtPoint(arm: Int, bucket: Timestamp, n: Long, s: Long,
                             llr_u: Long, decision: String)

  /** Running (trials, successes, decided) per arm — the entire state. */
  final case class SprtState(n: Long, s: Long, decided: Boolean)

  def decisions(stream: DataFrame, armCol: String, succCol: String,
                tsCol: String, p0: Double, p1: Double,
                alpha: Double = 0.05, beta: Double = 0.20,
                bucket: String = "1 minute",
                delay: String = "5 minutes"): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val (l1, l0, up, lo) = Stats.sprtMicroNats(p0, p1, alpha, beta)
    stream
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), bucket).as("w"),
        col(armCol).cast("int").as("arm"))
      .agg(count(lit(1)).as("k"),
        sum(col(succCol).cast("int").cast("long")).as("j"))
      .select(col("arm"), col("w.end").cast("timestamp").as("bend"),
        col("k"), col("j"))
      .as[(Int, Timestamp, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SprtState, SprtPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (arm, rows, state) =>
          var st = state.getOption.getOrElse(SprtState(0L, 0L, false))
          val out = rows.toSeq.sortBy(_._2.getTime).flatMap {
            case (_, bend, k, j) =>
              if (st.decided) None
              else {
                val n = st.n + k; val s = st.s + j
                val llr = s * l1 + (n - s) * l0
                val dec = if (llr >= up) "accept_h1"
                          else if (llr <= lo) "accept_h0"
                          else "continue"
                st = SprtState(n, s, dec != "continue")
                Some(SprtPoint(arm, bend, n, s, llr, dec))
              }
          }
          state.update(st)
          out.iterator
      }
      .toDF()
  }
}
