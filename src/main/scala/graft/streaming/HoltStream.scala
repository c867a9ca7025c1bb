package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming Holt double exponential smoothing — the ingest-time twin
  * of [[graft.ops.TimeSeries.holt]], and the GENERAL form of the
  * bucket-folding recursion: β = 0 degenerates bit-exactly to the
  * plain EWMA (level = α·x + (1−α)·(level + 0), trend pinned at 0.0),
  * which is how [[EwmaStream]] now delegates here — one fold, one set
  * of replay/gap/idle semantics, two operators.
  *
  * Mechanics inherited unchanged from the EWMA fold: per-bucket pending
  * counts accumulate until the watermark passes a bucket's END, folding
  * walks bucket-by-bucket from the last folded one (interior gaps fold
  * as x = 0 like the batch grid fill), replayed rows for already-folded
  * buckets are ignored (append-mode emissions are immutable), and the
  * per-key event-time idle timeout flushes the tail and drops state.
  * State per key = (level, trend, last bucket) + in-horizon pending
  * counts — bounded by the watermark horizon, never stream length. */
object HoltStream {

  final case class HoltState(lastBucketMs: Long, level: Double,
                             trend: Double, hasLast: Boolean,
                             pending: List[(Long, Long)])

  final case class HoltRow(key: String, bucket: Timestamp, n: Long,
                           level: Double, trend: Double,
                           forecast_next: Double)

  private val HourMs = 3600 * 1000L

  private def round4(v: Double): Double =
    java.math.BigDecimal.valueOf(v * 10000)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue() / 10000

  def hourlyCounts(events: DataFrame, keyCol: String, tsCol: String,
                   alpha: Double, beta: Double, idleMs: Long): DataFrame = {
    import events.sparkSession.implicits._
    implicit val stateEnc: Encoder[HoltState] = Encoders.kryo[HoltState]

    events
      // tsCol selected UNCAST: a cast would mint a fresh attribute and
      // strip the watermark tag the event-time timeout requires.
      .select(col(keyCol).cast("string"), col(tsCol))
      .as[(String, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[HoltState, HoltRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, rows: Iterator[(String, Timestamp)],
         state: org.apache.spark.sql.streaming.GroupState[HoltState]) =>
          val wm = state.getCurrentWatermarkMs()
          var st = state.getOption
            .getOrElse(HoltState(0L, 0.0, 0.0, false, Nil))
          val counts = collection.mutable.Map(st.pending: _*)
          rows.foreach { r =>
            val b = r._2.getTime - java.lang.Math.floorMod(r._2.getTime, HourMs)
            if (!(st.hasLast && b <= st.lastBucketMs))
              counts(b) = counts.getOrElse(b, 0L) + 1L
          }
          val timedOut = state.hasTimedOut
          val horizon = if (timedOut) Long.MaxValue else wm
          val (ripe, hold) = counts.partition { case (b, _) => b + HourMs <= horizon }
          val out = List.newBuilder[HoltRow]
          if (ripe.nonEmpty) {
            val last = ripe.keys.max
            var b = if (st.hasLast) st.lastBucketMs + HourMs else ripe.keys.min
            while (b <= last) {
              val x = ripe.getOrElse(b, 0L)
              // identical float chain to the batch fold (and, at β = 0,
              // to the original EWMA): level first, then trend FROM it.
              val (level, trend) =
                if (!st.hasLast) (x.toDouble, 0.0)
                else {
                  val l = alpha * x.toDouble +
                    (1.0 - alpha) * (st.level + st.trend)
                  (l, beta * (l - st.level) + (1.0 - beta) * st.trend)
                }
              st = st.copy(lastBucketMs = b, level = level, trend = trend,
                hasLast = true)
              out += HoltRow(key, new Timestamp(b), x,
                round4(level), round4(trend), round4(level + trend))
              b += HourMs
            }
          }
          if (timedOut) state.remove()
          else {
            st = st.copy(pending = hold.toList)
            state.update(st)
            val lastSeen = ((if (st.hasLast) st.lastBucketMs else Long.MinValue) ::
              st.pending.map(_._1)).max
            state.setTimeoutTimestamp(math.max(lastSeen, wm) + idleMs)
          }
          out.result().iterator
      }
      .toDF()
  }
}
