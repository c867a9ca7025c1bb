package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming additive Holt–Winters — the ingest-time twin of
  * [[graft.ops.TimeSeries.holtWinters]], and now the GENERAL form of the
  * bucket-folding smoothing recursion: γ = 0 degenerates bit-exactly to
  * plain Holt (the seasonal history stays identically 0.0, so
  * level = α·(x − 0) + … is the Holt chain), which is how
  * [[HoltStream]] delegates here — and EwmaStream in turn delegates to
  * HoltStream at β = 0. One fold, one set of replay/gap/idle semantics,
  * three operators.
  *
  * The batch op's ONLINE initialization (l₁ = x₁, b₁ = 0, missing
  * seasonal history ≡ 0) was chosen exactly so this twin can exist:
  * neither side ever looks ahead, so the streamed trajectory replays
  * the batch fold bucket for bucket under any batch split.
  *
  * Mechanics inherited from the Holt fold: per-bucket pending counts
  * accumulate until the watermark passes a bucket's END, folding walks
  * bucket-by-bucket from the last folded one (interior gaps fold as
  * x = 0 like the batch grid fill), replays of already-folded buckets
  * are ignored, and the per-key event-time idle timeout flushes the
  * tail and drops state. State per key = (level, trend, last bucket,
  * ≤ m rotating seasonal values) + in-horizon pending counts — bounded
  * by m and the watermark horizon, never stream length. */
object HoltWintersStream {

  final case class HwState(lastBucketMs: Long, level: Double,
                           trend: Double, hasLast: Boolean,
                           seasonal: Vector[Double],
                           pending: List[(Long, Long)])

  final case class HwRow(key: String, bucket: Timestamp, n: Long,
                         level: Double, trend: Double, seasonal: Double,
                         forecast_next: Double)

  private val HourMs = 3600 * 1000L

  private def round4(v: Double): Double =
    java.math.BigDecimal.valueOf(v * 10000)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue() / 10000

  def hourlyCounts(events: DataFrame, keyCol: String, tsCol: String,
                   alpha: Double, beta: Double, gamma: Double, m: Int,
                   idleMs: Long): DataFrame = {
    import events.sparkSession.implicits._
    implicit val stateEnc: Encoder[HwState] = Encoders.kryo[HwState]

    events
      // tsCol selected UNCAST: a cast would mint a fresh attribute and
      // strip the watermark tag the event-time timeout requires.
      .select(col(keyCol).cast("string"), col(tsCol))
      .as[(String, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[HwState, HwRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, rows: Iterator[(String, Timestamp)],
         state: org.apache.spark.sql.streaming.GroupState[HwState]) =>
          val wm = state.getCurrentWatermarkMs()
          var st = state.getOption
            .getOrElse(HwState(0L, 0.0, 0.0, false, Vector.empty, Nil))
          val counts = collection.mutable.Map(st.pending: _*)
          rows.foreach { r =>
            val b = r._2.getTime - java.lang.Math.floorMod(r._2.getTime, HourMs)
            if (!(st.hasLast && b <= st.lastBucketMs))
              counts(b) = counts.getOrElse(b, 0L) + 1L
          }
          val timedOut = state.hasTimedOut
          val horizon = if (timedOut) Long.MaxValue else wm
          val (ripe, hold) = counts.partition { case (b, _) => b + HourMs <= horizon }
          val out = List.newBuilder[HwRow]
          if (ripe.nonEmpty) {
            val last = ripe.keys.max
            var b = if (st.hasLast) st.lastBucketMs + HourMs else ripe.keys.min
            while (b <= last) {
              val x = ripe.getOrElse(b, 0L)
              // identical float chain to the batch fold: sOld from the
              // rotating window (0 until a full season exists), level
              // first, trend from it, seasonal from both.
              val sOld = if (st.seasonal.length == m) st.seasonal.head else 0.0
              val (level, trend) =
                if (!st.hasLast) (x.toDouble, 0.0)
                else {
                  val l = alpha * (x.toDouble - sOld) +
                    (1.0 - alpha) * (st.level + st.trend)
                  (l, beta * (l - st.level) + (1.0 - beta) * st.trend)
                }
              val sNew = gamma * (x.toDouble - level) + (1.0 - gamma) * sOld
              val sl =
                (if (st.seasonal.length == m) st.seasonal.tail
                 else st.seasonal) :+ sNew
              st = st.copy(lastBucketMs = b, level = level, trend = trend,
                hasLast = true, seasonal = sl)
              val sNext = if (sl.length == m) sl.head else 0.0
              out += HwRow(key, new Timestamp(b), x,
                round4(level), round4(trend), round4(sNew),
                round4(level + trend + sNext))
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
