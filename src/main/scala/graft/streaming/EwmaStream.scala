package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming EWMA — the ingest-time twin of the batch
  * [[graft.ops.TimeSeries.ewma]]: per-key hourly event counts smoothed
  * recursively (ewmaₜ = α·xₜ + (1−α)·ewmaₜ₋₁) as event-time buckets
  * CLOSE under the watermark — the live health signal (queue-rate
  * smoothing, crawl-volume alarms) the daemon's rater series feeds.
  *
  * The recursion is order-sensitive, so arriving events accumulate into
  * per-bucket pending counts and a bucket folds only once the watermark
  * passes its END (nothing can still arrive inside it). Folding walks
  * bucket-by-bucket from the last folded bucket, so interior gap hours
  * contribute x = 0 exactly like the batch grid fill. The per-key idle
  * timeout flushes the tail and drops state.
  *
  * Stream ≡ batch law (EwmaStreamSpec): for ANY in-watermark arrival
  * order, once every key has expired the emitted rows equal
  * `TimeSeries.ewma` over the same events. State per key = the running
  * (bucket, ewma) pair + in-flight bucket counts inside the watermark
  * horizon — bounded by the horizon, never stream length. */
object EwmaStream {

  final case class EwmaState(lastBucketMs: Long, ewma: Double,
                             hasLast: Boolean,
                             pending: List[(Long, Long)])

  final case class EwmaRow(key: String, bucket: Timestamp, n: Long,
                           ewma: Double)

  private val HourMs = 3600 * 1000L

  /** @param events streaming frame carrying a watermark on `tsCol`
    * @param idleMs event-time horizon past a key's last activity after
    *               which its remaining buckets fold and state drops */
  def hourlyCounts(events: DataFrame, keyCol: String, tsCol: String,
                   alpha: Double, idleMs: Long): DataFrame = {
    import events.sparkSession.implicits._
    implicit val stateEnc: Encoder[EwmaState] = Encoders.kryo[EwmaState]

    events
      // tsCol selected UNCAST: a cast would mint a fresh attribute and
      // strip the watermark tag the event-time timeout requires.
      .select(col(keyCol).cast("string"), col(tsCol))
      .as[(String, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[EwmaState, EwmaRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, rows: Iterator[(String, Timestamp)],
         state: org.apache.spark.sql.streaming.GroupState[EwmaState]) =>
          val wm = state.getCurrentWatermarkMs()
          var st = state.getOption.getOrElse(EwmaState(0L, 0.0, false, Nil))
          val counts = collection.mutable.Map(st.pending: _*)
          rows.foreach { r =>
            val b = r._2.getTime - java.lang.Math.floorMod(r._2.getTime, HourMs)
            // a replayed/late row for an already-folded bucket must not
            // resurrect it (its emission is immutable in append mode)
            if (!(st.hasLast && b <= st.lastBucketMs))
              counts(b) = counts.getOrElse(b, 0L) + 1L
          }
          val timedOut = state.hasTimedOut
          val horizon = if (timedOut) Long.MaxValue else wm
          val (ripe, hold) = counts.partition { case (b, _) => b + HourMs <= horizon }
          val out = List.newBuilder[EwmaRow]
          if (ripe.nonEmpty) {
            val last = ripe.keys.max
            var b = if (st.hasLast) st.lastBucketMs + HourMs else ripe.keys.min
            while (b <= last) {
              val x = ripe.getOrElse(b, 0L)
              val e = if (!st.hasLast) x.toDouble
                      else alpha * x.toDouble + (1.0 - alpha) * st.ewma
              st = st.copy(lastBucketMs = b, ewma = e, hasLast = true)
              // identical rounding to the batch op's multiply-round-divide
              // (Spark Round = BigDecimal.valueOf + HALF_UP on the double)
              out += EwmaRow(key, new Timestamp(b), x,
                java.math.BigDecimal.valueOf(e * 10000)
                  .setScale(0, java.math.RoundingMode.HALF_UP)
                  .doubleValue() / 10000)
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
