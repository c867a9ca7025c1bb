package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming seasonal-naive deviation alarm — the ingest-time twin of
  * [[graft.ops.TimeSeries.seasonalNaiveBacktest]]'s per-bucket residual:
  * as each per-key hourly bucket CLOSES under the watermark, its count
  * is compared to the count one season (24 buckets) earlier; a closed
  * bucket whose |n − pred| exceeds `tolerance` emits an alert row —
  * the crawl-volume / queue-rate tripwire beside [[Sinks]]' driftAlarm
  * (distribution drift) and [[EwmaStream]] (smoothed level).
  *
  * State per key = the last `season` closed-bucket counts (a bounded
  * ring) + in-flight pending counts inside the watermark horizon; the
  * same buffer-fold-on-close machinery as EwmaStream, so interior gap
  * hours fold as x = 0 and reordered in-watermark arrivals cannot
  * change what emits. Buckets with no prediction (first season of a
  * key's life) never alert — exactly the backtest's null-pred rows. */
object ForecastAlarm {

  final case class AlarmState(lastBucketMs: Long, hasLast: Boolean,
                              ring: List[Long],
                              pending: List[(Long, Long)])

  final case class AlarmRow(key: String, bucket: Timestamp, n: Long,
                            pred: Long, abs_err: Long)

  private val HourMs = 3600 * 1000L

  def hourlyAlarms(events: DataFrame, keyCol: String, tsCol: String,
                   tolerance: Long, idleMs: Long,
                   season: Int = 24): DataFrame = {
    import events.sparkSession.implicits._
    implicit val stateEnc: Encoder[AlarmState] = Encoders.kryo[AlarmState]

    events
      .select(col(keyCol).cast("string"), col(tsCol))
      .as[(String, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[AlarmState, AlarmRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, rows: Iterator[(String, Timestamp)],
         state: org.apache.spark.sql.streaming.GroupState[AlarmState]) =>
          val wm = state.getCurrentWatermarkMs()
          var st = state.getOption.getOrElse(AlarmState(0L, false, Nil, Nil))
          val counts = collection.mutable.Map(st.pending: _*)
          rows.foreach { r =>
            val b = r._2.getTime - java.lang.Math.floorMod(r._2.getTime, HourMs)
            if (!(st.hasLast && b <= st.lastBucketMs))
              counts(b) = counts.getOrElse(b, 0L) + 1L
          }
          val timedOut = state.hasTimedOut
          val horizon = if (timedOut) Long.MaxValue else wm
          val (ripe, hold) = counts.partition { case (b, _) => b + HourMs <= horizon }
          val out = List.newBuilder[AlarmRow]
          if (ripe.nonEmpty) {
            val last = ripe.keys.max
            var b = if (st.hasLast) st.lastBucketMs + HourMs else ripe.keys.min
            while (b <= last) {
              val x = ripe.getOrElse(b, 0L)
              // ring holds the season's trailing counts, oldest first:
              // full ring ⇒ head is exactly the bucket one season back
              if (st.ring.length == season) {
                val pred = st.ring.head
                val err = math.abs(x - pred)
                if (err > tolerance)
                  out += AlarmRow(key, new Timestamp(b), x, pred, err)
              }
              st = st.copy(lastBucketMs = b, hasLast = true,
                ring = (st.ring :+ x).takeRight(season))
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
