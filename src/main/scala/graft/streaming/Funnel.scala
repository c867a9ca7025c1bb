package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered funnel — the ingest-time twin of the batch
  * `ev_funnel` query: per-user state advances monotonically through a
  * step sequence (e.g. view → click → purchase), where step i must carry
  * an event time strictly after the FIRST occurrence of step i-1. Every
  * advance emits (user, step, ts) immediately — the realtime conversion
  * feed a batch funnel only produces at the end of the day.
  *
  * Matches the batch min-aggregation semantics for ANY arrival order
  * inside the watermark: a step event that cannot latch yet (its
  * predecessor hasn't happened) parks in a per-step pending list; when a
  * predecessor latches, the cascade latches min(pending > t_prev) —
  * exactly the batch `min(ts) WHERE ts > t_prev`. A click arriving one
  * micro-batch BEFORE its view therefore still counts, where a
  * process-in-arrival-order fold would silently drop it.
  *
  * State per active user: n latched longs + pending lists bounded by the
  * user's funnel-step events in the idle horizon; event-time timeout
  * `idleMs` past the user's last event expires the whole entry — state ∝
  * active users, not stream length. Emitted rows can carry event times
  * older than the current watermark (a cascade can release parked
  * steps); feed them to sinks/projections, not into another stateful
  * operator.
  */
object Funnel {

  /** latched(i): epoch-millis of step i's first qualifying event, -1 if
    * unreached; pending(i): parked candidate times for unlatched steps. */
  final case class FunnelState(latched: Array[Long], pending: Array[List[Long]])

  final case class StepAdvance(user_id: Long, step: Int, ts: Timestamp)

  /** @param events    streaming (userCol: long, typeCol: string, tsCol:
    *                  timestamp) frame, MUST already carry a watermark on
    *                  `tsCol`
    * @param stepTypes ordered event types forming the funnel
    * @param idleMs    state expiry horizon past a user's last event */
  def steps(events: DataFrame, userCol: String, typeCol: String, tsCol: String,
            stepTypes: Seq[String], idleMs: Long): DataFrame = {
    import events.sparkSession.implicits._
    implicit val stateEnc: Encoder[FunnelState] = Encoders.kryo[FunnelState]
    val n = stepTypes.size
    val typeIdx = stepTypes.zipWithIndex.toMap

    events
      .select(col(userCol).cast("long"), col(typeCol), col(tsCol))
      .as[(Long, String, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, StepAdvance](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, String, Timestamp)],
         state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val st = state.getOption
              .getOrElse(FunnelState(Array.fill(n)(-1L), Array.fill(n)(Nil)))
            val batch = rows.toSeq
            batch.foreach { case (_, tpe, ts) =>
              typeIdx.get(tpe).foreach { i =>
                if (st.latched(i) < 0) st.pending(i) ::= ts.getTime
              }
            }
            val out = List.newBuilder[StepAdvance]
            var i = 0
            while (i < n) {
              if (st.latched(i) < 0 && (i == 0 || st.latched(i - 1) >= 0)) {
                val floor = if (i == 0) Long.MinValue else st.latched(i - 1)
                val cands = st.pending(i).filter(_ > floor)
                if (cands.nonEmpty) {
                  st.latched(i) = cands.min
                  out += StepAdvance(user, i + 1, new Timestamp(st.latched(i)))
                }
                // parked times at or below the (now fixed) floor can
                // never qualify — drop them either way.
                st.pending(i) = if (st.latched(i) >= 0) Nil
                  else st.pending(i).filter(_ > floor)
              }
              i += 1 // cascade: latching step i may unlock step i+1
            }
            state.update(st)
            val clock = batch.map(_._3.getTime).max
            state.setTimeoutTimestamp(
              math.max(clock, state.getCurrentWatermarkMs()) + idleMs)
            out.result().iterator
          }
      }
      .toDF()
  }
}
