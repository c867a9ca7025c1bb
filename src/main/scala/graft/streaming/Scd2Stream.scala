package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming SCD2 — the ingest-time twin of the batch
  * [[graft.ops.Relational.scd2]] interval build: per-key validity
  * intervals maintained under an OUT-OF-ORDER change stream.
  *
  * Order sensitivity is the whole problem (an interval's boundaries are
  * meaningless if a predecessor can still arrive), so events buffer in
  * per-key pending state and FOLD only once the watermark passes them —
  * in (ts, seq) order, exactly the batch operator's total order. Each
  * state change emits the CLOSED previous interval immediately (append
  * mode); the open interval rides in state until the key's event-time
  * idle timeout fires, which emits it with `valid_to = null` and drops
  * the state.
  *
  * Stream ≡ batch law (Scd2StreamSpec): for ANY arrival order within
  * the watermark, once every key has expired the emitted rows equal
  * `Relational.scd2` over the same events. State per key = the open
  * interval + pending events inside the watermark horizon — bounded by
  * the key's in-flight burst, never stream length.
  *
  * Reference analog: numaflow reduce keeps per-key ordered state the
  * same way (PBQ-backed, watermark-gated close —
  * `docs/user-guide/user-defined-functions/reduce/reduce.md:20-48`);
  * here the "window" is a state lifetime, closed by idleness. */
object Scd2Stream {

  /** hasOpen gates openAttr/openFrom (no Option: kryo-friendly, and a
    * null attr is representable); pending = (tsMs, seq, attr) not yet
    * past the watermark. */
  final case class Scd2State(openAttr: String, openFrom: Long,
                             hasOpen: Boolean,
                             pending: List[(Long, Long, String)])

  final case class IntervalRow(key: Long, attr: String,
                               valid_from: Timestamp,
                               valid_to: Option[Timestamp])

  /** @param events streaming frame carrying a watermark on `tsCol`
    * @param idleMs event-time horizon past a key's last activity after
    *               which its open interval emits and state drops */
  def intervals(events: DataFrame, keyCol: String, tsCol: String,
                seqCol: String, attrCol: String, idleMs: Long): DataFrame = {
    import events.sparkSession.implicits._
    implicit val stateEnc: Encoder[Scd2State] = Encoders.kryo[Scd2State]

    events
      // tsCol selected UNCAST: a cast would mint a fresh attribute and
      // strip the watermark tag the event-time timeout requires.
      .select(col(keyCol).cast("long"), col(tsCol),
        col(seqCol).cast("long"), col(attrCol).cast("string"))
      .as[(Long, Timestamp, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Scd2State, IntervalRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, rows: Iterator[(Long, Timestamp, Long, String)],
         state: org.apache.spark.sql.streaming.GroupState[Scd2State]) =>
          val wm = state.getCurrentWatermarkMs()
          var st = state.getOption.getOrElse(Scd2State(null, 0L, false, Nil))
          val arrived = rows.map(r => (r._2.getTime, r._3, r._4)).toList
          val timedOut = state.hasTimedOut
          // at timeout everything folds (watermark passed the idle
          // horizon, so nothing for this key can still arrive in-order)
          val horizon = if (timedOut) Long.MaxValue else wm
          val (ripe, hold) = (st.pending ++ arrived).partition(_._1 <= horizon)
          val out = List.newBuilder[IntervalRow]
          ripe.sortBy(e => (e._1, e._2)).foreach { case (t, _, a) =>
            if (!st.hasOpen)
              st = st.copy(openAttr = a, openFrom = t, hasOpen = true)
            else if (st.openAttr != a) {
              out += IntervalRow(key, st.openAttr,
                new Timestamp(st.openFrom), Some(new Timestamp(t)))
              st = st.copy(openAttr = a, openFrom = t)
            }
          }
          if (timedOut) {
            if (st.hasOpen)
              out += IntervalRow(key, st.openAttr,
                new Timestamp(st.openFrom), None)
            state.remove()
          } else {
            st = st.copy(pending = hold)
            state.update(st)
            val lastSeen = ((if (st.hasOpen) st.openFrom else Long.MinValue) ::
              st.pending.map(_._1)).max
            state.setTimeoutTimestamp(math.max(lastSeen, wm) + idleMs)
          }
          out.result().iterator
      }
      .toDF()
  }
}
