package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Accumulator window (SURVEY W4): per-key global window whose UDF sees the
  * raw, event-time-ordered datum stream and may reorder / custom-trigger;
  * the engine truncates state up to the emitted watermark and closes the
  * key after an idle timeout (numaflow
  * `rust/numaflow-core/src/reduce/reducer/unaligned/windower/accumulator.rs:1-60`,
  * docs `user-guide/user-defined-functions/reduce/windowing/accumulator.md`).
  *
  * Spark has no built-in for this; it maps to flatMapGroupsWithState with
  * event-time timeout:
  *  - buffer incoming rows per key (the PBQ analog — Spark's state store
  *    plays the reference's WAL role, checkpointed and replayed);
  *  - when the query watermark passes a buffered row's event time, the row
  *    is releasable: emit in event-time order (the canonical "stream
  *    sorter" accumulator, examples/40-stream-sorter.yaml);
  *  - state keeps only rows still above the watermark (truncate-≤-WM);
  *  - an idle key times out and flushes (close semantics).
  *
  * State per key is O(out-of-orderness window), not O(stream), so keys
  * scale horizontally with shuffle partitions — the same contract as the
  * reference's per-key accumulator tasks.
  */
object AccumulatorWindow {

  /** One buffered element: event-time millis + opaque payload. */
  final case class Acc[T](ts: Long, value: T)

  /** Sort a keyed stream by event time, releasing rows as the watermark
    * passes them. A timeout wakeup is a RELEASE opportunity, not a flush:
    * only rows at-or-below the current watermark are emitted, preserving
    * the operator's event-time-ordering contract even for keys that idle
    * across micro-batches. A full flush (the reference's accumulator
    * `timeout` close, udf.go:150-154) happens only once the watermark has
    * passed max-buffered-event-time + idleTimeout — at which point every
    * buffered row is below the watermark anyway, so ordering still holds
    * and the key's state is dropped.
    *
    * @param ds          input keyed dataset
    * @param key         grouping key extractor
    * @param eventTs     event-time extractor (must be the watermark column)
    * @param idleTimeout close-after-idle duration in millis (0 = sorter
    *                    only: state closes when the buffer drains)
    */
  def sorted[T, K](ds: Dataset[T], key: T => K, eventTs: T => Timestamp,
                   idleTimeout: Long = 0L)(
      implicit kEnc: Encoder[K], tEnc: Encoder[T]): Dataset[T] = {
    implicit val bufEnc: Encoder[Seq[T]] = Encoders.kryo[Seq[T]]
    ds.groupByKey(key)
      .flatMapGroupsWithState[Seq[T], T](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: K, rows: Iterator[T], state: GroupState[Seq[T]]) =>
          val buf = state.getOption.getOrElse(Seq.empty) ++ rows
          val wm = state.getCurrentWatermarkMs()
          val maxTs = if (buf.nonEmpty) buf.map(eventTs(_).getTime).max else Long.MinValue
          val idleClosed = state.hasTimedOut && idleTimeout > 0 &&
            wm >= maxTs + idleTimeout
          val (release, keep) =
            if (idleClosed) (buf, Seq.empty[T])
            else buf.partition(t => eventTs(t).getTime <= wm)
          if (keep.nonEmpty) {
            state.update(keep)
            // wake when the earliest buffered row could become releasable,
            // or at the idle-close deadline, whichever is sooner (the
            // timestamp must sit above the current watermark to be legal).
            val releaseWake = keep.map(eventTs(_).getTime).min + 1
            val wake =
              if (idleTimeout > 0) math.min(releaseWake, maxTs + idleTimeout)
              else releaseWake
            state.setTimeoutTimestamp(math.max(wake, wm + 1))
          } else {
            state.remove()
          }
          release.sortBy(eventTs(_).getTime).iterator
      }
  }

  /** Untyped (DataFrame) form of [[sorted]] so the pipeline compiler can
    * build an accumulator vertex from a spec: key = the GroupBy key
    * columns' values, event time = `tsCol`. */
  def sortedRows(df: DataFrame, keyCols: Seq[String], tsCol: String,
                 idleTimeout: Long = 0L): DataFrame = {
    val schema = df.schema
    val tsIdx = schema.fieldIndex(tsCol)
    val keyIdx = keyCols.map(schema.fieldIndex)
    implicit val rowEnc: Encoder[Row] = RowEncoder.encoderFor(schema)
    implicit val keyEnc: Encoder[Seq[String]] = Encoders.kryo[Seq[String]]
    sorted[Row, Seq[String]](
      df, r => keyIdx.map(i => String.valueOf(r.get(i))),
      r => r.getTimestamp(tsIdx), idleTimeout)
  }
}
