package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
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
    * passes them (flushing everything when the key idles out).
    *
    * @param ds      input keyed dataset
    * @param key     grouping key extractor
    * @param eventTs event-time extractor (must be the watermark column)
    */
  def sorted[T, K](ds: Dataset[T], key: T => K, eventTs: T => Timestamp)(
      implicit kEnc: Encoder[K], tEnc: Encoder[T]): Dataset[T] = {
    implicit val bufEnc: Encoder[Seq[T]] = Encoders.kryo[Seq[T]]
    ds.groupByKey(key)
      .flatMapGroupsWithState[Seq[T], T](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: K, rows: Iterator[T], state: GroupState[Seq[T]]) =>
          val buf = state.getOption.getOrElse(Seq.empty) ++ rows
          val wm = state.getCurrentWatermarkMs()
          val (release, keep) =
            if (state.hasTimedOut) (buf, Seq.empty[T])
            else buf.partition(t => eventTs(t).getTime <= wm)
          if (keep.nonEmpty) {
            state.update(keep)
            // wake when the earliest buffered row could become releasable
            state.setTimeoutTimestamp(keep.map(eventTs(_).getTime).min + 1)
          } else {
            state.remove()
          }
          release.sortBy(eventTs(_).getTime).iterator
      }
  }
}
