package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.ops.Dedup

/** Streaming MinHash-LSH near-duplicate detection: the batch dedup
  * pipeline's semantics at INGEST time. Each arriving doc's band buckets
  * probe the state of previously admitted docs in the same bucket; a
  * collision emits a (a, b) candidate pair while the doc flows on.
  * Extends the reference's exact-id ISB dedup (X2, js_writer.rs windowed
  * `MessageID` dedup) to near-duplicates, which only became streamable
  * once the signature turned into a pure projection
  * ([[Dedup.minhashSignatureExpr]] — no aggregation, any output mode).
  *
  * State per (band, bucket) is the posting list of (doc id, event-time),
  * truncated by `retention` against the watermark each visit — the exact
  * analog of the reference's time-bounded dedup window, so state is
  * O(docs per retention window / 2^bandBits), not O(stream).
  *
  * Pairs surface once per colliding band; the final
  * `dropDuplicatesWithinWatermark` collapses cross-band repeats of the
  * same pair inside the watermark horizon.
  */
object StreamingNearDup {

  final case class NearDupPair(a: Long, b: Long, ts: Timestamp)

  /** @param docs      streaming frame with (idCol: long, textCol, tsCol);
    *                  MUST already carry `withWatermark(tsCol, …)`
    * @param retention how long an admitted doc keeps matching (ms) */
  def pairs(docs: DataFrame, idCol: String, textCol: String, tsCol: String,
            retentionMs: Long, numPerm: Int = 12, rowsPerBand: Int = 3,
            shingleW: Int = 3): DataFrame = {
    import docs.sparkSession.implicits._
    // The static UnsupportedOperationChecker pattern-matches
    // "flatMapGroupsWithState(EventTimeTimeout) above another stateful op"
    // as a potential late-row hazard and refuses the plan outright. Here
    // the hazard cannot occur: every emitted pair carries the event time
    // of a row in the CURRENT batch (never an older stored timestamp),
    // and a cross-band repeat straggling past the pair-dedup watermark
    // surfaces one duplicate pair — idempotent for every consumer of a
    // dedup-pair stream — rather than losing data. Spark's documented
    // escape hatch for exactly this false positive:
    docs.sparkSession.conf.set(
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    // State = the posting list as a PACKED long array [id0,ts0,id1,ts1,…]
    // under the expression encoder (UnsafeArrayData): the r15 shape was
    // Encoders.kryo[List[(Long,Long)]], which boxed and Kryo-serialized
    // every element on every bucket visit — state ser/de was a measured
    // drag on the slowest twin (STREAMBENCH near_dup). Same entries,
    // same probe/evict semantics, cheaper round trip.

    val nBands = numPerm / rowsPerBand
    val sig = Dedup.withMinhashSignature(
      docs.select(col(idCol), col(textCol), col(tsCol)),
      textCol, numPerm, shingleW)
    val buckets = (0 until nBands).map { j =>
      concat_ws("|", lit(j) +:
        (j * rowsPerBand until (j + 1) * rowsPerBand).map(i => col(s"h$i")): _*)
    }
    val banded = sig
      .select(col(idCol).cast("long").as("id"), col(tsCol).as("ts"),
        explode(array(buckets: _*)).as("bucket"))
      .as[(Long, Timestamp, String)]

    banded
      .groupByKey(_._3)
      .flatMapGroupsWithState[Array[Long], NearDupPair](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: String, rows: Iterator[(Long, Timestamp, String)],
         state: GroupState[Array[Long]]) =>
          if (state.hasTimedOut) {
            // Dormant-bucket GC: visit-time eviction below only runs when
            // a bucket receives another doc, so a bucket that goes quiet
            // would otherwise hold its posting list forever. Event-time
            // timeout, NOT ProcessingTimeTimeout: the latter forces
            // shouldRunAnotherBatch=true on every batch — an endless
            // empty-batch busy loop that processAllAvailable never exits.
            // The min-watermark policy can lag this timeout (the
            // downstream pair-dedup watermark node only advances when
            // pairs flow), so it is a LATE upper bound on state life, but
            // entries GC'd here are ones a future probe would have
            // evicted by the group-local clock anyway.
            state.remove(); Iterator.empty
          } else {
          val batch = rows.toSeq.sortBy(r => (r._2.getTime, r._1))
          // Eviction clock = the group's own max event time, NOT the
          // global watermark: the downstream pair-dedup stage re-assigns
          // a watermark whose node starts at zero, and the min policy
          // would hold getCurrentWatermarkMs at 0 until output flows —
          // retention would silently never trigger. Group-local event
          // time is monotone per bucket and needs no cross-stage plumbing.
          val clock = batch.map(_._2.getTime).max
          val stored = state.getOption.getOrElse(Array.empty[Long])
          val posting = scala.collection.mutable.ArrayBuffer[Long]()
          posting.appendAll(stored)
          val out = List.newBuilder[NearDupPair]
          batch.foreach { case (id, ts, _) =>
            // retention checked PER PAIR against the probing row's own
            // event time (the reference's dedup window): a batch-max
            // pre-filter would both admit same-batch pairs farther apart
            // than retention and evict entries still valid for
            // early-in-batch rows. SYMMETRIC window: a late row must not
            // pair with posting entries farther than retention in the
            // FUTURE either, else out-of-order arrival changes which
            // pairs exist.
            var k = 0
            val m = posting.length
            while (k < m) {
              val oid = posting(k); val ots = posting(k + 1)
              if (oid != id && math.abs(ots - ts.getTime) <= retentionMs)
                out += NearDupPair(math.min(oid, id), math.max(oid, id), ts)
              k += 2
            }
            posting += id; posting += ts.getTime
          }
          // evict AFTER the batch probes, by the batch-max clock.
          val kept = scala.collection.mutable.ArrayBuffer[Long]()
          var k = 0
          while (k < posting.length) {
            if (posting(k + 1) >= clock - retentionMs) {
              kept += posting(k); kept += posting(k + 1)
            }
            k += 2
          }
          if (kept.nonEmpty) {
            state.update(kept.toArray)
            // re-armed every visit; must exceed the current watermark
            state.setTimeoutTimestamp(
              math.max(clock, state.getCurrentWatermarkMs()) + retentionMs)
          } else state.remove()
          out.result().iterator
          }
      }
      .toDF()
      // one pair per colliding band → collapse repeats, bounded state.
      .withWatermark("ts", s"$retentionMs milliseconds")
      .dropDuplicatesWithinWatermark("a", "b")
  }
}
