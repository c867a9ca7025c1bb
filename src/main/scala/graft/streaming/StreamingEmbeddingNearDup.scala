package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.ops.Similarity

/** Streaming EMBEDDING near-duplicate detection — the semantic-dedup
  * analog of [[StreamingNearDup]] (which is token/minhash-based),
  * completing the dedup matrix: {exact, near} × {batch, stream} ×
  * {text, embedding}. Each arriving vector lands in its SRP-LSH bucket
  * (a row-local plan-literal projection, [[Similarity.srpBucket]]) and
  * probes the vectors previously admitted to that bucket; candidates
  * are VERIFIED with exact cosine before a pair is emitted, so the
  * output is a true near-dup pair stream, not a candidate stream.
  *
  * State per bucket holds (id, vector, event-time) and is truncated by
  * `retention` against the bucket-local event-time clock on every visit
  * plus an event-time timeout for dormant buckets — the same two-sided
  * GC as the minhash variant, so state is O(vectors per retention
  * window / 2^nBits), never O(stream). Single-bucket SRP means a pair
  * can only surface once — no cross-band repeat collapse is needed and
  * the plan has exactly one stateful operator.
  */
object StreamingEmbeddingNearDup {

  /** (posting-list entry) id, vector, event-time millis. */
  private type Entry = (Long, Array[Double], Long)

  final case class EmbNearDupPair(a: Long, b: Long, sim: Double, ts: Timestamp)

  /** @param vecs      streaming frame with (idCol: long, vecCol:
    *                  array&lt;float|double&gt;, tsCol); MUST already
    *                  carry `withWatermark(tsCol, …)`
    * @param retentionMs how long an admitted vector keeps matching */
  def pairs(vecs: DataFrame, idCol: String, vecCol: String, tsCol: String,
            retentionMs: Long, threshold: Double, nBits: Int = 6,
            dim: Int = 64): DataFrame = {
    import vecs.sparkSession.implicits._
    implicit val stateEnc: Encoder[List[Entry]] = Encoders.kryo[List[Entry]]

    val bucketed = vecs
      .select(col(idCol).cast("long").as("id"),
        transform(col(vecCol), _.cast("double")).as("v"), col(tsCol).as("ts"))
      .withColumn("bucket", Similarity.srpBucket(col("v"), nBits, dim))
      .select(col("id"), col("v"), col("ts"), col("bucket"))
      .as[(Long, Array[Double], Timestamp, Long)]

    def cosine(x: Array[Double], y: Array[Double]): Option[Double] = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) {
        dot += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1
      }
      val denom = math.sqrt(nx) * math.sqrt(ny)
      if (denom == 0.0) None else Some(dot / denom) // zero-norm never pairs
    }

    bucketed
      .groupByKey(_._4)
      .flatMapGroupsWithState[List[Entry], EmbNearDupPair](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, rows: Iterator[(Long, Array[Double], Timestamp, Long)],
         state: GroupState[List[Entry]]) =>
          if (state.hasTimedOut) {
            // dormant-bucket GC (visit-time eviction below only runs when
            // the bucket receives another vector).
            state.remove(); Iterator.empty
          } else {
            val batch = rows.toSeq.sortBy(r => (r._3.getTime, r._1))
            // bucket-local clock, same rationale as StreamingNearDup:
            // monotone per bucket, needs no cross-stage watermark plumbing.
            val clock = batch.map(_._3.getTime).max
            var posting = state.getOption.getOrElse(Nil)
            val out = List.newBuilder[EmbNearDupPair]
            batch.foreach { case (id, v, ts, _) =>
              // retention is enforced PER PAIR against the probing row's
              // own event time — not once per batch against the batch
              // max, which would let same-batch rows pair regardless of
              // their event-time distance and evict entries still valid
              // for early-in-batch rows. SYMMETRIC window: a late row
              // must not pair with posting entries farther than
              // retention in the FUTURE either, else out-of-order
              // arrival changes which pairs exist.
              posting.foreach { case (oid, ov, ots) =>
                if (oid != id && math.abs(ots - ts.getTime) <= retentionMs)
                  cosine(v, ov).foreach { s =>
                    if (s >= threshold)
                      out += EmbNearDupPair(math.min(oid, id),
                        math.max(oid, id), s, ts)
                  }
              }
              posting = (id, v, ts.getTime) :: posting
            }
            // evict AFTER the batch probes, by the batch-max clock.
            posting = posting.filter(_._3 >= clock - retentionMs)
            if (posting.nonEmpty) {
              state.update(posting)
              state.setTimeoutTimestamp(
                math.max(clock, state.getCurrentWatermarkMs()) + retentionMs)
            } else state.remove()
            out.result().iterator
          }
      }
      .toDF()
  }
}
