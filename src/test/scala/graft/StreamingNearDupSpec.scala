package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingNearDup

case class StreamDoc(doc_id: Long, text: String, ts: Timestamp)

/** Streaming MinHash-LSH near-dup detection: collisions across
  * micro-batches, no self/cross-noise, retention-bounded state. */
class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  private val base = (1 to 40).map(i => s"token$i").mkString(" ")
  private val nearDup = base.replace("token7", "tokenX")
  private val other = (100 to 140).map(i => s"other$i").mkString(" ")

  test("near-dup arriving in a later batch collides with the earlier doc") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[StreamDoc]
    val pairs = StreamingNearDup.pairs(
      in.toDF().withWatermark("ts", "0 seconds"),
      "doc_id", "text", "ts", retentionMs = 3600 * 1000L)
    val q = pairs.writeStream.format("memory").queryName("snd_out")
      .outputMode("append").start()
    try {
      in.addData(
        StreamDoc(1L, base, ts("2024-01-01 00:00:10")),
        StreamDoc(2L, other, ts("2024-01-01 00:00:11")))
      q.processAllAvailable()
      in.addData(StreamDoc(3L, nearDup, ts("2024-01-01 00:01:00")))
      q.processAllAvailable()
      // advance watermarks; genuinely unrelated text (a near-dup of doc 2
      // here would rightly pair with it).
      in.addData(StreamDoc(4L, (200 to 240).map(i => s"late$i").mkString(" "),
        ts("2024-01-01 02:30:00")))
      q.processAllAvailable()
      in.addData(StreamDoc(5L, "unrelated words entirely here now", ts("2024-01-01 05:00:00")))
      q.processAllAvailable()

      val got = spark.table("snd_out").select("a", "b")
        .as[(Long, Long)].collect().toSet
      assert(got.contains((1L, 3L)), s"missed the cross-batch near-dup: $got")
      assert(!got.exists(p => p._1 == 2L || p._2 == 2L), s"false positive: $got")
    } finally q.stop()
  }

  test("retention: state older than the window no longer matches") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[StreamDoc]
    val pairs = StreamingNearDup.pairs(
      in.toDF().withWatermark("ts", "0 seconds"),
      "doc_id", "text", "ts", retentionMs = 60 * 1000L) // 1 minute
    val q = pairs.writeStream.format("memory").queryName("snd_ret")
      .outputMode("append").start()
    try {
      in.addData(StreamDoc(1L, base, ts("2024-01-01 00:00:10")))
      q.processAllAvailable()
      // advance the watermark far past retention before the dup arrives.
      in.addData(StreamDoc(2L, other, ts("2024-01-01 01:00:00")))
      q.processAllAvailable()
      in.addData(StreamDoc(3L, nearDup, ts("2024-01-01 01:00:30")))
      q.processAllAvailable()
      in.addData(StreamDoc(4L, (300 to 340).map(i => s"tail$i").mkString(" "),
        ts("2024-01-01 03:00:00")))
      q.processAllAvailable()

      val got = spark.table("snd_ret").select("a", "b")
        .as[(Long, Long)].collect().toSet
      assert(!got.contains((1L, 3L)),
        s"doc 1 should have aged out of the dedup window: $got")
    } finally q.stop()
  }

  test("same-batch docs farther apart than retention do not pair") {
    // retention is per PAIR against the probing row's event time, not
    // once per batch against the batch max.
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[StreamDoc]
    val pairs = StreamingNearDup.pairs(
      in.toDF().withWatermark("ts", "0 seconds"),
      "doc_id", "text", "ts", retentionMs = 60 * 1000L) // 1 minute
    val q = pairs.writeStream.format("memory").queryName("snd_batch")
      .outputMode("append").start()
    try {
      in.addData(
        StreamDoc(1L, base, ts("2024-01-01 00:00:00")),
        StreamDoc(2L, nearDup, ts("2024-01-01 02:00:00")), // 2h later, same batch
        StreamDoc(3L, base, ts("2024-01-01 02:00:30")))    // in-window of 2
      q.processAllAvailable()
      val got = spark.table("snd_batch").select("a", "b")
        .as[(Long, Long)].collect().toSet
      assert(got === Set((2L, 3L)), s"only the in-window pair may surface: $got")
    } finally q.stop()
  }

  test("dormant buckets GC once the pair watermark advances (state shrinks)") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[StreamDoc]
    val pairs = StreamingNearDup.pairs(
      in.toDF().withWatermark("ts", "0 seconds"),
      "doc_id", "text", "ts", retentionMs = 60 * 60 * 1000L) // 1 hour
    val q = pairs.writeStream.format("memory").queryName("snd_gc")
      .outputMode("append").start()
    try {
      def epoch(n: Int) = (1 to 40).map(i => s"ep${n}tok$i").mkString(" ")
      def near(s: String) = s.replace("tok7", "tokX")
      // each epoch emits a pair, so the downstream pair-dedup watermark
      // keeps advancing and dormant epoch-1 buckets pass their timeout.
      in.addData(StreamDoc(1L, epoch(1), ts("2024-01-01 00:00:10")),
        StreamDoc(2L, near(epoch(1)), ts("2024-01-01 00:00:11")))
      q.processAllAvailable()
      in.addData(StreamDoc(3L, epoch(2), ts("2024-01-01 10:00:00")),
        StreamDoc(4L, near(epoch(2)), ts("2024-01-01 10:00:01")))
      q.processAllAvailable()
      in.addData(StreamDoc(5L, epoch(3), ts("2024-01-01 20:00:00")),
        StreamDoc(6L, near(epoch(3)), ts("2024-01-01 20:00:01")))
      q.processAllAvailable()
      in.addData(StreamDoc(7L, "lone straggler doc here", ts("2024-01-02 06:00:00")))
      q.processAllAvailable()

      val totals = q.recentProgress.toSeq
        .flatMap(_.stateOperators.toSeq)
        .filter(_.operatorName.contains("flatMapGroupsWithState"))
        .map(_.numRowsTotal)
      assert(totals.nonEmpty)
      assert(totals.last < totals.max,
        s"dormant bucket state never shrank: $totals")
    } finally q.stop()
  }

  test("late row does not pair with posting entries beyond retention in the FUTURE") {
    // regression: retention must be symmetric. A late-arriving row probes
    // with its own (old) event time; posting entries written hours AHEAD
    // of it are outside the dedup window just as entries hours behind are.
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[StreamDoc]
    val pairs = StreamingNearDup.pairs(
      in.toDF().withWatermark("ts", "6 hours"), // generous lateness so the late row reaches the operator
      "doc_id", "text", "ts", retentionMs = 60 * 1000L) // 1 minute
    val q = pairs.writeStream.format("memory").queryName("snd_late")
      .outputMode("append").start()
    try {
      in.addData(StreamDoc(1L, base, ts("2024-01-01 02:00:00")))
      q.processAllAvailable()
      // a LATE near-dup ~2h BEHIND the posting entry: must NOT pair.
      in.addData(StreamDoc(2L, nearDup, ts("2024-01-01 00:00:20")))
      q.processAllAvailable()
      // a late row within retention of the posting entry still pairs.
      in.addData(StreamDoc(3L, nearDup, ts("2024-01-01 01:59:30")))
      q.processAllAvailable()

      val got = spark.table("snd_late").select("a", "b")
        .as[(Long, Long)].collect().toSet
      assert(!got.contains((1L, 2L)),
        s"late row paired with a posting entry ${"2h"} in its future: $got")
      assert(got.contains((1L, 3L)), s"in-window late pair missed: $got")
    } finally q.stop()
  }

  test("batch analog agrees: streaming pairs ⊆ batch candidate pairs") {
    val docs = Seq((1L, base), (2L, other), (3L, nearDup))
      .toDF("doc_id", "text")
    val batchPairs = graft.ops.Dedup
      .minhashLshPairs(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(batchPairs.contains((1L, 3L)))
  }
}
