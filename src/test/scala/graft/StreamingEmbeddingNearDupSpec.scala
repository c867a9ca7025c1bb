package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingEmbeddingNearDup

case class StreamVec(vec_id: Long, embedding: Array[Double], ts: Timestamp)

/** Streaming embedding near-dup: cross-batch semantic collisions,
  * cosine-verified pairs only, retention-bounded state. */
class StreamingEmbeddingNearDupSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64
  private def vec(seed: Int): Array[Double] =
    Array.tabulate(dim)(j => math.sin(seed * 31.7 + j * 1.3))
  private def jitter(v: Array[Double], eps: Double): Array[Double] =
    v.zipWithIndex.map { case (x, j) => x + eps * math.cos(j) }

  test("near-identical vector arriving later pairs with the earlier one, verified") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[StreamVec]
    val pairs = StreamingEmbeddingNearDup.pairs(
      in.toDF().withWatermark("ts", "0 seconds"),
      "vec_id", "embedding", "ts",
      retentionMs = 3600 * 1000L, threshold = 0.95, nBits = 6, dim = dim)
    val q = pairs.writeStream.format("memory").queryName("send_out")
      .outputMode("append").start()
    try {
      in.addData(
        StreamVec(1L, vec(1), ts("2024-01-01 00:00:10")),
        StreamVec(2L, vec(9), ts("2024-01-01 00:00:11"))) // unrelated
      q.processAllAvailable()
      in.addData(StreamVec(3L, jitter(vec(1), 1e-4), ts("2024-01-01 00:01:00")))
      q.processAllAvailable()

      val got = spark.table("send_out")
        .select("a", "b", "sim").as[(Long, Long, Double)].collect()
      assert(got.exists(p => p._1 == 1L && p._2 == 3L && p._3 > 0.99),
        s"missed the cross-batch semantic dup: ${got.toSeq}")
      assert(!got.exists(p => p._1 == 2L || p._2 == 2L),
        s"unrelated vector paired: ${got.toSeq}")
    } finally q.stop()
  }

  test("retention: vectors older than the window no longer match") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[StreamVec]
    val pairs = StreamingEmbeddingNearDup.pairs(
      in.toDF().withWatermark("ts", "0 seconds"),
      "vec_id", "embedding", "ts",
      retentionMs = 60 * 1000L, threshold = 0.95, nBits = 6, dim = dim)
    val q = pairs.writeStream.format("memory").queryName("send_ret")
      .outputMode("append").start()
    try {
      in.addData(StreamVec(1L, vec(4), ts("2024-01-01 00:00:10")))
      q.processAllAvailable()
      // stream advances far past retention, THEN the near-dup arrives —
      // the bucket visit evicts the stale entry before probing.
      in.addData(StreamVec(2L, jitter(vec(4), 1e-4), ts("2024-01-01 01:00:00")))
      q.processAllAvailable()
      val got = spark.table("send_ret").select("a", "b")
        .as[(Long, Long)].collect().toSet
      assert(got.isEmpty, s"expired entry still matched: $got")

      // but a fresh dup inside the window still pairs.
      in.addData(StreamVec(3L, jitter(vec(4), 2e-4), ts("2024-01-01 01:00:30")))
      q.processAllAvailable()
      val got2 = spark.table("send_ret").select("a", "b")
        .as[(Long, Long)].collect().toSet
      assert(got2 === Set((2L, 3L)), s"in-window dup must pair: $got2")
    } finally q.stop()
  }

  test("same-batch rows farther apart than retention do not pair") {
    // retention is per PAIR against the probing row's event time — a
    // catch-up batch delivering a stale row and a fresh near-dup
    // together must not pair them just because they share a micro-batch.
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[StreamVec]
    val pairs = StreamingEmbeddingNearDup.pairs(
      in.toDF().withWatermark("ts", "0 seconds"),
      "vec_id", "embedding", "ts",
      retentionMs = 60 * 1000L, threshold = 0.95, nBits = 6, dim = dim)
    val q = pairs.writeStream.format("memory").queryName("send_batch")
      .outputMode("append").start()
    try {
      in.addData(
        StreamVec(1L, vec(6), ts("2024-01-01 00:00:00")),
        StreamVec(2L, jitter(vec(6), 1e-4), ts("2024-01-01 02:00:00")), // 2h later
        StreamVec(3L, jitter(vec(6), 2e-4), ts("2024-01-01 02:00:30"))) // in-window of 2
      q.processAllAvailable()
      val got = spark.table("send_batch").select("a", "b")
        .as[(Long, Long)].collect().toSet
      assert(got === Set((2L, 3L)),
        s"only the in-window pair may surface: $got")
    } finally q.stop()
  }

  test("late vector does not pair with posting entries beyond retention in the FUTURE") {
    // regression: symmetric retention. A late row probing with its own
    // (old) event time must not match posting entries written hours
    // ahead of it.
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[StreamVec]
    val pairs = StreamingEmbeddingNearDup.pairs(
      in.toDF().withWatermark("ts", "6 hours"), // generous lateness so the late row reaches the operator
      "vec_id", "embedding", "ts",
      retentionMs = 60 * 1000L, threshold = 0.95, nBits = 6, dim = dim)
    val q = pairs.writeStream.format("memory").queryName("send_late")
      .outputMode("append").start()
    try {
      in.addData(StreamVec(1L, vec(7), ts("2024-01-01 02:00:00")))
      q.processAllAvailable()
      in.addData(StreamVec(2L, jitter(vec(7), 1e-4), ts("2024-01-01 00:00:20"))) // 2h late
      q.processAllAvailable()
      in.addData(StreamVec(3L, jitter(vec(7), 2e-4), ts("2024-01-01 01:59:30"))) // in-window late
      q.processAllAvailable()
      val got = spark.table("send_late").select("a", "b")
        .as[(Long, Long)].collect().toSet
      assert(!got.contains((1L, 2L)),
        s"late vector paired with an entry 2h in its future: $got")
      assert(got.contains((1L, 3L)), s"in-window late pair missed: $got")
    } finally q.stop()
  }

  test("zero-norm vectors never pair (cosine undefined, not NaN-greedy)") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[StreamVec]
    val pairs = StreamingEmbeddingNearDup.pairs(
      in.toDF().withWatermark("ts", "0 seconds"),
      "vec_id", "embedding", "ts",
      retentionMs = 3600 * 1000L, threshold = 0.5, nBits = 6, dim = dim)
    val q = pairs.writeStream.format("memory").queryName("send_zero")
      .outputMode("append").start()
    try {
      in.addData(
        StreamVec(1L, Array.fill(dim)(0.0), ts("2024-01-01 00:00:01")),
        StreamVec(2L, Array.fill(dim)(0.0), ts("2024-01-01 00:00:02")))
      q.processAllAvailable()
      val got = spark.table("send_zero").count()
      assert(got === 0L, "zero-norm vectors must not pair")
    } finally q.stop()
  }
}
