package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Funnel

/** Streaming ordered funnel: latched first-occurrence times equal the
  * batch min-aggregation semantics, including for events that arrive in
  * a different micro-batch ORDER than their event times. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val stepTypes = Seq("view", "click", "purchase")

  test("streaming advances match batch funnel semantics, incl. reordered arrival") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    // generous watermark: u4's 12:00 event would otherwise mark the
    // earlier-timestamped batches late and drop them before the operator
    val df = in.toDF().toDF("user_id", "event_type", "ts")
      .withWatermark("ts", "24 hours")
    val q = Funnel.steps(df, "user_id", "event_type", "ts", stepTypes,
      idleMs = 48 * 3600 * 1000L)
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    try {
      // batch 1: u1 starts; u2 clicks BEFORE any view (must not latch);
      // u3's click arrives one batch before its (event-time earlier) view.
      in.addData(
        (1L, "view", ts("2024-01-01 10:00:00")),
        (2L, "click", ts("2024-01-01 09:00:00")),
        (3L, "click", ts("2024-01-01 11:05:00")),
        (4L, "purchase", ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      // batch 2: u1 advances; u2 view then a later click; u3's view
      // arrives late-but-in-watermark → cascade latches the parked click.
      in.addData(
        (1L, "click", ts("2024-01-01 10:05:00")),
        (2L, "view", ts("2024-01-01 09:30:00")),
        (2L, "click", ts("2024-01-01 09:45:00")),
        (3L, "view", ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      // batch 3: u1 completes.
      in.addData((1L, "purchase", ts("2024-01-01 10:10:00")))
      q.processAllAvailable()

      val got = spark.table("funnel_out")
        .as[(Long, Int, Timestamp)].collect().toSet
      val expected = Set(
        (1L, 1, ts("2024-01-01 10:00:00")),
        (1L, 2, ts("2024-01-01 10:05:00")),
        (1L, 3, ts("2024-01-01 10:10:00")),
        (2L, 1, ts("2024-01-01 09:30:00")),
        (2L, 2, ts("2024-01-01 09:45:00")), // 09:00 click pruned: before t1
        (3L, 1, ts("2024-01-01 11:00:00")),
        (3L, 2, ts("2024-01-01 11:05:00"))) // parked click released by cascade
      assert(got === expected)
      // u4 never viewed → never enters the funnel
      assert(!got.exists(_._1 == 4L))

      // equivalence: max streamed step per user == the batch query's steps
      val batchSteps = {
        val ev = Seq(
          (1L, "view", ts("2024-01-01 10:00:00")),
          (2L, "click", ts("2024-01-01 09:00:00")),
          (3L, "click", ts("2024-01-01 11:05:00")),
          (4L, "purchase", ts("2024-01-01 12:00:00")),
          (1L, "click", ts("2024-01-01 10:05:00")),
          (2L, "view", ts("2024-01-01 09:30:00")),
          (2L, "click", ts("2024-01-01 09:45:00")),
          (3L, "view", ts("2024-01-01 11:00:00")),
          (1L, "purchase", ts("2024-01-01 10:10:00"))
        ).toDF("user_id", "event_type", "ts")
        val v = ev.where(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
        val c = ev.where(col("event_type") === "click")
          .join(v, "user_id").where(col("ts") > col("t1"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
        val p = ev.where(col("event_type") === "purchase")
          .join(c, "user_id").where(col("ts") > col("t2"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
        v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
          .select(col("user_id"),
            (lit(1) + when(col("t2").isNotNull, 1).otherwise(0)
              + when(col("t3").isNotNull, 1).otherwise(0)).as("steps"))
          .as[(Long, Int)].collect().toMap
      }
      val streamedMax = got.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      assert(streamedMax === batchSteps)
    } finally q.stop()
  }

  test("idle users expire from state via event-time timeout") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    val df = in.toDF().toDF("user_id", "event_type", "ts")
      .withWatermark("ts", "0 seconds")
    val q = Funnel.steps(df, "user_id", "event_type", "ts", stepTypes,
      idleMs = 60 * 1000L) // 1 minute idle horizon
      .writeStream.format("memory").queryName("funnel_gc")
      .outputMode("append").start()
    try {
      in.addData((1L, "view", ts("2024-01-01 00:00:00")))
      q.processAllAvailable()
      // push the watermark far past user 1's idle horizon
      in.addData((2L, "view", ts("2024-01-01 06:00:00")))
      q.processAllAvailable()
      in.addData((3L, "view", ts("2024-01-01 12:00:00")))
      q.processAllAvailable()

      val totals = q.recentProgress.toSeq
        .flatMap(_.stateOperators.toSeq)
        .filter(_.operatorName.contains("flatMapGroupsWithState"))
        .map(_.numRowsTotal)
      assert(totals.nonEmpty)
      assert(totals.last < 3, s"expired users must leave state: $totals")

      // an expired user who returns re-enters the funnel from scratch
      in.addData((1L, "click", ts("2024-01-01 12:00:30")))
      q.processAllAvailable()
      val got = spark.table("funnel_gc").as[(Long, Int, Timestamp)].collect()
      assert(!got.exists(r => r._1 == 1L && r._2 == 2),
        s"stale state must not survive expiry: ${got.toSeq}")
    } finally q.stop()
  }
}
