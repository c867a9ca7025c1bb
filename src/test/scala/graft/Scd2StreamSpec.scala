package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Scd2Stream

/** Streaming SCD2 equals the batch interval build for any in-watermark
  * arrival order, closed intervals stream out as changes fold, and the
  * idle timeout flushes the open interval. */
class Scd2StreamSpec extends SparkSpec {
  import spark.implicits._

  test("stream ≡ batch: reordered arrivals, repeats folded, idle flush") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, String)]
    val df = in.toDF().toDF("key", "ts", "seq", "attr")
      .withWatermark("ts", "10 minutes")
    val q = Scd2Stream.intervals(df, "key", "ts", "seq", "attr",
        idleMs = 30 * 60 * 1000L)
      .writeStream.format("memory").queryName("scd2_out")
      .outputMode("append").start()
    try {
      // batch 1: u1 bronze (repeat included), u2 gold; u1's silver-change
      // event arrives FIRST even though its event time is later.
      in.addData(
        (1L, ts("2024-01-01 00:02:00"), 12L, "silver"),
        (1L, ts("2024-01-01 00:00:00"), 10L, "bronze"),
        (2L, ts("2024-01-01 00:05:00"), 14L, "gold"))
      q.processAllAvailable()
      // batch 2: u1 repeats bronze (folds silently) then returns to
      // bronze after silver; late-but-in-watermark arrival order.
      in.addData(
        (1L, ts("2024-01-01 00:03:00"), 13L, "bronze"),
        (1L, ts("2024-01-01 00:01:00"), 11L, "bronze"))
      q.processAllAvailable()
      // watermark driver: push event time far past every idle horizon so
      // all keys time out and flush their open intervals.
      in.addData((99L, ts("2024-01-01 12:00:00"), 99L, "z"))
      q.processAllAvailable()
      in.addData((99L, ts("2024-01-02 12:00:00"), 100L, "z"))
      q.processAllAvailable()

      val got = spark.table("scd2_out")
        .where(col("key") < 99L)
        .as[(Long, String, Timestamp, Option[Timestamp])].collect().toSet

      // the batch operator over the same (key<99) events
      val ev = Seq(
        (1L, ts("2024-01-01 00:00:00"), 10L, "bronze"),
        (1L, ts("2024-01-01 00:01:00"), 11L, "bronze"),
        (1L, ts("2024-01-01 00:02:00"), 12L, "silver"),
        (1L, ts("2024-01-01 00:03:00"), 13L, "bronze"),
        (2L, ts("2024-01-01 00:05:00"), 14L, "gold")
      ).toDF("key", "ts", "seq", "attr")
      val batch = graft.ops.Relational.scd2(ev, Seq("key"), "ts",
          Seq("attr"), Seq(col("ts"), col("seq")))
        .select(col("key"), col("attr"), col("valid_from"), col("valid_to"))
        .as[(Long, String, Timestamp, Option[Timestamp])].collect().toSet
      assert(got === batch)
      assert(got === Set(
        (1L, "bronze", ts("2024-01-01 00:00:00"), Some(ts("2024-01-01 00:02:00"))),
        (1L, "silver", ts("2024-01-01 00:02:00"), Some(ts("2024-01-01 00:03:00"))),
        (1L, "bronze", ts("2024-01-01 00:03:00"), None),
        (2L, "gold", ts("2024-01-01 00:05:00"), None)))
    } finally q.stop()
  }

  test("closed intervals emit as soon as the watermark folds the change") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, String)]
    val df = in.toDF().toDF("key", "ts", "seq", "attr")
      .withWatermark("ts", "1 minute")
    val q = Scd2Stream.intervals(df, "key", "ts", "seq", "attr",
        idleMs = 24 * 3600 * 1000L)
      .writeStream.format("memory").queryName("scd2_live")
      .outputMode("append").start()
    try {
      in.addData(
        (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
        (1L, ts("2024-01-01 00:10:00"), 2L, "b"))
      q.processAllAvailable()
      // trigger 2 sees watermark 00:09 (from batch 1): only 'a' folds —
      // the a→b change at 00:10 is still beyond it, nothing emits.
      in.addData((1L, ts("2024-01-01 00:20:00"), 3L, "c"))
      q.processAllAvailable()
      assert(spark.table("scd2_live").count() === 0)
      // trigger 3 sees watermark 00:19 ≥ 00:10: 'b' folds, the
      // a-interval closes and emits NOW — c and d still pend open.
      in.addData((1L, ts("2024-01-01 00:30:00"), 4L, "d"))
      q.processAllAvailable()
      val mid = spark.table("scd2_live")
        .as[(Long, String, Timestamp, Option[Timestamp])].collect().toSet
      assert(mid === Set(
        (1L, "a", ts("2024-01-01 00:00:00"), Some(ts("2024-01-01 00:10:00")))))
    } finally q.stop()
  }
}
