package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EwmaStream

/** Streaming EWMA equals the batch fold for any in-watermark arrival
  * order, gap hours count as zero, and nothing emits before its bucket
  * closes under the watermark. */
class EwmaStreamSpec extends SparkSpec {
  import spark.implicits._

  test("stream ≡ batch: reordered arrivals, gap hours, idle flush") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val df = in.toDF().toDF("k", "ts").withWatermark("ts", "10 minutes")
    val q = EwmaStream.hourlyCounts(df, "k", "ts", alpha = 0.3,
        idleMs = 2 * 3600 * 1000L)
      .writeStream.format("memory").queryName("ewma_out")
      .outputMode("append").start()
    try {
      // hour 00: 2 events for a (one arriving out of order in a later
      // batch, inside the 10-min watermark), 1 for b; hour 01: 1 for a;
      // hour 03: 1 for a (hour 02 is a gap that must fold as x=0).
      in.addData(
        ("a", ts("2024-01-01 00:40:00")),
        ("b", ts("2024-01-01 00:10:00")))
      q.processAllAvailable() // wm -> 00:30
      in.addData(
        ("a", ts("2024-01-01 00:35:00"))) // out of order, in watermark
      q.processAllAvailable()
      in.addData(
        ("a", ts("2024-01-01 01:20:00")),
        ("a", ts("2024-01-01 03:30:00")))
      q.processAllAvailable()
      // watermark driver on a separate key: push far past idle horizons
      in.addData(("z", ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      in.addData(("z", ts("2024-01-02 12:00:00")))
      q.processAllAvailable()

      val got = spark.table("ewma_out").where(col("key") =!= "z")
        .select(col("key"), col("bucket").cast("timestamp_ntz"),
          col("n"), col("ewma"))
        .as[(String, java.time.LocalDateTime, Long, Double)]
        .collect().toSet

      val ev = Seq(
        ("a", ts("2024-01-01 00:40:00")), ("a", ts("2024-01-01 00:35:00")),
        ("a", ts("2024-01-01 01:20:00")), ("a", ts("2024-01-01 03:30:00")),
        ("b", ts("2024-01-01 00:10:00"))
      ).toDF("k", "ts").withColumn("value", lit(1.0))
      val batch = graft.ops.TimeSeries.ewma(ev, "k", "ts", 0.3)
        .select(col("k"), col("bucket"), col("n"), col("ewma"))
        .as[(String, java.time.LocalDateTime, Long, Double)]
        .collect().toSet
      assert(got === batch, s"\nstream=$got\nbatch =$batch")
      assert(got.size == 5) // a: hours 0..3 (incl. the x=0 gap), b: hour 0
      assert(got.exists { case (k, b, n, _) => k == "a" && n == 0L }) // gap row
    } finally q.stop()
  }

  test("alpha=1 degenerates to a streaming gap-filled resample (ewma ≡ n)") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val df = in.toDF().toDF("k", "ts").withWatermark("ts", "1 minute")
    val q = EwmaStream.hourlyCounts(df, "k", "ts", alpha = 1.0,
        idleMs = 3600 * 1000L)
      .writeStream.format("memory").queryName("ewma_id")
      .outputMode("append").start()
    try {
      in.addData(("a", ts("2024-01-01 00:10:00")),
        ("a", ts("2024-01-01 00:20:00")), ("a", ts("2024-01-01 02:30:00")))
      q.processAllAvailable()
      in.addData(("z", ts("2024-01-01 09:00:00")))
      q.processAllAvailable()
      in.addData(("z", ts("2024-01-01 23:00:00")))
      q.processAllAvailable()
      val rows = spark.table("ewma_id").where(col("key") === "a")
        .select("n", "ewma").as[(Long, Double)].collect()
      assert(rows.nonEmpty)
      rows.foreach { case (n, e) => assert(e == n.toDouble) }
    } finally q.stop()
  }

  test("a bucket emits only after the watermark passes its end") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val df = in.toDF().toDF("k", "ts").withWatermark("ts", "5 minutes")
    val q = EwmaStream.hourlyCounts(df, "k", "ts", alpha = 0.5,
        idleMs = 24 * 3600 * 1000L)
      .writeStream.format("memory").queryName("ewma_live")
      .outputMode("append").start()
    try {
      in.addData(("a", ts("2024-01-01 00:30:00")))
      q.processAllAvailable()
      assert(spark.table("ewma_live").count() == 0) // hour 0 still open
      // 01:04 keeps wm (00:59) below hour 0's end; nothing folds
      in.addData(("a", ts("2024-01-01 01:04:00")))
      q.processAllAvailable()
      assert(spark.table("ewma_live").count() == 0)
      // 01:06 pushes wm to 01:01 AFTER this batch; the fold needs the
      // next invocation for the key (fMGWS sees the prior watermark)
      in.addData(("a", ts("2024-01-01 01:06:00")))
      q.processAllAvailable()
      assert(spark.table("ewma_live").count() == 0)
      in.addData(("a", ts("2024-01-01 01:30:00")))
      q.processAllAvailable()
      val rows = spark.table("ewma_live")
        .as[(String, Timestamp, Long, Double)].collect()
      assert(rows.toSeq == Seq(("a", ts("2024-01-01 00:00:00"), 1L, 1.0)))
    } finally q.stop()
  }
}
