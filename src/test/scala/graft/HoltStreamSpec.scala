package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.HoltStream

/** Streaming Holt equals the batch fold for any in-watermark arrival
  * order (level, trend, AND forecast), and the β = 0 degenerate that
  * EwmaStream delegates to stays covered by EwmaStreamSpec. */
class HoltStreamSpec extends SparkSpec {
  import spark.implicits._

  test("stream ≡ batch: level/trend/forecast match through reordered arrivals") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val df = in.toDF().toDF("k", "ts").withWatermark("ts", "10 minutes")
    val q = HoltStream.hourlyCounts(df, "k", "ts", alpha = 0.3, beta = 0.1,
        idleMs = 2 * 3600 * 1000L)
      .writeStream.format("memory").queryName("holt_out")
      .outputMode("append").start()
    try {
      // a ramps 1,2,3 events over hours 0-2 then goes quiet at hour 4
      // (hour 3 gap folds as 0 — the trend must chase the ramp then
      // decay); one arrival lands out of order inside the watermark.
      in.addData(
        ("a", ts("2024-01-01 00:40:00")),
        ("a", ts("2024-01-01 01:20:00")), ("a", ts("2024-01-01 01:45:00")))
      q.processAllAvailable()
      // out of order but NOT late: wm after the first batch is 01:35
      // (max 01:45 − 10 min), so 01:40 re-orders within the watermark —
      // an earlier timestamp would be dropped pre-operator as late data
      in.addData(("a", ts("2024-01-01 01:40:00")))
      q.processAllAvailable()
      in.addData(
        ("a", ts("2024-01-01 02:10:00")), ("a", ts("2024-01-01 02:20:00")),
        ("a", ts("2024-01-01 02:30:00")),
        ("a", ts("2024-01-01 04:30:00")))
      q.processAllAvailable()
      in.addData(("z", ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      in.addData(("z", ts("2024-01-02 12:00:00")))
      q.processAllAvailable()

      val got = spark.table("holt_out").where(col("key") =!= "z")
        .select(col("key"), col("bucket").cast("timestamp_ntz"),
          col("n"), col("level"), col("trend"), col("forecast_next"))
        .as[(String, java.time.LocalDateTime, Long, Double, Double, Double)]
        .collect().toSet

      val ev = Seq(
        ("a", ts("2024-01-01 00:40:00")),
        ("a", ts("2024-01-01 01:20:00")), ("a", ts("2024-01-01 01:45:00")),
        ("a", ts("2024-01-01 01:40:00")),
        ("a", ts("2024-01-01 02:10:00")), ("a", ts("2024-01-01 02:20:00")),
        ("a", ts("2024-01-01 02:30:00")),
        ("a", ts("2024-01-01 04:30:00"))
      ).toDF("k", "ts").withColumn("value", lit(1.0))
      val batch = graft.ops.TimeSeries.holt(ev, "k", "ts", 0.3, 0.1)
        .select(col("k"), col("bucket"), col("n"), col("level"),
          col("trend"), col("forecast_next"))
        .as[(String, java.time.LocalDateTime, Long, Double, Double, Double)]
        .collect().toSet
      assert(got === batch, s"\nstream=$got\nbatch =$batch")
      assert(got.size == 5) // hours 0..4 incl. the gap at hour 3
      // the ramp made the trend positive by hour 2
      assert(got.exists { case (_, b, _, _, t, _) => b.getHour == 2 && t > 0 })
    } finally q.stop()
  }
}
