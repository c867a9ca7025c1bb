package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.ForecastAlarm

/** The streaming seasonal alarm fires exactly where the batch backtest's
  * residual exceeds tolerance, gap hours count as zero, and the first
  * season of a key's life never alerts (no prediction yet). */
class ForecastAlarmSpec extends SparkSpec {
  import spark.implicits._

  test("alerts match the batch residuals; warm-up season never alerts") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val df = in.toDF().toDF("k", "ts").withWatermark("ts", "5 minutes")
    val q = ForecastAlarm.hourlyAlarms(df, "k", "ts", tolerance = 3L,
        idleMs = 2 * 3600 * 1000L, season = 3)
      .writeStream.format("memory").queryName("alarm_out")
      .outputMode("append").start()
    try {
      // key a: hours 0,1,2 have 2 events each (warm-up); hour 3 bursts
      // to 9 (pred = hour 0's 2, err 7 > 3 -> ALERT); hour 4 quiet with
      // 2 (pred = 2, err 0); hour 5 is a GAP (x=0, pred = 2, err 2 <= 3
      // -> no alert); hour 6 has 2 (pred = hour 3's 9, err 7 -> ALERT).
      def burst(h: Int, n: Int) = (1 to n).map(i =>
        ("a", ts(f"2024-01-01 0$h%d:${10 + i}%02d:00")))
      in.addData(burst(0, 2) ++ burst(1, 2) ++ burst(2, 2): _*)
      q.processAllAvailable()
      in.addData(burst(3, 9) ++ burst(4, 2): _*)
      q.processAllAvailable()
      in.addData(burst(6, 2): _*)
      q.processAllAvailable()
      // watermark/timeout driver on another key
      in.addData(("z", ts("2024-01-01 15:00:00")))
      q.processAllAvailable()
      in.addData(("z", ts("2024-01-02 15:00:00")))
      q.processAllAvailable()

      val got = spark.table("alarm_out").where(col("key") === "a")
        .select("bucket", "n", "pred", "abs_err")
        .as[(Timestamp, Long, Long, Long)].collect().toSet
      assert(got === Set(
        (ts("2024-01-01 03:00:00"), 9L, 2L, 7L),
        (ts("2024-01-01 06:00:00"), 2L, 9L, 7L)))
    } finally q.stop()
  }
}
