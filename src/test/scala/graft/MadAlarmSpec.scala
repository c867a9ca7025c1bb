package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.TimeSeries
import graft.streaming.MadAlarm

/** The streaming MAD alarm equals the batch rule under the same frozen
  * baseline, buckets emit only after the watermark closes them, and
  * keys without history never alarm. */
class MadAlarmSpec extends SparkSpec {
  import spark.implicits._

  test("stream flags exactly the batch rule's buckets against frozen stats") {
    // History: key a at 2/hour over six quiet hours with one 12-burst →
    // med2 = 4, mad4 = 0 (strict convention; any deviation flags).
    // Key b ramps 1..7 → med2 = 8, mad4 = 8 (nothing under 3 MADs flags
    // unless |2c−8|·2 > 24 ⇔ |c−4| > 6 ⇔ c > 10 or c < −2).
    def rows(k: String, perHour: Seq[Int]) = perHour.zipWithIndex.flatMap {
      case (n, h) => (1 to n).map(i => (k, ts(f"2024-01-01 $h%02d:${i % 60}%02d:00")))
    }
    val history = (rows("a", Seq(2, 2, 2, 2, 2, 12)) ++
      rows("b", Seq(1, 2, 3, 4, 5, 6, 7))).toDF("k", "t")
    val baseline = TimeSeries.madStats(history, "k", "t")
    val stats = baseline.as[(String, Long, Long)].collect()
      .map { case (k, m, d) => k -> ((m, d)) }.toMap
    assert(stats("a") === ((4L, 0L)) && stats("b") === ((8L, 8L)))

    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val live = in.toDF().toDF("k", "t")
    val q = MadAlarm.hourlyAlarms(live, "k", "t", baseline)
      .writeStream.format("memory").queryName("mad_out")
      .outputMode("append").start()
    try {
      // Live day 2: a gets a quiet 2-hour then a 3-burst (ANY deviation
      // flags at mad4=0); b gets 11 (flags: |11−4| = 7 > 6) and 9 (no:
      // 5 ≤ 6); c has no history — never flags however wild.
      def burst(k: String, h: Int, n: Int) = (1 to n).map(i =>
        (k, ts(f"2024-01-02 $h%02d:${i % 60}%02d:00")))
      // hour-0 data alone: the watermark (max − 5 min) stays inside
      // hour 0, so nothing may emit — even b's flagrant 11-burst.
      in.addData(burst("a", 0, 2) ++ burst("b", 0, 11) ++
        burst("c", 0, 40): _*)
      q.processAllAvailable()
      assert(spark.table("mad_out").count() === 0L)
      // hour-1 data closes hour 0; the far driver closes hour 1
      in.addData(burst("a", 1, 3) ++ burst("b", 1, 9): _*)
      q.processAllAvailable()
      in.addData(("z", ts("2024-01-02 12:00:00")))
      q.processAllAvailable()
      val got = spark.table("mad_out")
        .select("key", "bucket", "cnt")
        .as[(String, Timestamp, Long)].collect().toSet
      assert(got === Set(
        ("a", ts("2024-01-02 01:00:00"), 3L),
        ("b", ts("2024-01-02 00:00:00"), 11L)))

      // the batch rule over the same live buckets and baseline agrees
      val liveBatch = (burst("a", 0, 2) ++ burst("a", 1, 3) ++
        burst("b", 0, 11) ++ burst("b", 1, 9) ++ burst("c", 0, 40))
        .toDF("k", "t")
      val batchFlag = liveBatch
        .groupBy(col("k"), date_trunc("hour", col("t")).as("bucket"))
        .agg(count(lit(1)).as("cnt"))
        .join(baseline, "k")
        .where(abs(col("cnt") * 2 - col("med2")) * 2 > col("mad4") * 3)
        .select(col("k"), col("bucket").cast("timestamp").as("bucket"),
          col("cnt"))
        .as[(String, Timestamp, Long)].collect().toSet
      assert(batchFlag === got)
    } finally q.stop()
  }
}
