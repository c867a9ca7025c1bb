package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.TimeSeries
import graft.streaming.HoltWintersStream

/** Streaming Holt–Winters equals the batch triple-smoothing fold for any
  * in-watermark arrival order — the guarantee the batch op's ONLINE
  * initialization exists to make possible. Uses a 4-slot season so the
  * rotating seasonal window cycles several times within a small spec. */
class HoltWintersStreamSpec extends SparkSpec {
  import spark.implicits._

  test("stream ≡ batch: level/trend/seasonal/forecast across seasons and gaps") {
    // 12 hours of a period-4 pattern with one silent hour (7) — the
    // gap folds as 0 on both sides; counts per hour:
    val counts = Seq(2, 4, 1, 3, 2, 4, 1, 0, 2, 4, 1, 3)
    val rows: Seq[(String, Timestamp)] = counts.zipWithIndex.flatMap {
      case (c, h) => (0 until c).map(i => ("a", ts(f"2024-01-01 $h%02d:00:${10 + i}%02d")))
    }

    val batch = TimeSeries.holtWinters(
        rows.toDF("k", "t")
          .select(col("k"), col("t").cast("timestamp_ntz").as("t"))
          .withColumn("value", lit(1.0)),
        "k", "t", alpha = 0.3, beta = 0.1, gamma = 0.3, m = 4)
      .withColumn("bh",
        (unix_timestamp(col("bucket").cast("timestamp")) / 3600L).cast("long"))
      .collect().map { r =>
        r.getAs[Long]("bh") -> ((r.getAs[Long]("n"), r.getAs[Double]("level"),
          r.getAs[Double]("trend"), r.getAs[Double]("seasonal"),
          r.getAs[Double]("forecast_next")))
      }.toMap

    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val df = in.toDF().toDF("k", "ts").withWatermark("ts", "10 minutes")
    val q = HoltWintersStream.hourlyCounts(df, "k", "ts",
        alpha = 0.3, beta = 0.1, gamma = 0.3, m = 4,
        idleMs = 2 * 3600 * 1000L)
      .writeStream.format("memory").queryName("hw_out")
      .outputMode("append").start()
    try {
      // feed in three chronological chunks with one in-watermark
      // reorder inside each; then an idle-timeout flush event
      rows.grouped(9).foreach { chunk =>
        in.addData(chunk.reverse: _*); q.processAllAvailable()
      }
      in.addData(("zz_flush", ts("2024-01-02 12:00:00")))
      q.processAllAvailable()

      val got = spark.table("hw_out").where(col("key") === "a")
        .collect().map { r =>
          (r.getAs[Timestamp]("bucket").getTime / 3600000L) ->
            ((r.getAs[Long]("n"), r.getAs[Double]("level"),
              r.getAs[Double]("trend"), r.getAs[Double]("seasonal"),
              r.getAs[Double]("forecast_next")))
        }.toMap
      assert(got === batch,
        s"stream/batch diff: ${(got.toSet diff batch.toSet)} | ${(batch.toSet diff got.toSet)}")
      // the seasonal component actually cycles: the high slot's later
      // seasons carry a positive seasonal estimate
      assert(got.values.exists(_._4 > 0.0))
    } finally q.stop()
  }
}
