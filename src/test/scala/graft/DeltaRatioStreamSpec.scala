package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Stats
import graft.streaming.DeltaRatioStream

/** Streaming delta-method ratio SE ≡ batch: one frozen window over the
  * sf0.001 events reproduces the batch `stat_delta_ratio` rows exactly
  * (shared Stats.deltaRatio kernel), under a multi-batch split; and
  * the degenerate identical-user window yields zero SE. */
class DeltaRatioStreamSpec extends SparkSpec {
  import spark.implicits._

  private val winTs = ts("2024-01-01 00:30:00")

  private def xCents =
    when(col("event_type") === "purchase", Stats.cents(col("value")))

  test("one frozen window reproduces the batch stat_delta_ratio rows") {
    val dir = sf()
    val batch = SparkEntry.queries("stat_delta_ratio")(spark, dir)
      .collect().map(r => r.getAs[Long]("variant") ->
        ((r.getAs[Long]("n_users"), r.getAs[Double]("r"),
          r.getAs[Double]("se_delta")))).toMap

    val rows = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_type"),
        col("value").cast("decimal(18,2)"))
      .as[(Long, String, java.math.BigDecimal)].collect().toSeq

    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String, java.math.BigDecimal)]
    val q = DeltaRatioStream.windowedSe(
        in.toDF().toDF("t", "user_id", "event_type", "value"),
        "t", "user_id", xCents, delay = "0 seconds")
      .writeStream.format("memory").queryName("delta_ratio_out")
      .outputMode("append").start()
    try {
      rows.map(r => (winTs, r._1, r._2, r._3)).grouped(4096)
        .foreach(b => in.addData(b: _*))
      q.processAllAvailable()
      in.addData((ts("2024-01-01 02:00:00"), 0L, "flush",
        new java.math.BigDecimal("0.00")))
      q.processAllAvailable()
      val got = spark.table("delta_ratio_out")
        .where(col("bucket") === ts("2024-01-01 00:00:00"))
        .collect().map(r => r.getAs[Long]("variant") ->
          ((r.getAs[Long]("n_users"), r.getAs[Double]("r"),
            r.getAs[Double]("se_delta")))).toMap
      assert(got === batch, "stream window diverged from the batch kernel")
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS delta_ratio_out")
    }
  }

  test("identical users in a window: SE exactly zero, ratio exact") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String, java.math.BigDecimal)]
    val q = DeltaRatioStream.windowedSe(
        in.toDF().toDF("t", "user_id", "event_type", "value"),
        "t", "user_id", xCents, delay = "0 seconds")
      .writeStream.format("memory").queryName("delta_ratio_deg")
      .outputMode("append").start()
    try {
      // every user: one 10.00 purchase + one view -> R = 500 cents/event
      val rows = (1L to 10L).flatMap(u => Seq(
        (winTs, u, "purchase", new java.math.BigDecimal("10.00")),
        (winTs, u, "view", new java.math.BigDecimal("0.00"))))
      in.addData(rows: _*)
      q.processAllAvailable()
      in.addData((ts("2024-01-01 02:00:00"), 0L, "flush",
        new java.math.BigDecimal("0.00")))
      q.processAllAvailable()
      val got = spark.table("delta_ratio_deg")
        .where(col("bucket") === ts("2024-01-01 00:00:00"))
        .collect()
      assert(got.length === 2)
      got.foreach { r =>
        assert(r.getAs[Double]("r") === 5.0) // 500 cents / 100
        assert(r.getAs[Double]("se_delta") === 0.0)
      }
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS delta_ratio_deg")
    }
  }
}
