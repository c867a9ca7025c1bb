package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.TimeSeries
import graft.streaming.CusumStream

/** Streaming CUSUM ≡ batch CUSUM: with the envelope frozen from the same
  * series, the streamed trajectory replays the batch statistic bucket for
  * bucket — under any batch split, and across silent-hour gaps (which
  * never emit a window; the state fold applies their drift arithmetically
  * on the next arrival). */
class CusumStreamSpec extends SparkSpec {
  import spark.implicits._

  // key a: calm then a strong shift; key b: single spike then a 3-hour
  // gap — exercises the gap arithmetic and the per-key isolation.
  private val counts: Map[String, Seq[Int]] = Map(
    "a" -> Seq(2, 1, 3, 2, 2, 1, 2, 3, 1, 2, 2, 3, 20, 21, 20, 22, 21, 20),
    "b" -> Seq(4, 0, 0, 0, 5, 1, 2))

  private val events: Seq[(String, Timestamp)] = counts.toSeq.flatMap {
    case (k, cs) => cs.zipWithIndex.flatMap { case (c, h) =>
      (0 until c).map(i => (k, ts(f"2024-01-01 $h%02d:00:${i % 60}%02d")))
    }
  }

  private def batchTrajectory: Map[(String, Long), (Long, Long, Boolean)] =
    TimeSeries.cusum(events.toDF("k", "t")
        .select(col("k"), col("t").cast("timestamp_ntz").as("t"))
        .withColumn("value", lit(1.0)), "k", "t")
      .withColumn("bh",
        (unix_timestamp(col("bucket").cast("timestamp")) / 3600L).cast("long"))
      .collect().map { r =>
        (r.getAs[String]("k"), r.getAs[Long]("bh")) ->
          ((r.getAs[Long]("n"), r.getAs[Long]("cusum_scaled"),
            r.getAs[Boolean]("alarm")))
      }.toMap

  private def baseline: Map[String, (Long, Long)] =
    counts.map { case (k, cs) => k -> (cs.length.toLong, cs.sum.toLong) }

  private def streamTrajectory(batches: Seq[Seq[(String, Timestamp)]])
      : Map[(String, Long), (Long, Long, Boolean)] = {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val q = CusumStream.hourlyTrajectory(
        in.toDF().toDF("k", "t"), "k", "t", baseline, delay = "0 seconds")
      .writeStream.format("memory").queryName("cusum_out")
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      // push the watermark past every open bucket so the tail closes
      in.addData(("__flush", ts("2024-01-03 00:00:00")))
      q.processAllAvailable()
      spark.table("cusum_out")
        .select("key", "bucket", "n", "cusum_scaled", "alarm")
        .collect().map { r =>
          (r.getAs[String]("key"),
            r.getAs[Timestamp]("bucket").getTime / 3600000L) ->
            ((r.getAs[Long]("n"), r.getAs[Long]("cusum_scaled"),
              r.getAs[Boolean]("alarm")))
        }.toMap
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS cusum_out")
    }
  }

  test("stream trajectory equals batch on active buckets, any batch split") {
    val batch = batchTrajectory
    // batch emits the gap-filled grid; the stream only active buckets —
    // restrict the comparison to buckets that actually emitted
    val activeBatch = batch.filter(_._2._1 > 0L)

    val oneShot = streamTrajectory(Seq(events))
    val chrono = streamTrajectory(
      events.sortBy(_._2.getTime).grouped(23).toSeq)
    for (got <- Seq(oneShot, chrono)) {
      assert(got === activeBatch,
        s"diff: ${(got.toSet diff activeBatch.toSet)} / ${(activeBatch.toSet diff got.toSet)}")
    }
    // the planted shift alarms in-stream too
    assert(oneShot.exists { case ((k, _), (_, _, alarm)) => k == "a" && alarm })
    // key b's post-gap buckets carried the 3 silent hours' drift
    assert(oneShot.contains(("b", ts("2024-01-01 04:00:00").getTime / 3600000L)))
  }

  test("keys without a frozen envelope stay silent") {
    val got = streamTrajectory(Seq(events ++ Seq(
      ("zz", ts("2024-01-01 05:00:00")), ("zz", ts("2024-01-01 05:30:00")))))
    assert(!got.keys.exists(_._1 == "zz"))
  }
}
