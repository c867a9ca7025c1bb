package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.Sketches
import graft.streaming.QuantileStream

/** Closed-window streaming quantiles are bit-identical to the batch
  * binned operator over the same rows, however arrivals split into
  * micro-batches. */
class QuantileStreamSpec extends SparkSpec {
  import spark.implicits._

  test("windowed stream quantiles equal batch binnedQuantiles per window") {
    // two keys, two 1-minute windows, skewed values so p50/p95 differ
    val rows: Seq[(String, Timestamp, Long)] =
      (1 to 60).map(i => ("a", ts("2024-01-01 00:00:10"), i * 10L)) ++
      (1 to 30).map(i => ("b", ts("2024-01-01 00:00:20"), 1000L + i)) ++
      (1 to 45).map(i => ("a", ts("2024-01-01 00:01:30"), i * i * 3L))

    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp, Long)]
    val q = QuantileStream.windowed(in.toDF().toDF("k", "ts", "v"),
        "k", "ts", "v", binWidth = 50L, qs = Seq(0.5, 0.95),
        windowDur = "60 seconds", delay = "0 seconds")
      .writeStream.format("memory").queryName("q_out")
      .outputMode("append").start()
    try {
      // deliberately awkward batch splits
      rows.grouped(37).foreach { b => in.addData(b: _*); q.processAllAvailable() }
      in.addData(("z", ts("2024-01-01 01:00:00"), 0L)) // close everything
      q.processAllAvailable()

      val got = spark.table("q_out").where(col("k") =!= "z")
        .select("bucket", "k", "n", "q50", "q95")
        .as[(Timestamp, String, Long, Long, Long)].collect().toSet

      val batch = Sketches.binnedQuantiles(
          rows.toDF("k", "ts", "v")
            .withColumn("bucket", window(col("ts"), "60 seconds")("start")),
          Seq("bucket", "k"), col("v"), binWidth = 50L, qs = Seq(0.5, 0.95))
        .select("bucket", "k", "n", "q50", "q95")
        .as[(Timestamp, String, Long, Long, Long)].collect().toSet
      assert(got === batch)
      assert(got.size === 3) // (a, w1), (b, w1), (a, w2)
    } finally q.stop()
  }
}
