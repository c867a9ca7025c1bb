package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Stats
import graft.streaming.AnovaStream

/** Stream ≡ batch for the windowed ANOVA experiment monitor. */
class AnovaStreamSpec extends SparkSpec {
  import spark.implicits._

  test("windowed F equals the batch kernel on the same slice; closes on watermark") {
    implicit val ctx = spark.sqlContext
    val w1 = Seq(
      ("2024-01-01 00:05:00", "A", 10.00), ("2024-01-01 00:15:00", "A", 12.00),
      ("2024-01-01 00:25:00", "A", 11.00), ("2024-01-01 00:10:00", "B", 20.00),
      ("2024-01-01 00:20:00", "B", 23.00), ("2024-01-01 00:30:00", "B", 19.00),
      ("2024-01-01 00:40:00", "C", 15.50), ("2024-01-01 00:50:00", "C", 14.25))
    val in = MemoryStream[(Timestamp, String, Double)]
    val q = AnovaStream.windowedF(
      in.toDF().toDF("ts", "variant", "value"), "ts", "variant", "value",
      windowLen = "1 hour", delay = "0 seconds")
      .writeStream.format("memory").queryName("anova_win")
      .outputMode("append").start()
    try {
      in.addData(w1.map { case (t, g, v) => (ts(t), g, v) }: _*)
      q.processAllAvailable()
      assert(spark.table("anova_win").count() === 0,
        "no emission before the window closes")
      in.addData((ts("2024-01-01 02:00:00"), "A", 1.0))
      q.processAllAvailable()
      q.processAllAvailable()

      val got = spark.table("anova_win")
        .select(col("bucket"), col("n"), col("n_groups"), col("f"))
        .as[(Timestamp, Long, Long, Double)].collect()
        .map(r => r._1 -> r).toMap
      val (_, n, k, f) = got(ts("2024-01-01 00:00:00"))
      assert(n === 8L && k === 3L)

      // batch twin: the SAME kernel over the same rows
      val batch = Stats.fFromGroupMoments(
        Stats.groupMoments(
          w1.toDF("ts", "grp0", "value").withColumnRenamed("grp0", "variant"),
          "variant", "value"), Nil)
        .select(col("f")).as[Double].head()
      assert(f === batch, s"stream F $f must equal batch F $batch")
      assert(f > 10.0, s"clearly separated groups must score a large F: $f")
    } finally q.stop()
  }
}
