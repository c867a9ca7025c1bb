package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.TrendStream

/** Stream ≡ batch for the windowed top-k trend detector. */
class TrendStreamSpec extends SparkSpec {
  import spark.implicits._

  test("windowed top-k equals the batch ranking; ties break key-ascending") {
    implicit val ctx = spark.sqlContext
    val events = Seq(
      // window [00:00, 01:00): a×3, b×2, c×2, d×1 -> top3 = a, b, c
      ("00:05", "a"), ("00:10", "a"), ("00:15", "a"),
      ("00:20", "b"), ("00:25", "b"),
      ("00:30", "c"), ("00:35", "c"),
      ("00:40", "d"),
      // window [01:00, 02:00): x×2, y×2 tie -> key-ascending: x before y
      ("01:10", "y"), ("01:20", "y"), ("01:30", "x"), ("01:40", "x"))
    val in = MemoryStream[(Timestamp, String)]
    val q = TrendStream.windowedTopK(
      in.toDF().toDF("ts", "item"), "ts", "item", k = 3,
      windowLen = "1 hour", delay = "0 seconds")
      .writeStream.format("memory").queryName("trend")
      .outputMode("append").start()
    try {
      in.addData(events.map { case (t, k) => (ts(s"2024-01-01 $t:00"), k) }: _*)
      q.processAllAvailable()
      in.addData((ts("2024-01-01 03:00:00"), "flush"))
      q.processAllAvailable()
      q.processAllAvailable()

      val got = spark.table("trend")
        .select(col("bucket"), col("n_keys"),
          transform(col("top"), e =>
            concat_ws(":", e.getField("key"),
              e.getField("cnt").cast("string"))).as("top"))
        .as[(Timestamp, Long, Seq[String])].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap

      assert(got(ts("2024-01-01 00:00:00")) ===
        ((4L, Seq("a:3", "b:2", "c:2"))))
      assert(got(ts("2024-01-01 01:00:00")) ===
        ((2L, Seq("x:2", "y:2"))), "equal counts must order key-ascending")
    } finally q.stop()
  }
}
