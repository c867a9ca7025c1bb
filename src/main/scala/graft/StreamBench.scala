package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming benchmark (BASELINE.md measurement-plan rows 2-3): sustained
  * windowed-agg throughput with the events table replayed through a
  * MemoryStream, and the trigger-to-result latency of a minimal
  * even-odd → windowed-sum slice. One JSON line + STREAMBENCH.json.
  */
object StreamBench {
  final case class E(key: String, ts: Timestamp, value: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      // Streaming tuning differs from batch: shuffle partitions fix the
      // number of STATE STORE instances per stateful operator, and each
      // one pays commit/checkpoint cost every micro-batch. For this state
      // size (≲100k windowed keys) 4 stores beat 32 by ~2x — at real
      // scale you size this to state volume, not core count.
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    // ---- sustained windowed-agg throughput over the replayed events table
    val events = graft.ops.Tables.events(spark, sfDir)
      .select(col("user_id").cast("string").as("key"),
        col("ts").cast("timestamp").as("ts"),
        col("value").cast("long").as("value"))
      .as[E].collect()
    val in = MemoryStream[E]
    val q = in.toDF()
      .withWatermark("ts", "30 seconds")
      .groupBy(window(col("ts"), "60 seconds"), col("key"))
      .agg(sum(col("value")).as("sum_value"), count(lit(1)).as("n"))
      .writeStream.format("noop").outputMode("append").start()
    val t0 = System.nanoTime()
    events.grouped(math.max(events.length / 8, 1)).foreach { chunk =>
      in.addData(chunk.toIndexedSeq); q.processAllAvailable()
    }
    val wallThroughput = (System.nanoTime() - t0) / 1e9
    q.stop()
    val rowsPerSec = events.length / wallThroughput

    // ---- trigger-to-result latency: even-odd router -> windowed sum
    val in2 = MemoryStream[E]
    val routed = in2.toDF()
      .withColumn("tag", when(col("value") % 2 === 0, "even").otherwise("odd"))
      .where(col("tag") === "even")
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "10 seconds")).agg(sum(col("value")))
    val q2 = routed.writeStream.format("noop").outputMode("append").start()
    val base = Timestamp.valueOf("2024-01-01 00:00:01")
    in2.addData((1 to 100).map(i => E(s"k${i % 5}", base, i.toLong)))
    q2.processAllAvailable() // warm the plan
    val t1 = System.nanoTime()
    in2.addData(E("k0", Timestamp.valueOf("2024-01-01 01:00:00"), 2L))
    q2.processAllAvailable() // trigger-to-result for one message
    val latencyMs = (System.nanoTime() - t1) / 1e6
    q2.stop()

    val json =
      f"""{"metric":"stream","rows":${events.length},"throughput_rows_per_sec":${rowsPerSec}%.0f,"window_sum_wall_sec":$wallThroughput%.2f,"slice_latency_ms":$latencyMs%.1f,"sf":"$sfDir"}"""
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("STREAMBENCH.json"), json)
    spark.stop()
  }
}
