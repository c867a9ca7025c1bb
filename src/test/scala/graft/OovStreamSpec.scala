package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.OovStream

/** Closed OOV windows carry exact token/OOV counts against the frozen
  * vocab, equal under any batch split, and a planted OOV burst is
  * visible as a higher fraction than the in-vocab window. */
class OovStreamSpec extends SparkSpec {
  import spark.implicits._

  private val vocabWords = Seq("the", "cat", "sat", "on", "mat")

  // hour 0: fully in-vocab; hour 1: half the tokens are junk
  private val docs: Seq[(Timestamp, String)] = Seq(
    (ts("2024-01-01 00:05:00"), "the cat sat"),
    (ts("2024-01-01 00:25:00"), "on the mat"),
    (ts("2024-01-01 01:05:00"), "the zzq qqz"),
    (ts("2024-01-01 01:35:00"), "cat xxj mat yyk"))

  test("stream ≡ exact counts per closed window; burst window higher") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val q = OovStream.windowed(in.toDF().toDF("t", "text"),
        vocabWords.toDF("word"), "text", "t", delay = "0 seconds")
      .writeStream.format("memory").queryName("oov_out")
      .outputMode("append").start()
    try {
      docs.grouped(1).foreach { b => in.addData(b: _*); q.processAllAvailable() }
      in.addData((ts("2024-01-02 00:00:00"), "the"))
      q.processAllAvailable()
      val got = spark.table("oov_out")
        .as[(Timestamp, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got(ts("2024-01-01 00:00:00")) === ((6L, 0L, 0.0)))
      assert(got(ts("2024-01-01 01:00:00")) === ((7L, 4L, 0.571429)))
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS oov_out")
    }
  }
}
