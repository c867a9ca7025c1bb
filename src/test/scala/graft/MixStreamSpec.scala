package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.MixStream

/** Streaming mix-TV ≡ batch per closed window under any split; a
  * planted source outage raises the window's TV and names the source. */
class MixStreamSpec extends SparkSpec {
  import spark.implicits._

  private val targets = Map("s0" -> 0.5, "s1" -> 0.3, "s2" -> 0.2)

  // hour 0: on-target mix (5:3:2); hour 1: s1 goes dark, its share
  // lands on s0 and an UNKNOWN source sx appears
  private val docs: Seq[(String, Timestamp)] =
    (0 until 200).map { i =>
      val h = i / 100
      val src =
        if (h == 0) { if (i % 10 < 5) "s0" else if (i % 10 < 8) "s1" else "s2" }
        else { if (i % 10 < 6) "s0" else if (i % 10 < 8) "sx" else "s2" }
      (src, ts(f"2024-01-01 0$h%01d:${i % 60}%02d:00"))
    }

  private def batchRef: Map[Long, (Long, Double, String)] =
    MixStream.batch(docs.toDF("source", "t"), "source", "t", targets)
      .collect().map(r => r.getAs[Timestamp]("window_start").getTime ->
        ((r.getAs[Long]("n"), r.getAs[Double]("tv"),
          r.getAs[String]("worst_source")))).toMap

  private def run(batches: Seq[Seq[(String, Timestamp)]])
      : Map[Long, (Long, Double, String)] = {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val name = s"mix_out_${System.nanoTime()}"
    val q = MixStream.windowed(in.toDF().toDF("source", "t"),
        "source", "t", targets, delay = "0 seconds")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      in.addData(("s0", ts("2024-01-02 00:00:00")))
      q.processAllAvailable()
      spark.table(name)
        .where(col("window_start") < ts("2024-01-01 12:00:00"))
        .collect().map(r => r.getAs[Timestamp]("window_start").getTime ->
          ((r.getAs[Long]("n"), r.getAs[Double]("tv"),
            r.getAs[String]("worst_source")))).toMap
    } finally q.stop()
  }

  test("closed windows equal the batch twin; split-invariant") {
    val want = batchRef
    assert(want.size === 2)
    val got = run(Seq(docs))
    assert(got === want, s"got $got\nwant $want")
    assert(run(docs.grouped(37).toSeq) === want)
  }

  test("an outage hour scores high TV and names the dark source") {
    val byHour = batchRef.toSeq.sortBy(_._1).map(_._2)
    val (h0, h1) = (byHour.head, byHour.last)
    assert(h0._2 === 0.0, s"on-target hour must score zero TV: $h0")
    // hour 1: s1 share 0 (dev .3), s0 .6 (dev .1), s2 .2 (dev 0),
    // unknown sx .2 → TV = (.3+.1+0+.2)/2 = 0.3, worst = s1
    assert(h1._2 === 0.3, h1.toString)
    assert(h1._3 === "s1")
  }
}
