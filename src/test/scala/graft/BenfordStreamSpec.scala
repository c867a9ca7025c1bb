package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.BenfordStream

/** A closed window's Benford row equals the batch twin over that
  * window's rows (same plan builder, exact digit counts), under any
  * batch split; a round-number burst scores a higher TV than an
  * organic-looking mix. */
class BenfordStreamSpec extends SparkSpec {
  import spark.implicits._

  // hour 0: Benford-ish mix of first digits; hour 1: bot burst of
  // round 1xx.00 amounts (all digit 1)
  private val organic: Seq[Double] =
    Seq(1.23, 12.50, 1.99, 17.20, 2.35, 25.00, 2.90, 3.41, 36.00, 4.20,
      5.75, 6.10, 7.35, 8.80, 9.99, 1.05, 13.37, 2.22, 1.61, 4.44)
  private val burst: Seq[Double] = Seq.fill(15)(100.00) ++ Seq(1.00, 10.00)

  private val events: Seq[(Timestamp, Double)] =
    organic.zipWithIndex.map { case (v, i) =>
      (ts(f"2024-01-01 00:${i % 60}%02d:00"), v)
    } ++ burst.zipWithIndex.map { case (v, i) =>
      (ts(f"2024-01-01 01:${i % 60}%02d:00"), v)
    }

  private def streamRows(batches: Seq[Seq[(Timestamp, Double)]])
      : Map[Timestamp, (Long, Double, Int)] = {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Double)]
    val q = BenfordStream.windowed(in.toDF().toDF("t", "value"),
        "value", "t", delay = "0 seconds")
      .writeStream.format("memory").queryName("benford_out")
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      in.addData((ts("2024-01-02 00:00:00"), 1.0)) // close every window
      q.processAllAvailable()
      spark.table("benford_out")
        .as[(Timestamp, Long, Double, Int)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS benford_out")
    }
  }

  test("stream ≡ batch per closed window; the burst window scores worse") {
    val batchRows = BenfordStream.batch(
        events.toDF("t", "value")
          .select(col("t").cast("timestamp_ntz").as("t"), col("value")),
        "value", "t")
      .as[(Timestamp, Long, Double, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    for (split <- Seq(Seq(events), events.grouped(7).toSeq)) {
      val got = streamRows(split)
      // both data windows closed by the flush event
      assert(batchRows.keySet.subsetOf(got.keySet), s"${got.keySet}")
      batchRows.foreach { case (w, v) => assert(got(w) === v, s"window $w") }
    }
    val Seq(h0, h1) = batchRows.keys.toSeq.sorted.take(2)
    assert(batchRows(h1)._2 > batchRows(h0)._2, // TV: burst ≫ organic
      s"burst ${batchRows(h1)} vs organic ${batchRows(h0)}")
    assert(batchRows(h1)._3 === 1) // worst digit of the burst is 1
  }
}
