package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.AccumulatorWindow

/** W4 accumulator window: the stream-sorter acceptance test (the
  * reference's examples/40-stream-sorter.yaml) — out-of-order keyed events
  * come out in event-time order as the watermark releases them. */
case class Ev(key: String, ts: Timestamp, seq: Long)

class AccumulatorWindowSpec extends SparkSpec {
  import spark.implicits._

  test("stream sorter emits per-key events in event-time order") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val sorted = AccumulatorWindow.sorted(
      in.toDS().withWatermark("ts", "0 seconds"),
      (e: Ev) => e.key, (e: Ev) => e.ts)

    val q = sorted.writeStream.format("memory").queryName("sorter_out")
      .outputMode("append").start()

    // batch 1: out-of-order arrivals for key k (nothing releasable yet)
    in.addData(
      Ev("k", ts("2024-01-01 00:00:30"), 3),
      Ev("k", ts("2024-01-01 00:00:10"), 1),
      Ev("k", ts("2024-01-01 00:00:20"), 2))
    q.processAllAvailable()
    // batch 2: WM advances past 00:00:30 -> 1,2,3 release in order
    in.addData(Ev("k", ts("2024-01-01 00:01:00"), 4))
    q.processAllAvailable()
    in.addData(Ev("k", ts("2024-01-01 00:02:00"), 5))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("sorter_out").as[Ev].collect()
    val seqs = out.filter(_.seq <= 3).map(_.seq)
    assert(seqs.toSeq === Seq(1L, 2L, 3L), s"expected in-order release, got ${out.toSeq}")
  }
}
