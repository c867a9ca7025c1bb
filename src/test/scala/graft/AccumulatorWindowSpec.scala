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

  test("idle key releases only below-watermark rows on timeout (no early flush)") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    // 2-minute delay keeps k's far row ABOVE the watermark while the
    // timeout fires — the scenario where the pre-fix code flushed early.
    val sorted = AccumulatorWindow.sorted(
      in.toDS().withWatermark("ts", "2 minutes"),
      (e: Ev) => e.key, (e: Ev) => e.ts)

    val q = sorted.writeStream.format("memory").queryName("idle_out")
      .outputMode("append").start()

    def emitted(): Seq[Long] =
      spark.table("idle_out").as[Ev].collect().filter(_.key == "k").map(_.seq).toSeq

    // key k buffers a near row and a far row, then goes idle
    in.addData(
      Ev("k", ts("2024-01-01 00:00:10"), 1),
      Ev("k", ts("2024-01-01 00:05:00"), 9))
    q.processAllAvailable()
    // wm rises to 00:03:00 (= 00:05:00 - 2min); k idle, its timeout fires:
    // seq 1 (00:00:10 <= wm) may release, seq 9 (00:05:00 > wm) MUST stay
    // (the pre-fix behavior flushed the whole buffer here)
    in.addData(Ev("x", ts("2024-01-01 00:06:00"), 100))
    q.processAllAvailable()
    in.addData(Ev("x", ts("2024-01-01 00:06:30"), 101)) // wm -> 00:04:00
    q.processAllAvailable()
    assert(emitted() === Seq(1L), s"far-future row must not flush early")

    // a later k row between wm (00:04:30 by now) and seq 9 must still
    // come out BEFORE 9
    in.addData(Ev("k", ts("2024-01-01 00:04:45"), 2))
    q.processAllAvailable()
    in.addData(Ev("x", ts("2024-01-01 00:12:00"), 102)) // wm -> 00:04:30
    q.processAllAvailable()
    in.addData(Ev("x", ts("2024-01-01 00:13:00"), 103)) // wm -> 00:10:00: drain
    q.processAllAvailable()
    in.addData(Ev("x", ts("2024-01-01 00:14:00"), 104)) // extra tick
    q.processAllAvailable()
    q.stop()

    assert(emitted() === Seq(1L, 2L, 9L), "event-time order must hold across idle periods")
  }

  test("DSL accumulator vertex compiles to the stream sorter") {
    import graft.model.Pipeline._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val spec = PipelineSpec(
      vertices = Seq(
        SourceV("in", in.toDF(), "ts"),
        ReduceV("sorter", GroupBySpec(Accumulator("1 minute"), Seq("key"), Seq.empty)),
        SinkV("out")),
      edges = Seq(Edge("in", "sorter"), Edge("sorter", "out")))
    val q = graft.streaming.Compiler.compile(spec)("out")
      .writeStream.format("memory").queryName("dsl_sorter")
      .outputMode("append").start()
    try {
      in.addData(
        Ev("k", ts("2024-01-01 00:00:30"), 3),
        Ev("k", ts("2024-01-01 00:00:10"), 1))
      q.processAllAvailable()
      in.addData(Ev("k", ts("2024-01-01 00:02:00"), 4)) // advance wm
      q.processAllAvailable()
      in.addData(Ev("k", ts("2024-01-01 00:05:00"), 5))
      q.processAllAvailable()
      val seqs = spark.table("dsl_sorter").select("seq")
        .as[Long].collect().filter(_ <= 3)
      assert(seqs.toSeq === Seq(1L, 3L)) // event-time order, via the DSL
    } finally q.stop()
  }

  test("DSL accumulator vertex compiles in batch to per-key event-time order") {
    import graft.model.Pipeline._
    val df = Seq(
      Ev("a", ts("2024-01-01 00:00:30"), 3),
      Ev("a", ts("2024-01-01 00:00:10"), 1),
      Ev("b", ts("2024-01-01 00:00:20"), 2),
      Ev("a", ts("2024-01-01 00:00:20"), 2),
      Ev("b", ts("2024-01-01 00:00:10"), 1)).toDF()
    val spec = PipelineSpec(
      vertices = Seq(
        SourceV("in", df, "ts"),
        ReduceV("sorter", GroupBySpec(Accumulator("1 minute"), Seq("key"), Seq.empty)),
        SinkV("out")),
      edges = Seq(Edge("in", "sorter"), Edge("sorter", "out")))
    // batch compile no longer throws: end-of-input watermark releases all
    // rows, so the operator becomes repartition-by-key + in-partition sort.
    val out = graft.streaming.Compiler.compile(spec, streaming = false)("out")
    val perPartition = out.select("key", "seq").rdd
      .mapPartitions(it => Iterator.single(
        it.map(r => (r.getString(0), r.getLong(1))).toSeq))
      .collect()
    perPartition.foreach { rows =>
      rows.groupBy(_._1).values.foreach { ks =>
        assert(ks.map(_._2) === ks.map(_._2).sorted, "per-key event order")
      }
    }
    assert(perPartition.map(_.length).sum === 5) // nothing lost
  }
}
