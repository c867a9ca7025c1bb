package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.ops.Dedup
import graft.streaming.SpanGuard

/** Ingest-time span contamination guard: streamed docs collide against
  * the persisted settled-corpus artifacts exactly as the batch operator
  * does, across micro-batches, with cross-batch pair dedup. */
class SpanGuardSpec extends SparkSpec {
  import spark.implicits._

  private def mk(tag: String) = (1 to 15).map(i => s"w$i$tag").mkString(" ")

  test("streamed docs collide against the settled table like the batch operator") {
    dropLocalTable("g_spans")
    val bloomPath = java.nio.file.Files
      .createTempFile("g_spans_bloom", ".bin").toString

    val existing = (1 to 30)
      .map(i => (i.toLong, mk(s"c${i % 3}") + s" tail$i"))
      .toDF("doc_id", "text")
    Dedup.writeSpanTable(existing, "doc_id", "text", "g_spans",
      buckets = 4, bloomPath = bloomPath)

    implicit val ctx = spark.sqlContext
    val in = MemoryStream[StreamDoc]
    val out = SpanGuard.collisions(
      in.toDF().withWatermark("ts", "0 seconds"),
      "g_spans", bloomPath, "doc_id", "text", "ts")
    val q = out.writeStream.format("memory").queryName("guard_out")
      .outputMode("append").start()
    try {
      in.addData(
        StreamDoc(1001L, mk("c1") + " novel ending", ts("2024-01-01 00:00:10")),
        StreamDoc(1002L, mk("zz"), ts("2024-01-01 00:00:11")))
      q.processAllAvailable()
      // a later batch collides too (the static side persists across batches)
      in.addData(StreamDoc(1003L, mk("c2"), ts("2024-01-01 00:01:00")))
      q.processAllAvailable()

      val got = spark.table("guard_out")
        .as[(Long, Long)].collect().toSet
      // batch-operator reference on the SAME data
      val arrivals = Seq(
        (1001L, mk("c1") + " novel ending"),
        (1002L, mk("zz")),
        (1003L, mk("c2"))).toDF("doc_id", "text")
      val ref = Dedup.bloomIncrementalSpans(existing, arrivals, "doc_id", "text")
        .as[(Long, Long)].collect().toSet
      assert(got === ref, s"stream/batch divergence: got=$got ref=$ref")
      assert(got.exists(_._1 == 1001L) && got.exists(_._1 == 1003L))
      assert(!got.exists(_._1 == 1002L), s"clean doc flagged: $got")
    } finally q.stop()
  }

  test("admitSink: streamed admission extends the artifacts micro-batch over micro-batch") {
    dropLocalTable("s_spans")
    val bloomPath = java.nio.file.Files
      .createTempFile("s_spans_bloom", ".bin").toString

    val settled = (1 to 10)
      .map(i => (i.toLong, mk("base") + s" tail$i")).toDF("doc_id", "text")
    graft.ops.Dedup.writeSpanTable(settled, "doc_id", "text", "s_spans",
      buckets = 4, bloomPath = bloomPath)

    val seen = scala.collection.mutable.Set[(Long, Long)]()
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[StreamDoc]
    val q = in.toDF().select("doc_id", "text").writeStream
      .outputMode("append")
      .foreachBatch(SpanGuard.admitSink("s_spans", bloomPath, "doc_id", "text",
        onCollisions = c => { seen ++= c.as[(Long, Long)].collect(); () }))
      .start()
    try {
      in.addData(StreamDoc(2001L, mk("novel") + " first", ts("2024-01-01 00:00:10")))
      q.processAllAvailable()
      assert(seen.isEmpty, s"novel doc must admit cleanly: $seen")
      in.addData(StreamDoc(3001L, mk("novel") + " again", ts("2024-01-01 00:01:00")))
      q.processAllAvailable()
      assert(seen.toSet === Set((3001L, 2001L)),
        s"batch 2 must collide with the batch-1 admission: $seen")
    } finally q.stop()
  }
}
