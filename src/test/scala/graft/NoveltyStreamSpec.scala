package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.Dedup
import graft.streaming.NoveltyStream

/** Closed windows carry per-doc gram/novel counts identical to the
  * batch `noveltyVsReference` over the same docs and frozen reference,
  * under any micro-batch split. */
class NoveltyStreamSpec extends SparkSpec {
  import spark.implicits._

  // reference corpus: two docs; the frozen artifact is their gram keys
  private val refDocs = Seq(
    (100L, "the quick brown fox jumps over the lazy dog"),
    (101L, "pack my box with five dozen liquor jugs"))

  // arriving docs: one pure reference rehash (novelty 0), one half-novel
  // splice, one fully novel
  private val docs: Seq[(Long, Timestamp, String)] = Seq(
    (1L, ts("2024-01-01 00:05:00"), "the quick brown fox jumps"),
    (2L, ts("2024-01-01 00:25:00"), "the quick brown stone golem walks"),
    (3L, ts("2024-01-01 01:10:00"), "completely fresh text never seen anywhere"))

  test("stream ≡ batch noveltyVsReference per closed window") {
    implicit val ctx = spark.sqlContext
    val refGrams = NoveltyStream.freezeReference(
      refDocs.toDF("doc_id", "text"), "text").cache()
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = NoveltyStream.perDoc(in.toDF().toDF("doc_id", "t", "text"),
        refGrams, "doc_id", "text", "t", delay = "0 seconds")
      .writeStream.format("memory").queryName("nov_out")
      .outputMode("append").start()
    try {
      docs.grouped(1).foreach { b => in.addData(b: _*); q.processAllAvailable() }
      in.addData((9L, ts("2024-01-02 00:00:00"), "flush flush flush flush"))
      q.processAllAvailable()
      val got = spark.table("nov_out")
        .select("doc_id", "n_grams", "n_novel", "novelty_frac")
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

      val want = Dedup.noveltyVsReference(
          docs.map(d => (d._1, d._3)).toDF("doc_id", "text"),
          refDocs.toDF("doc_id", "text"), "doc_id", "text")
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

      assert(got == want, s"got $got\nwant $want")
      // the semantics the fixture plants: rehash ≈ 0, splice in between,
      // fresh = 1
      assert(got(1L)._3 == 0.0 && got(3L)._3 == 1.0)
      assert(got(2L)._3 > 0.0 && got(2L)._3 < 1.0)
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS nov_out")
    }
  }
}
