package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.model.Pipeline._
import graft.ops.{Dedup, TextAnalysis}

case class DocEv(doc_id: Long, text: String, ts: Timestamp)

/** The two halves compose: training-data operators (quality features,
  * dedup-by-id) run as vertices of a compiled streaming DAG — a crawl
  * ingest pipeline in the reference's own pipeline model. */
class TrainingStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming corpus ingest: quality filter -> dedup -> sink via the DSL") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[DocEv]
    val spec = PipelineSpec(
      vertices = Seq(
        SourceV("docs", in.toDF(), "ts"),
        MapV("quality", df =>
          TextAnalysis.qualityFeatures(df, "text").where(col("n_tokens") >= 4)),
        MapV("dedup", df =>
          Dedup.byId(df.withWatermark("ts", "10 seconds"), Seq("doc_id"))
            .select("doc_id", "n_tokens")),
        SinkV("out")),
      edges = Seq(Edge("docs", "quality"), Edge("quality", "dedup"),
        Edge("dedup", "out")))

    val q = graft.streaming.Compiler.compile(spec)("out")
      .writeStream.format("memory").queryName("corpus_out")
      .outputMode("append").start()
    try {
      in.addData(
        DocEv(1L, "alpha beta gamma delta eps", ts("2024-01-01 00:00:01")),
        DocEv(2L, "too short", ts("2024-01-01 00:00:02")), // quality-filtered
        DocEv(3L, "one two three four five six", ts("2024-01-01 00:00:03")))
      q.processAllAvailable()
      in.addData( // redelivery of doc 1 within the dedup window
        DocEv(1L, "alpha beta gamma delta eps", ts("2024-01-01 00:00:04")))
      q.processAllAvailable()
      val out = spark.table("corpus_out")
        .select("doc_id", "n_tokens").as[(Long, Long)].collect().sorted.toSeq
      assert(out === Seq((1L, 5L), (3L, 6L)),
        "short doc filtered, redelivered doc deduped, features attached")
    } finally q.stop()
  }
}
