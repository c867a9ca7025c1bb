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

  test("streaming CDC ingest dedups shared content at the chunk level") {
    implicit val ctx = spark.sqlContext
    // three ~150-token "paragraphs"; docs A = p1+p2 and B = p3+p2 share p2,
    // so CDC chunks interior to p2 hash identically across the two docs.
    val rnd = new scala.util.Random(11)
    def para() = Seq.fill(150)("w" + rnd.nextInt(40)).mkString(" ")
    val (p1, p2, p3) = (para(), para(), para())
    val in = MemoryStream[DocEv]
    val spec = PipelineSpec(
      vertices = Seq(
        SourceV("docs", in.toDF(), "ts"),
        MapV("cdc", df => graft.ops.CorpusOps.cdcChunks(df, "doc_id", "text")),
        MapV("dedup", df =>
          Dedup.byId(df.withWatermark("ts", "10 seconds"), Seq("chunk_hash"))),
        SinkV("out")),
      edges = Seq(Edge("docs", "cdc"), Edge("cdc", "dedup"), Edge("dedup", "out")))
    val q = graft.streaming.Compiler.compile(spec)("out")
      .writeStream.format("memory").queryName("cdc_out")
      .outputMode("append").start()
    try {
      in.addData(
        DocEv(1L, s"$p1 $p2", ts("2024-01-01 00:00:01")),
        DocEv(2L, s"$p3 $p2", ts("2024-01-01 00:00:02")))
      q.processAllAvailable()
      val emitted = spark.table("cdc_out")
      val total = graft.ops.CorpusOps.cdcChunks(
        Seq((1L, s"$p1 $p2"), (2L, s"$p3 $p2")).toDF("doc_id", "text"),
        "doc_id", "text").count()
      val n = emitted.count()
      assert(n < total, s"shared-paragraph chunks dedup in flight ($n < $total)")
      assert(emitted.select("chunk_hash").distinct().count() === n,
        "each surviving chunk hash emitted once")
    } finally q.stop()
  }

  test("streaming decontamination: arriving docs winnow row-locally and " +
      "semi-join the settled fingerprint table") {
    implicit val ctx = spark.sqlContext
    // settled corpus (e.g. an eval benchmark) → static fingerprint table;
    // the stream flags any arriving doc sharing a verbatim k-gram run.
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again"),
      (101L, "completely different benchmark text with its own unique phrases"))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.winnow(bench, "doc_id", "text", k = 4, w = 4)
      .select(col("fp")).distinct()

    val in = MemoryStream[DocEv]
    // same two hoisted projections as the batch op — stateless, so they
    // pipeline with the stream source; the join is stream-static.
    val winnowed = in.toDF()
      .withWatermark("ts", "10 seconds")
      .select(col("doc_id"), col("ts"), split(col("text"), " ").as("wtoks"))
      .select(col("doc_id"), col("ts"),
        TextAnalysis.winnowKeys(col("wtoks"), k = 4).as("wkeys"))
      .select(col("doc_id"), col("ts"),
        explode(TextAnalysis.winnowSelections(col("wkeys"), w = 4)).as("sel"))
      .select(col("doc_id"), col("ts"), col("sel.fp").as("fp"))
    val contaminated = winnowed
      .join(fps, Seq("fp"), "left_semi")
      // one flag per doc, state bounded by the watermark (a doc's
      // fingerprints all carry its event time)
      .dropDuplicatesWithinWatermark("doc_id")
      .select("doc_id")

    val q = contaminated.writeStream.format("memory")
      .queryName("contam_out").outputMode("append").start()
    try {
      in.addData(
        // doc 1 quotes a 7-token run of bench doc 100 → must flag
        DocEv(1L, "intro words then the quick brown fox jumps over the lazy tail",
          ts("2024-01-01 00:00:01")),
        // doc 2 shares nothing 4-gram-long → must pass
        DocEv(2L, "totally novel writing nothing shared with any benchmark corpus",
          ts("2024-01-01 00:00:02")))
      q.processAllAvailable()
      val flagged = spark.table("contam_out").as[Long].collect().toSet
      assert(flagged === Set(1L),
        s"quoting doc flagged, novel doc clean (got $flagged)")
    } finally q.stop()
  }
}
