package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis
import graft.streaming.GenEvalStream

/** Stream ≡ batch for the windowed corpus-BLEU monitor, and the
  * row-local clip kernel's equivalence with the shuffle kernel. */
class GenEvalStreamSpec extends SparkSpec {
  import spark.implicits._

  test("row-local clippedOverlap equals the shuffle kernel's clip counts") {
    val pairs = Seq(
      (1L, "a b c a b", "b a b x y"),
      (2L, "the the the the", "the cat the mat"),
      (3L, "x y z", "p q r"),
      (4L, "a", "a"))
    val shuffled = TextAnalysis.pairNgramOverlap(
      pairs.toDF("id", "cand", "rtext"), "id", "cand", "rtext")
      .select(col("id"), col("clip1"), col("clip2"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val local = pairs.toDF("id", "cand", "rtext")
      .select(col("id"),
        TextAnalysis.clippedOverlap(TextAnalysis.tokens(col("cand")),
          TextAnalysis.tokens(col("rtext"))).as("clip1"),
        TextAnalysis.clippedOverlap(
          TextAnalysis.bigrams(TextAnalysis.tokens(col("cand"))),
          TextAnalysis.bigrams(TextAnalysis.tokens(col("rtext")))).as("clip2"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(local === shuffled)
  }

  test("windowed corpus BLEU: stream equals batch micro-average; closes on watermark") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, String)]
    val q = GenEvalStream.windowedBleu(
      in.toDF().toDF("ts", "cand", "rtext"), "ts", "cand", "rtext",
      windowLen = "1 hour", delay = "0 seconds")
      .writeStream.format("memory").queryName("geneval")
      .outputMode("append").start()
    try {
      in.addData(
        (ts("2024-01-01 00:10:00"), "a b c d", "a b x d"),
        (ts("2024-01-01 00:20:00"), "p q r", "p q r"),
        (ts("2024-01-01 00:40:00"), "m n", "m z"))
      q.processAllAvailable()
      assert(spark.table("geneval").count() === 0,
        "window must not emit before the watermark passes it")
      in.addData((ts("2024-01-01 02:00:00"), "flush", "flush"))
      q.processAllAvailable()
      q.processAllAvailable()

      val got = spark.table("geneval")
        .select(col("bucket"), col("n_pairs"), col("p1"), col("p2"),
          col("bleu2"))
        .as[(Timestamp, Long, Double, Double, Double)].collect()
        .map(r => r._1 -> r).toMap
      val (_, n, p1, p2, bleu2) = got(ts("2024-01-01 00:00:00"))
      assert(n === 3L)
      // micro-average over the window's three pairs:
      // clip1 = 3 + 3 + 1 = 7 of c1 = 4+3+2 = 9
      // clip2 = 1 + 2 + 0 = 3 of c2 = 3+2+1 = 6
      assert(p1 === math.round(7.0 / 9.0 * 10000) / 10000.0)
      assert(p2 === 0.5)
      assert(bleu2 === math.round(math.sqrt(7.0 / 9.0 * 0.5) * 10000) / 10000.0)
    } finally q.stop()
  }

  test("windowed corpus ROUGE-L: one frozen window reproduces the batch row exactly") {
    val dir = sf()
    val batch = SparkEntry.queries("eval_rouge_l_corpus")(spark, dir)
      .select(col("n_pairs"), col("rouge_p"), col("rouge_r"), col("rouge_f"))
      .collect().head

    // the batch query's own pairs, stamped into one stream window
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .sortBy(_._1)
    val byId = docs.toMap
    val pairs: Seq[(Timestamp, String, String)] = docs.flatMap { case (id, cand) =>
      byId.get(id + 1).map(ref => (ts("2024-01-01 00:30:00"), cand, ref))
    }.toSeq
    assert(pairs.nonEmpty)

    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, String)]
    val q = GenEvalStream.windowedRouge(
      in.toDF().toDF("ts", "cand", "rtext"), "ts", "cand", "rtext",
      windowLen = "1 hour", delay = "0 seconds")
      .writeStream.format("memory").queryName("geneval_rouge")
      .outputMode("append").start()
    try {
      pairs.grouped(2048).foreach(b => in.addData(b: _*))
      q.processAllAvailable()
      in.addData((ts("2024-01-01 02:00:00"), "flush", "flush"))
      q.processAllAvailable()
      val got = spark.table("geneval_rouge")
        .where(col("bucket") === ts("2024-01-01 00:00:00"))
        .select(col("n_pairs"), col("rouge_p"), col("rouge_r"), col("rouge_f"))
        .collect().head
      assert(got === batch, "stream window diverged from the batch micro-average")
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS geneval_rouge")
    }
  }

  test("windowed corpus WER: one frozen window reproduces the batch row exactly") {
    val dir = sf()
    val batch = SparkEntry.queries("eval_wer_corpus")(spark, dir)
      .select(col("n_pairs"), col("s_ref"), col("s_edit"), col("wer"),
        col("edit_sim"))
      .collect().head

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .sortBy(_._1)
    val byId = docs.toMap
    val pairs: Seq[(Timestamp, String, String)] = docs.flatMap { case (id, cand) =>
      byId.get(id + 1).map(ref => (ts("2024-01-01 00:30:00"), cand, ref))
    }.toSeq
    assert(pairs.nonEmpty)

    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, String)]
    val q = GenEvalStream.windowedWer(
      in.toDF().toDF("ts", "cand", "rtext"), "ts", "cand", "rtext",
      windowLen = "1 hour", delay = "0 seconds")
      .writeStream.format("memory").queryName("geneval_wer")
      .outputMode("append").start()
    try {
      pairs.grouped(2048).foreach(b => in.addData(b: _*))
      q.processAllAvailable()
      in.addData((ts("2024-01-01 02:00:00"), "flush", "flush"))
      q.processAllAvailable()
      val got = spark.table("geneval_wer")
        .where(col("bucket") === ts("2024-01-01 00:00:00"))
        .select(col("n_pairs"), col("s_ref"), col("s_edit"), col("wer"),
          col("edit_sim"))
        .collect().head
      assert(got === batch, "stream window diverged from the batch micro-average")
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS geneval_wer")
    }
  }
}
