package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.YieldStream

/** Streaming yield ≡ batch yield per closed window, under any
  * micro-batch split; a junk burst visibly drops the window's yield. */
class YieldStreamSpec extends SparkSpec {
  import spark.implicits._

  // hour 0: ordinary docs; hour 1: half the docs replaced by one-token
  // junk (whose classifier score differs and whose token mass is tiny)
  private val docs: Seq[(Long, String, Timestamp)] =
    (0 until 120).map { i =>
      val h = i / 60
      val junk = h == 1 && i % 2 == 0
      val text =
        if (junk) "zzzqq"
        else s"table scan merge join value part key row batch w$i"
      (i.toLong, text, ts(f"2024-01-01 0$h%01d:${i % 60}%02d:00"))
    }

  private val threshold = 0.5

  private def batchRef: Map[Long, (Long, Long, Long, Double)] =
    YieldStream.batch(docs.toDF("id", "text", "t"), "text", "t", threshold)
      .collect().map(r => r.getAs[Timestamp]("bucket").getTime ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_docs_kept"),
          r.getAs[Long]("n_tokens_kept"), r.getAs[Double]("token_yield"))))
      .toMap

  private def run(batches: Seq[Seq[(Long, String, Timestamp)]])
      : Map[Long, (Long, Long, Long, Double)] = {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    val name = s"yield_out_${System.nanoTime()}"
    val q = YieldStream.windowed(in.toDF().toDF("id", "text", "t"),
        "text", "t", threshold, delay = "0 seconds")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      in.addData((999L, "flush", ts("2024-01-02 00:00:00")))
      q.processAllAvailable()
      spark.table(name)
        .where(col("bucket") < ts("2024-01-01 12:00:00"))
        .collect().map(r => r.getAs[Timestamp]("bucket").getTime ->
          ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_docs_kept"),
            r.getAs[Long]("n_tokens_kept"), r.getAs[Double]("token_yield"))))
        .toMap
    } finally q.stop()
  }

  test("closed windows equal the batch twin; split-invariant") {
    val want = batchRef
    assert(want.size === 2)
    val got = run(Seq(docs))
    assert(got === want, s"got $got\nwant $want")
    assert(run(docs.grouped(41).toSeq) === want)
  }

  test("a junk burst drops the window's token yield") {
    val want = batchRef.toSeq.sortBy(_._1).map(_._2)
    val (h0, h1) = (want.head, want.last)
    assert(h0._1 === 60L && h1._1 === 60L)
    // junk docs carry almost no tokens, so even if some clear the bar
    // the hour's token mass visibly shifts; the doc-kept count and the
    // yield cannot both stay unchanged
    assert(h1._3 < h0._3, s"junk hour must lose kept-token mass: $h0 $h1")
  }
}
