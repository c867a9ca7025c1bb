package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.JsDivStream

/** Windowed JSD drift monitor: a frozen window reproduces the shared
  * [[JsDivStream.jsdAgainst]] kernel evaluated in batch over the same
  * rows (stream ≡ batch), self-comparison reads ≈0, a vocabulary swap
  * reads high with the OOV bucket absorbing the unseen mass, and the
  * reference builder's OOV invariant holds. */
class JsDivStreamSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "source", "text")

  test("referenceFrom: top-k + OOV bucket carries exactly the residual mass") {
    val docs = docsDf(Seq(
      (1L, "s0", "a a a b b c"),
      (2L, "s0", "a b d")))
    val ref = JsDivStream.referenceFrom(docs, "text", k = 2)
    val m = ref.toMap
    assert(m("a") === 4L)
    assert(m("b") === 3L)
    assert(m(JsDivStream.OovBucket) === 2L) // c + d
    assert(ref.map(_._2).sum === 9L)
  }

  test("one frozen window reproduces the batch kernel exactly; drift laws hold") {
    val base = docsDf(Seq(
      (1L, "ref", "the cat sat on the mat"),
      (2L, "ref", "the dog ran to the cat"),
      (3L, "ref", "a cat and a dog met")))
    val ref = JsDivStream.referenceFrom(base, "text", k = 4)

    val t0 = ts("2024-01-01 00:10:00")
    val rows = Seq(
      // 'same': drawn from the reference vocabulary
      (t0, "same", "the cat sat on the mat"),
      (t0, "same", "the dog and the cat"),
      // 'swapped': disjoint vocabulary — everything lands in OOV
      (t0, "swapped", "zig zag zup zem"),
      (t0, "swapped", "quux corge grault"))

    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, String)]
    val q = JsDivStream.windowedJsd(
        in.toDF().toDF("ts", "source", "text"),
        "ts", "source", "text", ref,
        windowDur = "1 hour", delay = "1 minute")
      .writeStream.format("memory").queryName("jsd_out")
      .outputMode("append").start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      in.addData((ts("2024-01-01 02:30:00"), "close", "x"))
      q.processAllAvailable()
      val got = spark.table("jsd_out")
        .where(col("bucket") === ts("2024-01-01 00:00:00"))
        .collect().map(r => r.getString(r.fieldIndex("source")) -> r).toMap

      // batch replay of the SAME rows through the SAME kernel
      val batch = docsDf(rows.zipWithIndex.map { case ((_, s, t), i) =>
          (i.toLong, s, t) })
        .select(col("source"),
          explode(split(col("text"), " ")).as("w"))
        .where(length(col("w")) > 0)
        .select(col("source"), when(
          array_contains(typedlit(
            ref.map(_._1).filterNot(_ == JsDivStream.OovBucket)), col("w")),
          col("w")).otherwise(lit(JsDivStream.OovBucket)).as("w"))
        .groupBy(col("source"), col("w")).agg(count(lit(1)).as("n"))
        .groupBy(col("source"))
        .agg(map_from_entries(sort_array(collect_list(
          struct(col("w"), col("n"))))).as("cur"),
          sum(col("n")).as("cc"))
        .select(col("source"),
          (round(JsDivStream.jsdAgainst(col("cur"), col("cc"), ref)
            * 1000000) / 1000000).as("jsd"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

      got.foreach { case (s, r) =>
        assert(r.getDouble(r.fieldIndex("jsd")) === batch(s),
          s"stream JSD for source $s diverged from the batch kernel")
      }
      // laws: in-vocabulary traffic reads low, swapped vocabulary high
      val sameJsd = got("same").getDouble(got("same").fieldIndex("jsd"))
      val swapJsd = got("swapped").getDouble(got("swapped").fieldIndex("jsd"))
      assert(sameJsd < 0.2, s"in-vocab JSD should be small, got $sameJsd")
      // swapped traffic is pure OOV, but the reference's OWN residual
      // OOV mass overlaps it — the ceiling is well below log2(2)=1;
      // the law is separation, not saturation
      assert(swapJsd > sameJsd + 0.2,
        s"disjoint-vocab JSD should clearly exceed in-vocab ($swapJsd vs $sameJsd)")
      assert(got("swapped").getDouble(got("swapped").fieldIndex("oov_frac"))
        === 1.0)
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS jsd_out")
    }
  }
}
