package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.FdrStream

/** Windowed BH ≡ the batch stat_fdr query: the whole events table fed
  * into ONE stream window (metric = event_type, variant = user parity,
  * value = the money column) must reproduce the registered batch
  * query's (metric, n0, n1, t2, rank, rejected) rows exactly — shared
  * Welch kernel, shared quantized bar matrix, zero tolerance. */
class FdrStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf()

  test("one frozen window reproduces the batch stat_fdr rejections") {
    val batch = SparkEntry.queries("stat_fdr")(spark, dir)
      .select(col("event_type"), col("n0"), col("n1"), col("t2"),
        col("rank"), col("rejected"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getBoolean(5))).toSet
    assert(batch.nonEmpty)
    assert(batch.exists(_._6) || batch.exists(!_._6)) // both flags legal

    val rows: Seq[(Timestamp, String, Long, Double)] = spark.read
      .parquet(s"$dir/events.parquet")
      .select(col("event_type"),
        pmod(col("user_id"), lit(2)).cast("long").as("variant"),
        col("value"))
      .collect().toSeq
      .map(r => (ts("2024-01-01 00:30:00"), r.getString(0),
        r.getLong(1), r.getDouble(2)))

    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Long, Double)]
    val q = FdrStream.windowedRejections(
        in.toDF().toDF("ts", "metric", "variant", "value"),
        "ts", "metric", "variant", "value")
      .writeStream.format("memory").queryName("fdr_out")
      .outputMode("append").start()
    try {
      rows.grouped(4096).foreach(b => in.addData(b: _*))
      q.processAllAvailable()
      // close the window: a sentinel past watermark + window end
      in.addData((ts("2024-01-01 02:30:00"), "__sentinel", 0L, 0.0))
      q.processAllAvailable()
      val got = spark.table("fdr_out")
        .where(col("metric") =!= "__sentinel")
        .select(col("metric"), col("n0"), col("n1"), col("t2"),
          col("rank"), col("rejected"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getLong(4), r.getBoolean(5))).toSet
      assert(got === batch)
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS fdr_out")
    }
  }

  test("the step-up property holds per window: rejected = rank <= r*") {
    // structural law on the stream's own output: rejections are exactly
    // a prefix of the t²-descending ranking (step-UP, not per-rank)
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Long, Double)]
    val q = FdrStream.windowedRejections(
        in.toDF().toDF("ts", "metric", "variant", "value"),
        "ts", "metric", "variant", "value",
        windowDur = "10 minutes", delay = "1 minute")
      .writeStream.format("memory").queryName("fdr_law")
      .outputMode("append").start()
    try {
      val rnd = new scala.util.Random(7)
      val t0 = ts("2024-01-01 00:01:00").getTime
      val data = for {
        // m_const is constant in both arms → se2 = 0 → t2 = NULL (the
        // guard; an unguarded division is an ANSI DIVIDE_BY_ZERO that
        // would kill the stream) — nulls rank LAST like the batch
        m <- Seq("m_shift", "m_null_a", "m_null_b", "m_const")
        i <- 1 to 400
      } yield {
        val v = i % 2
        // m_shift carries a real arm effect; the null metrics are noise
        val x =
          if (m == "m_const") 50.0
          else rnd.nextGaussian() * 10 + 100 +
            (if (m == "m_shift" && v == 1) 15.0 else 0.0)
        (new Timestamp(t0 + rnd.nextInt(8 * 60) * 1000L),
          m, v.toLong, math.rint(x * 100) / 100)
      }
      in.addData(data: _*)
      q.processAllAvailable()
      in.addData((ts("2024-01-01 00:30:00"), "__sentinel", 0L, 0.0))
      q.processAllAvailable()
      val rows = spark.table("fdr_law")
        .where(col("metric") =!= "__sentinel")
        .select(col("rank"), col("rejected"), col("metric"))
        .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getString(2)))
      assert(rows.length === 4)
      val rstar = rows.filter(_._2).map(_._1).maxOption.getOrElse(0L)
      rows.foreach { case (rank, rej, m) =>
        assert(rej === (rank <= rstar), s"$m rank $rank")
      }
      // the null-t2 dead metric ranks LAST (batch NULLS LAST order) and
      // is not rejected; the planted 1.5-sigma shift dominates rank 1
      assert(rows.find(_._1 == 4L).get._3 === "m_const")
      assert(!rows.find(_._1 == 4L).get._2, "dead metric must not reject")
      assert(rows.find(_._1 == 1L).get._3 === "m_shift")
      assert(rows.find(_._1 == 1L).get._2, "planted shift must be rejected")
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS fdr_law")
    }
  }
}
