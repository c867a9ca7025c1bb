package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.BayesAbStream

/** Windowed Bayesian A/B ≡ the batch stat_bayes_ab query: one day of
  * the events table fed into one stream window (variant = user parity,
  * conversion = purchase) must reproduce that day's batch row exactly —
  * shared posterior kernel, shared Φ polynomial, zero tolerance. */
class BayesAbStreamSpec extends SparkSpec {
  import spark.implicits._

  test("one frozen window reproduces the batch day's posterior row") {
    val dir = sf()
    val batch = SparkEntry.queries("stat_bayes_ab")(spark, dir)
      .orderBy(col("day")).limit(1)
      .select(col("n0"), col("s0"), col("n1"), col("s1"),
        col("z"), col("p_b_gt_a"))
      .collect().head
    val day0 = SparkEntry.queries("stat_bayes_ab")(spark, dir)
      .agg(min(col("day"))).collect().head.getDate(0)

    val rows: Seq[(Timestamp, Long, Boolean)] = spark.read
      .parquet(s"$dir/events.parquet")
      .where(to_date(col("ts")) === lit(day0))
      .select(pmod(col("user_id"), lit(2)).cast("long"),
        col("event_type") === "purchase")
      .collect().toSeq
      .map(r => (ts("2024-01-01 00:30:00"), r.getLong(0), r.getBoolean(1)))
    assert(rows.nonEmpty)

    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, Boolean)]
    val q = BayesAbStream.windowedPosterior(
        in.toDF().toDF("ts", "variant", "conv"), "ts", "variant", "conv")
      .writeStream.format("memory").queryName("bayes_out")
      .outputMode("append").start()
    try {
      rows.grouped(4096).foreach(b => in.addData(b: _*))
      q.processAllAvailable()
      in.addData((ts("2024-01-01 02:30:00"), 0L, false)) // close the window
      q.processAllAvailable()
      val got = spark.table("bayes_out")
        .orderBy(col("bucket")).limit(1)
        .select(col("n0"), col("s0"), col("n1"), col("s1"),
          col("z"), col("p_b_gt_a"))
        .collect().head
      assert(got === batch)
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS bayes_out")
    }
  }

  test("degenerate arms stay finite: empty arm, zero conversions") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, Boolean)]
    val q = BayesAbStream.windowedPosterior(
        in.toDF().toDF("ts", "variant", "conv"), "ts", "variant", "conv",
        windowDur = "10 minutes", delay = "1 minute")
      .writeStream.format("memory").queryName("bayes_deg")
      .outputMode("append").start()
    try {
      // only arm 0 sends traffic, zero conversions — the smoothed
      // posterior still yields a finite probability (arm 1 at prior)
      val t0 = ts("2024-01-01 00:01:00")
      in.addData((1 to 50).map(_ => (t0, 0L, false)): _*)
      q.processAllAvailable()
      in.addData((ts("2024-01-01 00:30:00"), 0L, false))
      q.processAllAvailable()
      val r = spark.table("bayes_deg").orderBy(col("bucket")).limit(1)
        .select(col("n0"), col("n1"), col("p_b_gt_a")).collect().head
      assert(r.getLong(0) === 50L && r.getLong(1) === 0L)
      val p = r.getDouble(2)
      assert(!p.isNaN && p > 0.5 && p < 1.0,
        s"prior arm (mean 0.5) must beat a 50-trial zero-conversion arm: $p")
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS bayes_deg")
    }
  }
}
