package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Stats
import graft.streaming.CupedStream

/** Streaming CUPED ≡ batch apply: with the SAME frozen (profile, θ, X̄),
  * every watermark-closed window's adjusted means equal the batch
  * computation over exactly that window's rows — under any micro-batch
  * split, with profile-less users entering at X = 0. */
class CupedStreamSpec extends SparkSpec {
  import spark.implicits._

  // 3 hours of spend across 8 users; users 6,7 have NO profile row
  private val events: Seq[(Long, Timestamp, BigDecimal)] =
    (0 until 240).map { i =>
      val u = (i % 8).toLong
      val h = i / 80
      (u, ts(f"2024-01-01 0$h%01d:${(i * 7) % 60}%02d:00"),
        BigDecimal((u + 1) * (h + 1)).setScale(2) + BigDecimal("0.25"))
    }

  private val profile = (0L until 6L).map(u => (u, (u + 1) * 150L))
  private val theta = 0.75
  private val meanX = 525.0 // cents

  private def batchReference: Map[(Long, Int), (Long, Double, Double)] =
    events.toDF("user_id", "t", "value")
      .groupBy(window(col("t"), "1 hour").as("w"), col("user_id").as("u"))
      .agg(sum(Stats.cents(col("value"))).as("yu"))
      .join(profile.toDF("u", "xu"), Seq("u"), "left")
      .withColumn("xu", coalesce(col("xu"), lit(0L)))
      .withColumn("variant", pmod(col("u"), lit(2)).cast("int"))
      .groupBy(col("w"), col("variant"))
      .agg(count(lit(1)).as("nv"), sum(col("xu")).as("sxv"),
        sum(col("yu")).as("syv"))
      .select(col("w.start").cast("long").as("b"), col("variant"),
        col("nv"),
        Stats.cupedRawMean(col("syv"), col("nv")).as("raw"),
        Stats.cupedAdjustedMean(col("syv"), col("sxv"), col("nv"),
          lit(theta), lit(meanX)).as("adj"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap

  private def run(batches: Seq[Seq[(Long, Timestamp, BigDecimal)]])
      : Map[(Long, Int), (Long, Double, Double)] = {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, java.math.BigDecimal)]
    val name = s"cuped_out_${System.nanoTime()}"
    val q = CupedStream.windowedMeans(
        in.toDF().toDF("user_id", "t", "value"),
        "user_id", "value", "t", profile.toDF("u", "xu"),
        theta, meanX, delay = "0 seconds")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        in.addData(b.map(r => (r._1, r._2, r._3.bigDecimal)): _*)
        q.processAllAvailable()
      }
      in.addData((99L, ts("2024-01-02 00:00:00"),
        new java.math.BigDecimal("0.00")))
      q.processAllAvailable()
      spark.table(name)
        .where(col("bucket") < ts("2024-01-01 12:00:00"))
        .collect().map { r =>
          (r.getAs[Timestamp]("bucket").getTime / 1000L, r.getAs[Int]("variant")) ->
            ((r.getAs[Long]("n_users"), r.getAs[Double]("mean_raw"),
              r.getAs[Double]("mean_cuped")))
        }.toMap
    } finally q.stop()
  }

  test("closed windows equal the batch apply; split-invariant") {
    val want = batchReference
    assert(want.size === 6) // 3 hours × 2 variants
    val whole = run(Seq(events))
    assert(whole === want, s"got $whole\nwant $want")
    assert(run(events.grouped(71).toSeq) === want)
  }

  test("adjustment moves means toward each other on a spend-biased split") {
    // raw means differ strongly by arm (odd users spend more here);
    // the frozen profile carries the same bias, so adjusted gaps shrink
    val want = batchReference
    val gaps = want.keys.map(_._1).toSeq.distinct.map { b =>
      val raw = math.abs(want((b, 0))._2 - want((b, 1))._2)
      val adj = math.abs(want((b, 0))._3 - want((b, 1))._3)
      (raw, adj)
    }
    assert(gaps.forall { case (raw, adj) => adj < raw },
      s"CUPED must shrink the covariate-explained gap: $gaps")
  }
}
