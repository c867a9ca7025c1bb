package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.KsDriftStream

/** Windowed KS drift monitor: a frozen window reproduces the shared
  * [[KsDriftStream.ksNumAgainst]] kernel evaluated in batch over the
  * same rows (stream ≡ batch), a same-distribution window does not
  * alarm, a shifted window does, and out-of-range mass clamps into the
  * boundary bin (still detected). */
class KsDriftStreamSpec extends SparkSpec {
  import spark.implicits._

  test("referenceFrom builds a dense ascending histogram with zero bins") {
    val hist = Seq(1.50, 1.75, 3.20, 3.90).map(v => (1L, v))
      .toDF("id", "value")
    val ref = KsDriftStream.referenceFrom(hist, "value")
    assert(ref.map(_._1) === Seq(1L, 2L, 3L)) // dense, bin 2 present
    assert(ref.toMap === Map(1L -> 2L, 2L -> 0L, 3L -> 2L))
  }

  test("one frozen window reproduces the batch kernel; drift laws hold") {
    // reference: values uniform over $10..$19 (one per dollar bin ×20)
    val hist = (0 until 200).map(i => (i.toLong, 10.0 + (i % 10)))
      .toDF("id", "value")
    val ref = KsDriftStream.referenceFrom(hist, "value")

    val t0 = ts("2024-01-01 00:10:00")
    val t1 = ts("2024-01-01 01:10:00")
    val t2 = ts("2024-01-01 02:10:00")
    val same = (0 until 100).map(i => (t0, 10.0 + (i % 10)))
    val shifted = (0 until 100).map(i => (t1, 15.0 + (i % 10))) // half out-of-range
    val rows = same ++ shifted

    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Double)]
    val q = KsDriftStream.windowedKs(
        in.toDF().toDF("ts", "value"), "ts", "value", ref,
        windowDur = "1 hour", delay = "1 minute")
      .writeStream.format("memory").queryName("ks_out")
      .outputMode("append").start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      in.addData((ts("2024-01-01 04:00:00"), 10.0))
      q.processAllAvailable()
      val got = spark.table("ks_out")
        .collect().map(r => r.getTimestamp(0) -> r).toMap

      // batch replay of each window through the SAME kernel
      val refTotal = ref.map(_._2).sum
      val lo = ref.map(_._1).min; val hi = ref.map(_._1).max
      val batch = rows.toDF("ts", "value")
        .select(col("ts"),
          least(greatest(((col("value").cast("decimal(18,2)") * 100)
            .cast("long") / 100L).cast("long"), lit(lo)), lit(hi))
            .as("bin"))
        .groupBy(col("ts"), col("bin")).agg(count(lit(1)).as("n"))
        .groupBy(col("ts"))
        .agg(map_from_entries(sort_array(collect_list(
          struct(col("bin"), col("n"))))).as("cur"),
          sum(col("n")).as("cc"))
        .select(col("ts"),
          (round(KsDriftStream.ksNumAgainst(col("cur"), col("cc"), ref)
            .cast("double") /
            (col("cc").cast("double") * lit(refTotal.toDouble)) * 1000000)
            / 1000000).as("d"))
        .collect().map(r => r.getTimestamp(0) -> r.getDouble(1)).toMap

      val w0 = got(ts("2024-01-01 00:00:00"))
      val w1 = got(ts("2024-01-01 01:00:00"))
      assert(w0.getDouble(w0.fieldIndex("d")) === batch(t0),
        "stream D diverged from the batch kernel (same window)")
      assert(w1.getDouble(w1.fieldIndex("d")) === batch(t1),
        "stream D diverged from the batch kernel (shifted window)")
      // laws: identical distribution does not alarm; the +5 shift does
      assert(!w0.getBoolean(w0.fieldIndex("drifted")),
        s"same-distribution window must not drift (d=${w0.getDouble(w0.fieldIndex("d"))})")
      assert(w1.getBoolean(w1.fieldIndex("drifted")),
        s"shifted window must drift (d=${w1.getDouble(w1.fieldIndex("d"))})")
      assert(w1.getDouble(w1.fieldIndex("d")) >
        w0.getDouble(w0.fieldIndex("d")) + 0.2)
      val _ = t2 // silence unused (kept for readability of the timeline)
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS ks_out")
    }
  }
}
