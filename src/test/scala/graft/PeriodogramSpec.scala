package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.ops.TimeSeries

/** Laws for TimeSeries.periodogram (ts_periodogram): the oracle hash
  * proves engine parity on the real tables; these pin the SEMANTICS —
  * a planted pure daily sinusoid is recovered with its amplitude and
  * strength ≈ 1 at period 24 (and ≈ 0 at 168), a constant series
  * yields null strengths, and the trig tables are exact endpoints. */
class PeriodogramSpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  /** one row per event; hour h gets `counts(h)` events */
  private def series(key: String, counts: Seq[Int]) =
    counts.zipWithIndex.flatMap { case (n, h) =>
      Seq.fill(n)((key, new Timestamp(base + h * 3600000L), 1.0))
    }

  test("planted daily sinusoid: amplitude and strength recovered at 24, not 168") {
    // 14 days of 100 + 40*cos(2*pi*h/24): a pure period-24 signal
    val counts = (0 until 24 * 14).map(h =>
      (100 + 40 * math.cos(2 * math.Pi * h / 24)).round.toInt)
    val df = series("a", counts).toDF("k", "ts", "value")
    val r = TimeSeries.periodogram(df, "k", "ts").collect().head
    assert(r.getAs[Long]("n_hours") === 24L * 14)
    assert(math.abs(r.getAs[Double]("amp_24") - 40.0) < 0.5,
      s"amp_24 = ${r.getAs[Double]("amp_24")}")
    assert(r.getAs[Double]("strength_24") > 0.98,
      s"strength_24 = ${r.getAs[Double]("strength_24")}")
    assert(r.getAs[Double]("strength_168") < 0.02,
      s"strength_168 = ${r.getAs[Double]("strength_168")}")
  }

  test("planted weekly sinusoid loads on 168, not 24") {
    val counts = (0 until 168 * 4).map(h =>
      (50 + 20 * math.sin(2 * math.Pi * h / 168)).round.toInt)
    val df = series("w", counts).toDF("k", "ts", "value")
    val r = TimeSeries.periodogram(df, "k", "ts").collect().head
    assert(math.abs(r.getAs[Double]("amp_168") - 20.0) < 0.5)
    assert(r.getAs[Double]("strength_168") > 0.98)
    assert(r.getAs[Double]("strength_24") < 0.02)
  }

  test("constant series: zero amplitude, null strength (variance guard)") {
    val df = series("c", Seq.fill(48)(7)).toDF("k", "ts", "value")
    val r = TimeSeries.periodogram(df, "k", "ts").collect().head
    assert(r.getAs[Double]("amp_24") === 0.0)
    assert(r.isNullAt(r.fieldIndex("strength_24")))
    assert(r.isNullAt(r.fieldIndex("strength_168")))
  }

  test("autoperiod: planted 12 h cycle detected; constant series keeps the tie row") {
    val counts = (0 until 12 * 40).map(h =>
      (80 + 30 * math.cos(2 * math.Pi * h / 12)).round.toInt)
    val df = series("p12", counts).toDF("k", "ts", "value")
    val r = TimeSeries.autoperiod(df, "k", "ts").collect().head
    assert(r.getAs[Long]("best_period") === 12L,
      s"best = ${r.getAs[Long]("best_period")}")
    assert(r.getAs[Double]("strength") > 0.95)
    // constant: every candidate's strength null -> ties break to the
    // shortest period with a null strength, key never vanishes
    val c = TimeSeries.autoperiod(
      series("c", Seq.fill(96)(5)).toDF("k", "ts", "value"), "k", "ts")
      .collect().head
    assert(c.getAs[Long]("best_period") === 6L)
    assert(c.isNullAt(c.fieldIndex("strength")))
  }

  test("trig tables: exact endpoints and micro scale") {
    assert(TimeSeries.cosMicros(24)(0) === 1000000L)
    assert(TimeSeries.cosMicros(24)(12) === -1000000L)
    assert(TimeSeries.sinMicros(24)(0) === 0L)
    assert(TimeSeries.sinMicros(24)(6) === 1000000L)
    assert(TimeSeries.cosMicros(168).length === 168)
    // strict bound: every entry within the micro unit circle
    Seq(24, 168).foreach { p =>
      TimeSeries.cosMicros(p).foreach(v => assert(math.abs(v) <= 1000000L))
      TimeSeries.sinMicros(p).foreach(v => assert(math.abs(v) <= 1000000L))
    }
  }
}
