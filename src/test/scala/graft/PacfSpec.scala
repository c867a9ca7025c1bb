package graft

import java.sql.Timestamp

import graft.ops.TimeSeries

/** Laws for TimeSeries.pacf (ts_pacf): differential against a BigInt
  * reference implementation of the exact-moment ACF + Durbin–Levinson
  * chain, the AR(1) cutoff property the statistic exists to detect,
  * and the constant-series null guard. */
class PacfSpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  private def series(key: String, counts: Seq[Int]) =
    counts.zipWithIndex.flatMap { case (n, h) =>
      Seq.fill(n)((key, new Timestamp(base + h * 3600000L), 1.0))
    }

  /** The query's own arithmetic, replayed in BigInt + JVM doubles. */
  private def refPacf(xs: Seq[Int]): (Seq[Double], Seq[Double]) = {
    val n = BigInt(xs.length)
    val s = BigInt(xs.map(_.toLong).sum)
    val sxx = xs.map(x => BigInt(x) * BigInt(x)).sum
    val den = n * sxx - s * s
    def rho(l: Int): Double = {
      val sxy = (0 until xs.length - l)
        .map(t => BigInt(xs(t)) * BigInt(xs(t + l))).sum
      val sh = BigInt(xs.dropRight(l).map(_.toLong).sum)
      val st = BigInt(xs.drop(l).map(_.toLong).sum)
      val num = n * n * sxy - n * s * (sh + st) + (n - l) * s * s
      num.toDouble / den.toDouble / n.toDouble
    }
    val (r1, r2, r3) = (rho(1), rho(2), rho(3))
    val v1 = 1.0 - r1 * r1
    val phi22 = (r2 - r1 * r1) / v1
    val phi21 = r1 - phi22 * r1
    val v2 = v1 * (1.0 - phi22 * phi22)
    val phi33 = (r3 - phi21 * r2 - phi22 * r1) / v2
    (Seq(r1, r2, r3), Seq(r1, phi22, phi33))
  }

  private def round6(x: Double) = math.round(x * 1e6) / 1e6

  test("differential: query output equals the BigInt reference chain") {
    // deterministic LCG noise around a drifting level — nontrivial
    // autocorrelation at several lags
    var state = 12345L
    def lcg(): Int = {
      state = (state * 6364136223846793005L + 1442695040888963407L)
      math.abs((state >>> 33).toInt % 10)
    }
    val counts = (0 until 400).map(h => 20 + (h % 7) + lcg())
    val df = series("a", counts).toDF("k", "ts", "value")
    val row = TimeSeries.pacf(df, "k", "ts").collect().head
    val (rs, ps) = refPacf(counts)
    assert(row.getAs[Long]("n_hours") === 400L)
    assert(row.getAs[Double]("r1") === round6(rs.head))
    assert(row.getAs[Double]("r2") === round6(rs(1)))
    assert(row.getAs[Double]("r3") === round6(rs(2)))
    assert(row.getAs[Double]("pacf2") === round6(ps(1)))
    assert(row.getAs[Double]("pacf3") === round6(ps(2)))
  }

  test("AR(1) cutoff: pacf1 near the coefficient, pacf2/pacf3 near zero") {
    // x_t = 0.7 x_{t-1} + noise, integerized with a +50 floor
    var state = 987654321L
    def noise(): Double = {
      state = (state * 6364136223846793005L + 1442695040888963407L)
      ((state >>> 33).toInt % 1000) / 1000.0 - 0.5
    }
    var x = 0.0
    val counts = (0 until 800).map { _ =>
      x = 0.7 * x + noise() * 10
      (50 + x).round.toInt
    }
    val df = series("ar", counts).toDF("k", "ts", "value")
    val row = TimeSeries.pacf(df, "k", "ts").collect().head
    assert(math.abs(row.getAs[Double]("pacf1") - 0.7) < 0.1,
      s"pacf1 = ${row.getAs[Double]("pacf1")}")
    assert(math.abs(row.getAs[Double]("pacf2")) < 0.12)
    assert(math.abs(row.getAs[Double]("pacf3")) < 0.12)
    // and ACF does NOT cut off: r2 ~ phi^2 is clearly nonzero
    assert(row.getAs[Double]("r2") > 0.25)
  }

  test("Ljung-Box: AR(1) rejects whiteness, noise does not, Q matches the rho chain") {
    var state = 987654321L
    def noise(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      ((state >>> 33).toInt % 1000) / 1000.0 - 0.5
    }
    var x = 0.0
    val ar = (0 until 800).map { _ =>
      x = 0.7 * x + noise() * 10
      (50 + x).round.toInt
    }
    val qAr = TimeSeries.ljungBox(
      series("a", ar).toDF("k", "ts", "value"), "k", "ts").collect().head
    assert(qAr.getAs[Double]("q_lb") > 100.0,
      s"AR(1) must reject whiteness: ${qAr.getAs[Double]("q_lb")}")
    // the Q formula is exactly the published chain over this row's rho's
    val (n, r1, r2, r3) = (qAr.getAs[Long]("n_hours").toDouble,
      qAr.getAs[Double]("r1"), qAr.getAs[Double]("r2"),
      qAr.getAs[Double]("r3"))
    val qRef = n * (n + 2) *
      (r1 * r1 / (n - 1) + r2 * r2 / (n - 2) + r3 * r3 / (n - 3))
    assert(math.abs(qAr.getAs[Double]("q_lb") - qRef) < 0.01)

    var s2 = 2468L
    def lcg(): Int = {
      s2 = s2 * 6364136223846793005L + 1442695040888963407L
      math.abs((s2 >>> 33).toInt % 20)
    }
    val white = (0 until 800).map(_ => 40 + lcg())
    val qW = TimeSeries.ljungBox(
      series("w", white).toDF("k", "ts", "value"), "k", "ts").collect().head
    assert(qW.getAs[Double]("q_lb") < 12.0, // chi2(3) far tail
      s"white noise must not reject hard: ${qW.getAs[Double]("q_lb")}")
  }

  test("constant series: all correlations null (variance guard)") {
    val df = series("c", Seq.fill(50)(9)).toDF("k", "ts", "value")
    val row = TimeSeries.pacf(df, "k", "ts").collect().head
    Seq("r1", "r2", "r3", "pacf1", "pacf2", "pacf3").foreach(c =>
      assert(row.isNullAt(row.fieldIndex(c)), s"$c must be null"))
  }
}
