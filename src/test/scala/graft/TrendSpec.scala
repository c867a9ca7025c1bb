package graft

import java.sql.Timestamp

/** Laws for stat_trend (Cochran–Armitage): a planted day-over-day
  * conversion drift rejects with the right sign; a flat rate does not;
  * and the statistic matches a brute-force double reference. */
class TrendSpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
  private val day = 86400000L

  /** day d gets `users` users; the first `conv(d)` of them purchase */
  private def writeEvents(dir: String, days: Int, users: Int,
                          conv: Int => Int): Unit = {
    val rows = (0 until days).flatMap { d =>
      (0 until users).map { u =>
        val t = if (u < conv(d)) "purchase" else "view"
        (d * 100000L + u, new Timestamp(base + d * day + u * 1000L),
          u.toLong, t, 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
  }

  private def refZ2(days: Int, users: Int, conv: Int => Int): Double = {
    val n = days.toLong * users
    val c = (0 until days).map(conv(_).toLong).sum
    val ssc = (0 until days).map(d => d.toLong * conv(d)).sum
    val ssn = (0 until days).map(d => d.toLong * users).sum
    val ss2n = (0 until days).map(d => d.toLong * d * users).sum
    val a = n.toDouble * ssc - c.toDouble * ssn
    val b = n.toDouble * ss2n - ssn.toDouble * ssn
    val dd = c.toDouble * (n - c)
    n * a * a / (dd * b)
  }

  test("planted rising conversion: rejects with trend_dir +1, matches reference") {
    val conv = (d: Int) => 10 + 2 * d // 10% -> 68% over 30 days of 100 users
    val dir = java.nio.file.Files.createTempDirectory("trend_up").toString
    try {
      writeEvents(dir, 30, 100, conv)
      val r = SparkEntry.queries("stat_trend")(spark, dir).collect().head
      assert(r.getAs[Long]("trend_dir") === 1L)
      val z2 = r.getAs[Double]("z2_trend")
      val ref = refZ2(30, 100, conv)
      assert(math.abs(z2 - ref) / ref < 1e-6, s"query $z2 vs ref $ref")
      assert(z2 > 100.0, s"rising trend must reject: $z2")
    } finally rmdirAll(new java.io.File(dir))
  }

  test("flat conversion: null-scale statistic") {
    val dir = java.nio.file.Files.createTempDirectory("trend_flat").toString
    try {
      writeEvents(dir, 30, 100, _ => 25)
      val r = SparkEntry.queries("stat_trend")(spark, dir).collect().head
      assert(r.getAs[Double]("z2_trend") < 1e-9) // exactly flat -> A = 0
      assert(r.getAs[Long]("trend_dir") === 0L)
    } finally rmdirAll(new java.io.File(dir))
  }
}
