package graft

import java.sql.Timestamp

/** Laws for stat_wilcoxon (paired signed-rank): differential against a
  * brute-force tie-averaged reference, a planted uniform post-period
  * lift is detected, and a symmetric null stays at null scale. */
class WilcoxonSpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
  private val hour = 3600000L

  /** user u: (preSpend, postSpend) -> two purchase events, one in each
    * half of a 100-hour window (midpoint at +50h). */
  private def writeEvents(dir: String, pairs: Seq[(Double, Double)]): Unit = {
    val rows = pairs.zipWithIndex.flatMap { case ((pre, post), u) =>
      Seq(
        (u * 10L, new Timestamp(base), u.toLong, "purchase", pre, "{}"),
        (u * 10L + 1, new Timestamp(base + 100 * hour), u.toLong,
          "purchase", post, "{}"))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
  }

  private def refZ2(ds: Seq[Long]): Double = {
    val nz = ds.filter(_ != 0)
    val n = nz.size
    val ranked = nz.map(d => (math.abs(d), d > 0)).sortBy(_._1)
    // tie-averaged ranks
    val ranks = scala.collection.mutable.ArrayBuffer[Double]()
    var i = 0
    while (i < n) {
      var j = i
      while (j < n && ranked(j)._1 == ranked(i)._1) j += 1
      val avg = (i + 1 + j) / 2.0
      (i until j).foreach(_ => ranks += avg)
      i = j
    }
    val wPlus = ranked.zip(ranks).filter(_._1._2).map(_._2).sum
    val ties = nz.groupBy(math.abs).values.map(_.size.toLong)
    val t3 = ties.map(t => t * t * t - t).sum
    val a = wPlus - n * (n + 1) / 4.0
    val varW = n.toDouble * (n + 1) * (2 * n + 1) / 24.0 - t3 / 48.0
    a * a / varW
  }

  test("differential vs brute force on mixed signed differences") {
    var state = 4242L
    def lcg(mod: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      math.abs((state >>> 33).toInt % mod)
    }
    val pairs = (0 until 400).map { _ =>
      (10.0 + lcg(2000) / 100.0, 10.0 + lcg(2000) / 100.0)
    }
    val dir = java.nio.file.Files.createTempDirectory("wilc").toString
    try {
      writeEvents(dir, pairs)
      val row = SparkEntry.queries("stat_wilcoxon")(spark, dir)
        .collect().head
      val ds = pairs.map { case (pre, post) =>
        math.round(post * 100) - math.round(pre * 100)
      }
      val ref = refZ2(ds)
      val z2 = row.getAs[Double]("z2")
      assert(math.abs(z2 - ref) < 1e-4, s"query $z2 vs reference $ref")
      assert(z2 < 4.0, s"symmetric null should not reject: $z2")
    } finally rmdirAll(new java.io.File(dir))
  }

  test("planted post-period lift rejects decisively") {
    var state = 808L
    def lcg(mod: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      math.abs((state >>> 33).toInt % mod)
    }
    // every user spends ~2 more after the midpoint, on top of noise
    val pairs = (0 until 300).map { _ =>
      val basev = 20.0 + lcg(1000) / 100.0
      (basev, basev + 2.0 + lcg(100) / 100.0)
    }
    val dir = java.nio.file.Files.createTempDirectory("wilc_lift").toString
    try {
      writeEvents(dir, pairs)
      val row = SparkEntry.queries("stat_wilcoxon")(spark, dir)
        .collect().head
      assert(row.getAs[Long]("n_pairs") === 300L)
      val z2 = row.getAs[Double]("z2")
      assert(z2 > 100.0, s"uniform lift must reject: z2 = $z2")
    } finally rmdirAll(new java.io.File(dir))
  }
}
