package graft

import java.sql.Timestamp

/** Laws for stat_levene: differential against a brute-force double
  * reference (quantization bias must stay under the 6dp grid), and the
  * detection direction — equal-variance groups keep F near its null
  * scale, a planted wide group drives F large. */
class LeveneSpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  private def writeEvents(dir: String, groups: Map[String, Seq[Double]]): Unit = {
    val rows = groups.toSeq.flatMap { case (t, vs) =>
      vs.zipWithIndex.map { case (v, i) =>
        (t.hashCode.toLong * 100000 + i, new Timestamp(base + i * 1000L),
          i.toLong, t, v, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
  }

  private def refLevene(groups: Seq[Seq[Double]]): Double = {
    val z = groups.map { g =>
      val m = g.sum / g.size
      g.map(x => math.abs(x - m))
    }
    val n = z.map(_.size).sum
    val k = z.size
    val zbar = z.flatten.sum / n
    val between = z.map(g => g.size * math.pow(g.sum / g.size - zbar, 2)).sum
    val within = z.map(g => {
      val m = g.sum / g.size; g.map(x => (x - m) * (x - m)).sum
    }).sum
    (between / (k - 1)) / (within / (n - k))
  }

  test("differential vs brute force; planted heteroscedasticity detected") {
    var state = 55555L
    def lcg(mod: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      math.abs((state >>> 33).toInt % mod)
    }
    // three tight groups + one wide one (10x the spread)
    val tight = (1 to 3).map(g =>
      s"g$g" -> (0 until 200).map(_ => 100.0 + lcg(500) / 100.0)).toMap
    val wide = Map("g4" -> (0 until 200).map(_ => 100.0 + lcg(5000) / 100.0))
    val groups = tight ++ wide
    val dir = java.nio.file.Files.createTempDirectory("levene").toString
    try {
      writeEvents(dir, groups)
      val row = SparkEntry.queries("stat_levene")(spark, dir).collect().head
      val f = row.getAs[Double]("f_levene")
      val ref = refLevene(groups.values.toSeq)
      assert(math.abs(f - ref) / ref < 1e-4,
        s"query $f vs reference $ref")
      // 1 group 10x wider among 4: decisively non-homogeneous
      assert(f > 50.0, s"f_levene = $f should flag the wide group")
    } finally rmdirAll(new java.io.File(dir))
  }

  private def refBrownForsythe(groups: Seq[Seq[Double]]): Double = {
    def median(g: Seq[Double]): Double = {
      val s = g.sorted
      (s((g.size - 1) / 2) + s(g.size / 2)) / 2
    }
    val z = groups.map { g => val m = median(g); g.map(x => math.abs(x - m)) }
    val n = z.map(_.size).sum
    val k = z.size
    val zbar = z.flatten.sum / n
    val between = z.map(g => g.size * math.pow(g.sum / g.size - zbar, 2)).sum
    val within = z.map(g => {
      val m = g.sum / g.size; g.map(x => (x - m) * (x - m)).sum
    }).sum
    (between / (k - 1)) / (within / (n - k))
  }

  test("Brown-Forsythe: differential vs brute force; detects the wide group") {
    var state = 13131L
    def lcg(mod: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      math.abs((state >>> 33).toInt % mod)
    }
    val tight = (1 to 3).map(g =>
      s"g$g" -> (0 until 200).map(_ => 100.0 + lcg(500) / 100.0)).toMap
    val wide = Map("g4" -> (0 until 200).map(_ => 100.0 + lcg(5000) / 100.0))
    val groups = tight ++ wide
    val dir = java.nio.file.Files.createTempDirectory("bf").toString
    try {
      writeEvents(dir, groups)
      val row = SparkEntry.queries("stat_levene_bf")(spark, dir)
        .collect().head
      val f = row.getAs[Double]("f_bf")
      val ref = refBrownForsythe(groups.values.toSeq)
      assert(math.abs(f - ref) / ref < 1e-4, s"query $f vs reference $ref")
      assert(f > 50.0, s"f_bf = $f should flag the wide group")
    } finally rmdirAll(new java.io.File(dir))
  }

  test("robustness: one extreme outlier inflates mean-Levene far more than BF") {
    var state = 999L
    def lcg(mod: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      math.abs((state >>> 33).toInt % mod)
    }
    // equal-variance groups, then one 1000x outlier dropped into g1
    val clean = (1 to 3).map(g =>
      s"g$g" -> (0 until 300).map(_ => 50.0 + lcg(400) / 100.0)).toMap
    val groups = clean.updated("g1", clean("g1") :+ 50000.0)
    val dir = java.nio.file.Files.createTempDirectory("bf_rob").toString
    try {
      writeEvents(dir, groups)
      val fMean = SparkEntry.queries("stat_levene")(spark, dir)
        .collect().head.getAs[Double]("f_levene")
      val fBf = SparkEntry.queries("stat_levene_bf")(spark, dir)
        .collect().head.getAs[Double]("f_bf")
      // the outlier shifts g1's MEAN, inflating every member's mean-z;
      // the median barely moves, so BF sees one large z, not 301
      assert(fMean > 2 * fBf,
        s"mean-Levene $fMean should exceed BF $fBf by the robustness gap")
    } finally rmdirAll(new java.io.File(dir))
  }

  test("equal-variance groups: F stays at null scale") {
    var state = 777L
    def lcg(mod: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      math.abs((state >>> 33).toInt % mod)
    }
    // same spread, different means (Levene must ignore mean shifts)
    val groups = (1 to 4).map(g =>
      s"g$g" -> (0 until 300).map(_ => g * 50.0 + lcg(400) / 100.0)).toMap
    val dir = java.nio.file.Files.createTempDirectory("levene_eq").toString
    try {
      writeEvents(dir, groups)
      val row = SparkEntry.queries("stat_levene")(spark, dir).collect().head
      val f = row.getAs[Double]("f_levene")
      assert(f < 3.0, s"f_levene = $f should not flag equal variances")
    } finally rmdirAll(new java.io.File(dir))
  }
}
