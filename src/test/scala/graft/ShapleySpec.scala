package graft

import java.sql.Timestamp

/** Laws for ev_attribution_shapley: differential against a brute-force
  * Shapley over the 32-point coalition function, the efficiency
  * identity Σφ = v(full) − v(∅), and credit following the channel
  * that actually drives conversion. */
class ShapleySpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
  private val channels = Seq("view", "click", "cart", "signup", "error")

  /** users: (channel exposure set, converted) */
  private def writeEvents(dir: String, users: Seq[(Set[String], Boolean)]): Unit = {
    val rows = users.zipWithIndex.flatMap { case ((chs, conv), u) =>
      val evs = chs.toSeq.sorted.zipWithIndex.map { case (c, i) =>
        (u * 100L + i, new Timestamp(base + i * 1000L), u.toLong, c, 1.0, "{}")
      }
      val p = if (conv)
        Seq((u * 100L + 99, new Timestamp(base + 99000L), u.toLong,
          "purchase", 5.0, "{}"))
      else Seq.empty
      evs ++ p
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
  }

  private def refShapley(users: Seq[(Set[String], Boolean)]): Map[String, Double] = {
    def mask(chs: Set[String]) =
      chs.map(c => 1 << channels.indexOf(c)).sum
    val byMask = users.groupBy(u => mask(u._1))
    val v = (0 until 32).map(m => m -> byMask.get(m).map(g =>
      g.count(_._2).toDouble / g.size).getOrElse(0.0)).toMap
    def fact(n: Int): Long = (1 to n).map(_.toLong).product
    channels.zipWithIndex.map { case (c, i) =>
      val bit = 1 << i
      val phi = (0 until 32).filter(m => (m & bit) == 0).map { m =>
        val s = Integer.bitCount(m)
        fact(s) * fact(4 - s) / 120.0 * (v(m + bit) - v(m))
      }.sum
      c -> phi
    }.toMap
  }

  test("differential vs brute force; efficiency; credit follows the driver") {
    var state = 31337L
    def lcg(mod: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      math.abs((state >>> 33).toInt % mod)
    }
    // exposure sets drawn over all channels; conversion is mostly
    // driven by 'click' (80% if clicked, 10% otherwise)
    val users = (0 until 500).map { _ =>
      val chs = channels.filter(_ => lcg(2) == 0).toSet
      val conv = if (chs("click")) lcg(10) < 8 else lcg(10) < 1
      (chs, conv)
    }
    val dir = java.nio.file.Files.createTempDirectory("shapley").toString
    try {
      writeEvents(dir, users)
      val got = SparkEntry.queries("ev_attribution_shapley")(spark, dir)
        .collect().map(r => r.getAs[String]("channel") ->
          r.getAs[Double]("shapley")).toMap
      val ref = refShapley(users)
      channels.foreach { c =>
        assert(math.abs(got(c) - ref(c)) < 1e-5,
          s"$c: query ${got(c)} vs reference ${ref(c)}")
      }
      // efficiency: sum phi = v(full) - v(empty) on the 32-point lattice
      def vOf(m: Int) = {
        val g = users.filter(u => u._1.map(c =>
          1 << channels.indexOf(c)).sum == m)
        if (g.isEmpty) 0.0 else g.count(_._2).toDouble / g.size
      }
      val eff = vOf(31) - vOf(0)
      assert(math.abs(got.values.sum - eff) < 1e-4,
        s"efficiency: ${got.values.sum} vs $eff")
      // the planted driver dominates every other channel's credit
      channels.filterNot(_ == "click").foreach(c =>
        assert(got("click") > got(c) + 0.1,
          s"click ${got("click")} must dominate $c ${got(c)}"))
    } finally rmdirAll(new java.io.File(dir))
  }
}
