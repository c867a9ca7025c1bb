package graft

import java.sql.Timestamp

/** Laws for stat_tail_index (Hill estimator): a planted Pareto(α) tail
  * is recovered within estimator noise, heavier tails give smaller α̂,
  * and the all-ties degenerate yields null (zero log-spacing). */
class TailIndexSpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  private def writeEvents(dir: String, groups: Map[String, Seq[Double]]): Unit = {
    val rows = groups.toSeq.flatMap { case (t, vs) =>
      vs.zipWithIndex.map { case (v, i) =>
        (t.hashCode.toLong * 1000000 + i, new Timestamp(base + i * 1000L),
          i.toLong, t, v, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
  }

  /** deterministic Pareto(alpha) draws: x = 10/u^(1/alpha), u uniform */
  private def pareto(alpha: Double, n: Int, seed: Long): Seq[Double] = {
    var state = seed
    (0 until n).map { _ =>
      state = state * 6364136223846793005L + 1442695040888963407L
      val u = ((state >>> 11).toDouble / (1L << 53).toDouble) max 1e-9
      // 2dp truncation: the cents cast must not distort the tail, so
      // keep the scale high enough that rounding is relative noise
      math.rint(10.0 / math.pow(u, 1.0 / alpha) * 100) / 100.0
    }
  }

  test("planted Pareto tails recovered; heavier tail gives smaller alpha") {
    val groups = Map(
      "a15" -> pareto(1.5, 5000, 42L),
      "a30" -> pareto(3.0, 5000, 99L))
    val dir = java.nio.file.Files.createTempDirectory("hill").toString
    try {
      writeEvents(dir, groups)
      val got = SparkEntry.queries("stat_tail_index")(spark, dir)
        .collect().map(r => r.getAs[String]("event_type") ->
          r.getAs[Double]("alpha")).toMap
      assert(math.abs(got("a15") - 1.5) < 0.5, s"a15 -> ${got("a15")}")
      assert(math.abs(got("a30") - 3.0) < 1.0, s"a30 -> ${got("a30")}")
      assert(got("a15") < got("a30"))
    } finally rmdirAll(new java.io.File(dir))
  }

  test("all-equal values: zero log spacing, alpha null") {
    val dir = java.nio.file.Files.createTempDirectory("hill_deg").toString
    try {
      writeEvents(dir, Map("flat" -> Seq.fill(300)(25.0)))
      val row = SparkEntry.queries("stat_tail_index")(spark, dir)
        .collect().head
      assert(row.getAs[Long]("k") === 100L)
      assert(row.isNullAt(row.fieldIndex("alpha")))
    } finally rmdirAll(new java.io.File(dir))
  }
}
