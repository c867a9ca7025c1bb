package graft

import java.sql.Timestamp

/** Laws for ev_entropy_rate: a deterministic cycle carries 0 bits, a
  * uniform coin 1 bit, and normalization lands on [0, 1]. */
class EntropyRateSpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  private def writeEvents(dir: String, streams: Seq[Seq[String]]): Unit = {
    val rows = streams.zipWithIndex.flatMap { case (types, u) =>
      types.zipWithIndex.map { case (t, i) =>
        (u * 100000L + i, new Timestamp(base + i * 1000L), u.toLong, t,
          1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
  }

  private def run(dir: String) =
    SparkEntry.queries("ev_entropy_rate")(spark, dir).collect().head

  test("deterministic cycle: zero bits") {
    val dir = java.nio.file.Files.createTempDirectory("ent_cycle").toString
    try {
      val cycle = (0 until 90).map(i => Seq("a", "b", "c")(i % 3))
      writeEvents(dir, Seq.fill(4)(cycle))
      val r = run(dir)
      assert(r.getAs[Long]("n_states") === 3L)
      assert(r.getAs[Double]("entropy_rate") === 0.0)
    } finally rmdirAll(new java.io.File(dir))
  }

  test("uniform coin: one bit, norm_entropy 1") {
    val dir = java.nio.file.Files.createTempDirectory("ent_coin").toString
    try {
      // balanced transition counts: every (s, t) pair equally often —
      // the de Bruijn-ish repetition aabb gives each of the 4 pairs
      // once per period
      val coin = (0 until 400).map(i => Seq("h", "h", "t", "t")(i % 4))
      writeEvents(dir, Seq(coin))
      val r = run(dir)
      assert(r.getAs[Long]("n_states") === 2L)
      val h = r.getAs[Double]("entropy_rate")
      assert(math.abs(h - 1.0) < 0.01, s"entropy = $h")
      assert(math.abs(r.getAs[Double]("norm_entropy") - 1.0) < 0.01)
    } finally rmdirAll(new java.io.File(dir))
  }
}
