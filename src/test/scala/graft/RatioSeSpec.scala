package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Cross-validation laws for the ratio-metric SE pair
  * (stat_delta_ratio / stat_jackknife): the two estimators are
  * DIFFERENT derivations of the same quantity (Taylor linearization
  * vs leave-one-out resampling) that must agree to O(1/n) — their
  * mutual agreement on real data is a differential test neither
  * oracle hash can provide (each hash only proves engine parity on
  * its own formula). Plus the degenerate laws: identical users have
  * zero SE under both. */
class RatioSeSpec extends SparkSpec {

  test("delta and jackknife SEs agree to O(1/n) on the test corpus") {
    val dir = sf() // sf0.001: n=75 users/variant -> expect sub-percent gap
    val delta = SparkEntry.queries("stat_delta_ratio")(spark, dir)
      .collect().map(r => r.getAs[Long]("variant") ->
        (r.getAs[Double]("r"), r.getAs[Double]("se_delta"))).toMap
    val jack = SparkEntry.queries("stat_jackknife")(spark, dir)
      .collect().map(r => r.getAs[Long]("variant") ->
        (r.getAs[Double]("r"), r.getAs[Double]("se_jack"))).toMap
    assert(delta.keySet === jack.keySet)
    delta.foreach { case (v, (rD, seD)) =>
      val (rJ, seJ) = jack(v)
      assert(rD === rJ, s"variant $v: point estimates must be identical")
      assert(seD > 0 && seJ > 0)
      val gap = math.abs(seD - seJ) / seD
      assert(gap < 0.02,
        s"variant $v: delta $seD vs jackknife $seJ (rel gap $gap)")
    }
  }

  test("identical users: both SEs are exactly zero") {
    // 20 users, each with the same (x, y): R_i == R for every i, all
    // user-level variances vanish
    val dir = java.nio.file.Files.createTempDirectory("ratio_se").toString
    try {
      import spark.implicits._
      val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      val rows = (1L to 20L).flatMap { u =>
        Seq(
          (u * 10 + 1, new Timestamp(base + u * 1000), u, "purchase", 12.5,
            "{}"),
          (u * 10 + 2, new Timestamp(base + u * 2000), u, "view", 0.0, "{}"))
      }
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      val d = SparkEntry.queries("stat_delta_ratio")(spark, dir).collect()
      val j = SparkEntry.queries("stat_jackknife")(spark, dir).collect()
      assert(d.nonEmpty && j.nonEmpty)
      d.foreach(r => assert(r.getAs[Double]("se_delta") === 0.0))
      j.foreach(r => assert(r.getAs[Double]("se_jack") === 0.0))
      // and the point estimate is the planted 12.50 / 2 events = 6.25
      d.foreach(r => assert(r.getAs[Double]("r") === 6.25))
    } finally rmdirAll(new java.io.File(dir))
  }
}
