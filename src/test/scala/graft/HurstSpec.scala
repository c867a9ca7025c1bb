package graft

import java.sql.Timestamp

import graft.ops.TimeSeries

/** Laws for TimeSeries.hurst (ts_hurst): the three canonical regimes —
  * white noise ≈ 0.5, a deterministic trend → 1 (within-block R/S
  * grows linearly in m), strict alternation → ~0 (R bounded while sd
  * stays constant) — plus block accounting and the constant-series
  * drop. */
class HurstSpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  private def series(key: String, counts: Seq[Int]) =
    counts.zipWithIndex.flatMap { case (n, h) =>
      Seq.fill(n)((key, new Timestamp(base + h * 3600000L), 1.0))
    }

  private def run(counts: Seq[Int]) = {
    val df = series("a", counts).toDF("k", "ts", "value")
    TimeSeries.hurst(df, "k", "ts").collect().head
  }

  test("white noise sits near H = 0.5") {
    var state = 24681357L
    def lcg(): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      math.abs((state >>> 33).toInt % 20)
    }
    val r = run((0 until 640).map(_ => 50 + lcg()))
    assert(r.getAs[Long]("nb8") === 80L)
    assert(r.getAs[Long]("nb64") === 10L)
    val h = r.getAs[Double]("hurst")
    assert(math.abs(h - 0.5) < 0.15, s"hurst = $h")
  }

  test("deterministic trend drives H to 1") {
    val r = run((0 until 512).map(t => 10 + t))
    val h = r.getAs[Double]("hurst")
    assert(h > 0.9, s"hurst = $h")
  }

  test("strict alternation is maximally anti-persistent") {
    val r = run((0 until 512).map(t => 50 + 10 * (t % 2)))
    val h = r.getAs[Double]("hurst")
    assert(h < 0.2, s"hurst = $h")
  }

  private def runPerm(counts: Seq[Int]) = {
    val df = series("p", counts).toDF("k", "ts", "value")
      .withColumnRenamed("k", "event_type")
    val dir = java.nio.file.Files.createTempDirectory("perm").toString
    try {
      df.select(
        org.apache.spark.sql.functions.monotonically_increasing_id()
          .as("event_id"),
        org.apache.spark.sql.functions.col("ts"),
        org.apache.spark.sql.functions.lit(1L).as("user_id"),
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("value"),
        org.apache.spark.sql.functions.lit("{}").as("props"))
        .write.parquet(s"$dir/events.parquet")
      SparkEntry.queries("ts_permentropy")(spark, dir).collect().head
    } finally rmdirAll(new java.io.File(dir))
  }

  test("permutation entropy: ramp visits one pattern, noise near log2(6)") {
    // strictly increasing ramp: every triple is the identity pattern
    val ramp = runPerm((1 to 200).map(identity))
    assert(ramp.getAs[Long]("n_patterns") === 1L)
    assert(ramp.getAs[Double]("perm_entropy") === 0.0)
    // white noise: all 6 patterns, entropy near the 2.585 ceiling
    var state = 31415L
    def lcg(): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      math.abs((state >>> 33).toInt % 50)
    }
    val noise = runPerm((0 until 600).map(_ => 10 + lcg()))
    assert(noise.getAs[Long]("n_patterns") === 6L)
    assert(noise.getAs[Double]("norm_entropy") > 0.95)
    // strict alternation: exactly two patterns, one bit
    val alt = runPerm((0 until 200).map(t => 10 + 5 * (t % 2)))
    assert(alt.getAs[Long]("n_patterns") === 2L)
    assert(math.abs(alt.getAs[Double]("perm_entropy") - 1.0) < 0.01)
  }

  test("constant series: zero-variance blocks drop, hurst null") {
    val r = run(Seq.fill(256)(7))
    Seq("nb8", "nb16", "nb32", "nb64").foreach(c =>
      assert(r.getAs[Long](c) === 0L, s"$c must be 0"))
    assert(r.isNullAt(r.fieldIndex("hurst")))
  }
}
