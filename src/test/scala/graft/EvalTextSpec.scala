package graft

import org.apache.spark.sql.functions._

import graft.ops.{GraphOps, TextAnalysis, TimeSeries}

/** Laws for the generation-eval kernel (clipped n-gram overlap → BLEU /
  * ROUGE), the ACF fold, and the exact-bin degree histogram. */
class EvalTextSpec extends SparkSpec {
  import spark.implicits._

  private def overlap(rows: Seq[(Long, String, String)]) =
    TextAnalysis.pairNgramOverlap(
      rows.toDF("id", "cand", "rtext"), "id", "cand", "rtext")
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap

  test("identical texts clip fully; disjoint texts clip to zero") {
    val m = overlap(Seq(
      (1L, "a b c d", "a b c d"),
      (2L, "a b c d", "x y z w")))
    // (id, c1, r1, c2, r2, clip1, clip2)
    assert(m(1L) === ((1L, 4L, 4L, 3L, 3L, 4L, 3L)))
    assert(m(2L) === ((2L, 4L, 4L, 3L, 3L, 0L, 0L)))
  }

  test("clipping is the BLEU rule: repeated candidate tokens cap at reference count") {
    // candidate says "the" 4x, reference has it 2x -> unigram clip 2, not 4
    val m = overlap(Seq((1L, "the the the the", "the cat the mat")))
    val (_, c1, _, c2, _, clip1, clip2) = m(1L)
    assert(c1 === 4L && clip1 === 2L)
    // candidate bigrams: "the the" x3; reference has none
    assert(c2 === 3L && clip2 === 0L)
  }

  test("one-token docs produce zero bigrams (no descending-sequence fabrication)") {
    val m = overlap(Seq((1L, "a", "a")))
    assert(m(1L) === ((1L, 1L, 1L, 0L, 0L, 1L, 0L)))
  }

  test("overlap is order-insensitive for unigrams, order-sensitive for bigrams") {
    val m = overlap(Seq(
      (1L, "a b c", "c b a"),   // same bag, reversed order
      (2L, "a b c", "a b c")))
    assert(m(1L)._6 === 3L, "unigram clip ignores order")
    assert(m(1L)._7 === 0L, "no shared bigrams in reversed text")
    assert(m(2L)._7 === 2L)
  }

  test("ACF of a perfectly periodic series peaks at its period") {
    // 2 events in even hours, 1 in odd hours, over 4 days: period-2
    // series -> r(lag 2) = +1, r(lag 1) = -1 (alternating)
    val rows = for {
      h <- 0 until 96
      i <- 0 until (if (h % 2 == 0) 2 else 1)
    } yield (new java.sql.Timestamp(1700000000000L + h * 3600000L + i), "e", 1.0)
    val acf = TimeSeries.autocorrelation(
      rows.toDF("ts", "event_type", "value"), "event_type", "ts", maxLag = 4)
      .select(col("lag"), col("r")).as[(Long, Double)].collect().toMap
    assert(math.abs(acf(2L) - 1.0) < 1e-4, s"period-2 must give r(2)=1: $acf")
    assert(acf(1L) < -0.99, s"alternating must give r(1)=-1: $acf")
    assert(math.abs(acf(4L) - 1.0) < 1e-4)
  }

  test("Theil-Sen slope ignores a spike that would drag the OLS slope") {
    // ramp: n = h+1 events in hour h (slope exactly 1)... plus one
    // 50-event spike hour. The median pairwise slope stays 1.
    val rows = for {
      h <- 0 until 48
      n = if (h == 20) 50 else h + 1
      i <- 0 until n
    } yield (new java.sql.Timestamp(1700000000000L + h * 3600000L + i), "e", 1.0)
    val got = TimeSeries.theilSen(
      rows.toDF("ts", "event_type", "value"), "event_type", "ts", maxLag = 12)
      .select(col("slope_med")).as[Double].head()
    assert(got === 1.0, s"median slope must shrug the spike off: $got")
  }

  test("degree histogram bins are exact powers of two") {
    // star: hub 0 connected to 1..9 (degree 9 -> bin 4), leaves degree 1
    // -> bin 1
    val pairs = (1L to 9L).map(i => (0L, i))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val bins = GraphOps.degreeHistogram(edges)
      .select(col("bin"), col("n_nodes"), col("min_deg"), col("max_deg"))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(bins(1L) === ((1L, 9L, 1L, 1L)), s"nine degree-1 leaves: $bins")
    assert(bins(4L) === ((4L, 1L, 9L, 9L)), s"one degree-9 hub: $bins")
  }

  test("chrF kernel: identical texts give chrf2 = 1 via the rational form") {
    val m = TextAnalysis.pairCharBigramOverlap(
      Seq((1L, "ab cd", "ab cd"), (2L, "abcd", "wxyz")).toDF("id", "cand", "rtext"),
      "id", "cand", "rtext")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // "ab cd" strips to "abcd": 3 char-bigrams, all clipped
    assert(m(1L) === ((1L, 3L, 3L, 3L)))
    // 5*clip/(4*r2+c2) = 5*3/15 = 1.0 exactly
    assert(m(2L)._4 === 0L, "disjoint char sets share no bigrams")
  }

  test("pair overlap plans without cartesian products") {
    val df = TextAnalysis.pairNgramOverlap(
      Seq((1L, "a b", "b c")).toDF("id", "cand", "rtext"),
      "id", "cand", "rtext")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("zipfSlope: a planted 1/rank corpus fits slope -1, intercept ln(top)") {
    // token w<i> appears floor(1200/i) times — exact Zipf with s = 1.
    // One doc per occurrence keeps the fixture trivially tokenizable.
    val docs = (1 to 30).flatMap { i =>
      val n = 1200 / i
      (1 to n).map(j => (i * 10000L + j, s"w$i"))
    }.toDF("doc_id", "text")
    val r = TextAnalysis.zipfSlope(docs, "text", k = 30).collect()(0)
    assert(r.getLong(0) === 30L)
    // floor() quantization wiggles the fit slightly around -1
    assert(math.abs(r.getDouble(1) - (-1.0)) < 0.01, r.getDouble(1))
    assert(math.abs(r.getDouble(2) - math.log(1200.0)) < 0.02, r.getDouble(2))
  }
}
