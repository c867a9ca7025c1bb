package graft

import org.apache.spark.sql.functions._
import graft.ops.{Multimodal, TimeSeries}

/** Round-10 time-series wave: CUSUM change points, seasonal profile,
  * cross-correlation — each checked against a hand-computed sequential
  * reference (the oracle hash-checks cross-engine equality; these specs
  * check the MATH). */
class TimeSeries2Spec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (String, String, Double)*) =
    rows.toSeq.toDF("k", "t", "value")
      .select(col("k"), col("t").cast("timestamp_ntz").as("t"), col("value"))

  test("cusum closed form equals the sequential max(0,·) recursion") {
    // 12 calm hours at ~2/hour then a shift to ~20/hour: the detector
    // must accumulate after the shift and alarm; before it, stay at zero
    // (a weak shift is legitimately below the 4μ alarm bar — the
    // threshold scales with the mean the shift itself inflates).
    val counts = Seq(2, 1, 3, 2, 2, 1, 2, 3, 1, 2, 2, 3, 20, 21, 20, 22, 21, 20)
    val rows = counts.zipWithIndex.flatMap { case (c, h) =>
      (0 until c).map(i => ("a", f"2024-01-01 $h%02d:00:${i}%02d", 1.0))
    }
    val got = TimeSeries.cusum(ev(rows: _*), "k", "t")
      .orderBy("bucket").collect()
    assert(got.length == counts.length)

    // sequential replay of the scaled recursion:
    // S'ₜ = max(0, S'ₜ₋₁ + 2T·xₜ − 3Σx), alarm ⇔ S'ₜ > 8Σx
    val t = counts.length.toLong
    val sx = counts.sum.toLong
    var s = 0L
    val expected = counts.map { x =>
      s = math.max(0L, s + 2 * t * x - 3 * sx)
      (s, s > 8 * sx)
    }
    got.zip(expected).foreach { case (r, (es, ea)) =>
      assert(r.getAs[Long]("cusum_scaled") == es,
        s"bucket ${r.get(1)}: got ${r.getAs[Long]("cusum_scaled")}, want $es")
      assert(r.getAs[Boolean]("alarm") == ea)
    }
    // the shift is actually caught, and not before it happened
    val alarms = got.filter(_.getAs[Boolean]("alarm"))
      .map(_.getAs[Long]("n"))
    assert(alarms.nonEmpty && alarms.forall(_ >= 20))
  }

  test("seasonal profile: ratio is hour-mean over overall mean, exact") {
    // key a: hour 0 of two days has 4 and 2 events, hour 1 has 1 and 1
    val rows = Seq(
      ("a", "2024-01-01 00:00:00", 4), ("a", "2024-01-02 00:00:00", 2),
      ("a", "2024-01-01 01:00:00", 1), ("a", "2024-01-02 01:00:00", 1))
      .flatMap { case (k, t, c) => (0 until c).map(i => (k, t.dropRight(1) + i, 1.0)) }
    val out = TimeSeries.seasonalProfile(ev(rows: _*), "k", "t")
      .orderBy("hod").collect()
    // grid spans hours 0..25 (day1 00:00 → day2 01:00); hods 2..23 are
    // single silent buckets. overall mean = 8/26
    val hod0 = out.find(_.getAs[Int]("hod") == 0).get
    assert(hod0.getAs[Long]("n_sum") == 6L && hod0.getAs[Long]("n_buckets") == 2L)
    // ratio = (6/2)/(8/26) = 9.75
    assert(hod0.getAs[Double]("seasonal_ratio") == 9.75)
    val hod5 = out.find(_.getAs[Int]("hod") == 5).get
    assert(hod5.getAs[Double]("seasonal_ratio") == 0.0)
  }

  test("cross-correlation finds the planted lag with r = 1") {
    // y is exactly x shifted 2 hours later: r(lag=2) must be 1.0, and
    // the shared-shape series at other alignments stays below it.
    val xs = Seq(5, 1, 4, 2, 8, 3, 7, 1, 6, 2)
    val rows =
      xs.zipWithIndex.flatMap { case (c, h) =>
        (0 until c).map(i => ("x", f"2024-01-01 $h%02d:00:${i}%02d", 1.0)) } ++
      xs.zipWithIndex.flatMap { case (c, h) =>
        (0 until c).map(i => ("y", f"2024-01-01 ${h + 2}%02d:00:${i}%02d", 1.0)) }
    val out = TimeSeries.crossCorrelation(ev(rows: _*), "k", "t")
      .collect().map(r => (r.getAs[Long]("lag"), r.getAs[Any]("r"))).toMap
    assert(out(2L) == 1.0, s"planted lag should be perfect: $out")
    assert(out.keySet == Set(0L, 1L, 2L, 3L))
    Seq(0L, 1L, 3L).foreach { l =>
      val r = out(l).asInstanceOf[Double]
      assert(r < 1.0, s"lag $l should not be perfect: $r")
    }
  }

  test("holt-winters equals the sequential triple-smoothing recursion") {
    // two days of a periodic-with-trend hourly pattern (period 4 within
    // a 24-slot season exercises the rotating index; counts stay small)
    val counts = (0 until 48).map(h => 2 + (h % 4) + h / 24)
    val rows = counts.zipWithIndex.flatMap { case (c, h) =>
      val (d, hh) = (h / 24 + 1, h % 24)
      (0 until c).map(i => ("a", f"2024-01-0$d $hh%02d:00:${i}%02d", 1.0))
    }
    val got = TimeSeries.holtWinters(ev(rows: _*), "k", "t")
      .orderBy("bucket").collect()
    assert(got.length == 48)

    // sequential replay, identical op order and online init
    val (al, be, ga, m) = (0.3, 0.1, 0.3, 24)
    var (l, b) = (0.0, 0.0)
    val sHist = scala.collection.mutable.ArrayBuffer.empty[Double]
    val expected = counts.zipWithIndex.map { case (x, t) =>
      val sOld = if (t >= m) sHist(t - m) else 0.0
      val (nl, nb) =
        if (t == 0) (x.toDouble, 0.0)
        else (al * (x - sOld) + (1 - al) * (l + b),
          be * ((al * (x - sOld) + (1 - al) * (l + b)) - l) + (1 - be) * b)
      val ns = ga * (x - nl) + (1 - ga) * sOld
      l = nl; b = nb; sHist += ns
      val sNext = if (t + 1 >= m) sHist(t + 1 - m) else 0.0
      (math.round(nl * 10000) / 10000.0, math.round(nb * 10000) / 10000.0,
        math.round(ns * 10000) / 10000.0,
        math.round((nl + nb + sNext) * 10000) / 10000.0)
    }
    got.zip(expected).foreach { case (r, (el, eb, es, ef)) =>
      assert(r.getAs[Double]("level") == el, s"level @${r.get(1)}")
      assert(r.getAs[Double]("trend") == eb, s"trend @${r.get(1)}")
      assert(r.getAs[Double]("seasonal") == es, s"seasonal @${r.get(1)}")
      assert(r.getAs[Double]("forecast_next") == ef, s"forecast @${r.get(1)}")
    }
  }

  test("vad segments are maximal above-mean runs with exact energy") {
    implicit val s = spark
    // 4 frames of 64 samples each: quiet, LOUD, LOUD, quiet. int16 LE
    // little-endian bytes: value 1 → (1,0); value 100 → (100,0).
    def frame(v: Int): Array[Byte] =
      Array.fill(64)(Array(v.toByte, 0.toByte)).flatten
    val payload = frame(1) ++ frame(100) ++ frame(100) ++ frame(1)
    val media = Seq((7L, payload, "audio/pcm", "src", payload.length.toLong))
      .toDF("id", "media", "mime", "source", "n_bytes")
    val segs = Multimodal.pcmVadSegments(media).collect()
    // mean energy = (2·64 + 2·64·10⁴)/4; frames 1,2 are the single run
    assert(segs.length == 1)
    val g = segs.head
    assert(g.id == 7L && g.seg == 0 && g.f0 == 1 && g.f1 == 2)
    assert(g.n_frames == 2L && g.energy == 2L * 64 * 100 * 100)

    // an all-flat payload has no above-mean frame → no segments
    val flat = Seq((8L, frame(5) ++ frame(5), "audio/pcm", "src", 256L))
      .toDF("id", "media", "mime", "source", "n_bytes")
    assert(Multimodal.pcmVadSegments(flat).collect().isEmpty)
  }

  test("shapeCensus: identical days share a word, the odd day stands alone") {
    // days 0,1: morning burst (segment 0 hot) → word 1; day 2: evening
    // burst (segment 3 hot) → word 8. Counts per hour planted exactly.
    def dayCounts(hotSeg: Int): Seq[Long] =
      (0 until 24).map(h => if (h / 6 == hotSeg) 3L else 1L)
    val xs = dayCounts(0) ++ dayCounts(0) ++ dayCounts(3)
    val events = xs.zipWithIndex.flatMap { case (n, h) =>
      (1L to n).map(_ => ("a", f"2024-01-0${1 + h / 24}%d ${h % 24}%02d:15:00", 1.0))
    }
    val got = TimeSeries.shapeCensus(ev(events.toIndexedSeq: _*), "k", "t")
      .collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got === Map(1L -> ((2L, 0L, 1L)), 8L -> ((1L, 2L, 2L))))
  }

  test("matrixProfile matches the sequential banded reference; discord tops") {
    // period-4 hourly counts with one planted discord at hour 9
    val base = Array(3L, 1L, 2L, 1L)
    val xs = Array.tabulate(20)(h => if (h == 9) 7L else base(h % 4))
    val (sub, lo, hi) = (4, 4, 8)
    // sequential banded profile, tie order (dist2 asc, signed lag asc)
    val ref = scala.collection.mutable.Map[Int, (Long, Long)]()
    for (i <- 0 to xs.length - sub; lag <- lo to hi; if i + lag + sub <= xs.length) {
      val j = i + lag
      val d = (0 until sub).map { k =>
        val df = xs(i + k) - xs(j + k); df * df
      }.sum
      for ((p, sl) <- Seq((i, lag.toLong), (j, -lag.toLong))) {
        val better = ref.get(p).forall { case (bd, bl) =>
          d < bd || (d == bd && sl < bl) }
        if (better) ref(p) = (d, sl)
      }
    }
    val events = xs.zipWithIndex.flatMap { case (n, h) =>
      (1L to n).map(r => ("a", f"2024-01-01 $h%02d:30:00", 1.0))
    }
    val got = TimeSeries.matrixProfile(ev(events.toIndexedSeq: _*), "k", "t",
        subLen = sub, minLag = lo, maxLag = hi)
      .collect().map(r => (r.getLong(1), (r.getLong(2), r.getLong(3)))).toMap
    val h0 = got.keys.min
    assert(got.size === ref.size)
    ref.foreach { case (i, v) =>
      assert(got(h0 + i) === v, s"window $i: got ${got(h0 + i)}, want $v")
    }
    // periodic windows away from the discord are perfect motifs (mp2=0);
    // the worst window overlaps the planted discord hour
    assert(ref.collect { case (i, (0L, _)) => i }.nonEmpty)
    val worst = ref.maxBy { case (_, (d, _)) => d }._1
    assert(worst <= 9 && worst + sub > 9, s"discord window $worst")
  }

  test("mann-kendall: monotone series hits the closed form, constant gets z=0") {
    // "up": hour h carries h+1 events (h = 0..9) — strictly increasing,
    // no ties: S = C(10,2) = 45, Var(S)·18 = 10·9·25 = 2250,
    // z = (45−1)/√125. "flat": 5 events in each of 6 hours — all tied:
    // S = 0 and the tie term cancels Var(S) exactly, so z = 0.
    val rows =
      (0 until 10).flatMap(h => (0 to h).map(i =>
        ("up", f"2024-01-01 $h%02d:05:${i}%02d", 1.0))) ++
      (0 until 6).flatMap(h => (0 until 5).map(i =>
        ("flat", f"2024-01-01 $h%02d:05:${i}%02d", 1.0)))
    val got = TimeSeries.mannKendall(ev(rows: _*), "k", "t")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_buckets"), r.getAs[Long]("s"),
          r.getAs[Long]("var18"), r.getAs[Double]("z"))).toMap
    assert(got("up") == ((10L, 45L, 2250L,
      math.round(44.0 / math.sqrt(125.0) * 1e6) / 1e6)))
    assert(got("flat") == ((6L, 0L, 0L, 0.0)))
  }
}
