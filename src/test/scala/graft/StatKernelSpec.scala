package graft

import graft.ops.Stats

/** Laws for the concordance (Kendall tau-b) and survival (Kaplan–Meier)
  * kernels — each checked against a sequential brute-force reference on
  * small data, plus the degenerate cases the domain-collapsed plans
  * must not mishandle (total ties, censoring, single death time). */
class StatKernelSpec extends SparkSpec {
  import spark.implicits._

  // ---- Kendall tau-b ----

  /** O(n²) reference: walk every unordered pair once. */
  private def tauRef(xs: Seq[(Long, Long)]): (Long, Long, Option[Double]) = {
    var conc = 0L; var disc = 0L
    var tx = 0L; var ty = 0L
    for (i <- xs.indices; j <- (i + 1) until xs.size) {
      val ((x1, y1), (x2, y2)) = (xs(i), xs(j))
      if (x1 != x2 && y1 != y2) {
        if ((x1 < x2) == (y1 < y2)) conc += 1 else disc += 1
      }
      if (x1 == x2) tx += 1
      if (y1 == y2) ty += 1
    }
    val n = xs.size.toLong
    val n0 = n * (n - 1) / 2
    val den = math.sqrt((n0 - tx).toDouble * (n0 - ty).toDouble)
    val tau = if (n0 > tx && n0 > ty)
      Some(math.round((conc - disc) / den * 10000) / 10000.0) else None
    (conc, disc, tau)
  }

  private def tauSpark(xs: Seq[(Long, Long)]) = {
    val r = Stats.kendallTauB(xs.toDF("x", "y"), "x", "y").collect().head
    (r.getDouble(1).toLong, r.getDouble(2).toLong,
      if (r.isNullAt(3)) None else Some(r.getDouble(3)))
  }

  test("tau-b matches the brute-force pair census on tied data") {
    // deterministic pseudo-random sample with heavy ties in both axes
    val xs = (0 until 60).map { i =>
      val h = i * 2654435761L
      (math.abs(h % 5), math.abs((h / 7) % 4))
    }
    assert(tauSpark(xs) === tauRef(xs))
  }

  test("perfect concordance gives tau=1; perfect reversal gives tau=-1") {
    val up = (1L to 20L).map(i => (i, i * 3))
    val dn = (1L to 20L).map(i => (i, 100 - i))
    assert(tauSpark(up)._3.get === 1.0)
    assert(tauSpark(dn)._3.get === -1.0)
  }

  test("an all-tied axis yields a null tau (zero variance), not a crash") {
    val xs = (1L to 10L).map(i => (5L, i))
    val (c, d, tau) = tauSpark(xs)
    assert(c === 0L && d === 0L && tau === None)
  }

  // ---- Kaplan–Meier ----

  private def kmSpark(subs: Seq[(Long, Boolean)]) =
    Stats.kaplanMeier(subs.toDF("t", "dead"), "t", "dead")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq

  /** Sequential reference: classic product over ascending death times. */
  private def kmRef(subs: Seq[(Long, Boolean)]): Seq[(Long, Long, Long, Double)] = {
    val deathTimes = subs.filter(_._2).map(_._1).distinct.sorted
    var s = 1.0
    deathTimes.map { t =>
      val d = subs.count(u => u._2 && u._1 == t).toLong
      val n = subs.count(_._1 >= t).toLong
      s *= (1.0 - d.toDouble / n.toDouble)
      (t, d, n, math.round(s * 10000) / 10000.0)
    }
  }

  test("KM matches the sequential product reference with censoring mixed in") {
    val subs = Seq[(Long, Boolean)](
      (2L, true), (3L, false), (5L, true), (5L, true), (7L, false),
      (8L, true), (8L, false), (11L, true), (12L, false), (12L, false))
    assert(kmSpark(subs) === kmRef(subs))
  }

  test("censored subjects shrink the risk set but never drop the curve") {
    // deaths only at t=4: censored at 1,2,3 leave before it
    val subs = Seq[(Long, Boolean)](
      (1L, false), (2L, false), (3L, false), (4L, true), (4L, false))
    val out = kmSpark(subs)
    assert(out === Seq((4L, 1L, 2L, 0.5)))
  }

  test("everyone dying at one time gives survival 0 there") {
    val subs = (1 to 6).map(_ => (9L, true))
    assert(kmSpark(subs) === Seq((9L, 6L, 6L, 0.0)))
  }

  test("no observed deaths gives an empty curve (all censored)") {
    val subs = (1 to 5).map(i => (i.toLong, false))
    assert(kmSpark(subs).isEmpty)
  }

  // ---- Poisson bootstrap ----

  test("bootstrap CI replays the sequential reference; draws are layout-blind") {
    import org.apache.spark.sql.functions._
    // two groups, 200 rows each, value = a skewed deterministic pattern
    val rows = (0L until 400L).map { id =>
      val g = if (id % 2 == 0) "a" else "b"
      val v = BigDecimal((id % 13 + 1) * (if (g == "a") 1.25 else 2.5))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)
      (id, g, v)
    }
    val df = rows.toDF("event_id", "grp_col", "value")
    def run(d: org.apache.spark.sql.DataFrame) =
      Stats.poissonBootstrapCI(d, "grp_col", "value", col("event_id"), b = 40)
        .collect()
        .map(r => r.getString(0) -> ((r.getAs[Long]("n"),
          r.getAs[Double]("mean"), r.getAs[Double]("lo"),
          r.getAs[Double]("hi")))).toMap
    val got = run(df)

    // sequential reference: same md5 block/slot draws (replicate i
    // reads hex slot i%4 of digest i/4), same Poisson CASE, same
    // cents-exact sums, same ceil-index picks
    def md5u(id: Long, i: Int): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$id|${i / 4}".getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      val slot = hex.substring((i % 4) * 8, (i % 4) * 8 + 8)
      java.lang.Long.parseLong(slot, 16).toDouble / 4294967296.0
    }
    def weight(u: Double): Int =
      Stats.PoissonCum.indexWhere(u < _) match {
        case -1 => 7; case k => k
      }
    val want = rows.groupBy(_._2).map { case (g, rs) =>
      val cents = rs.map { case (id, _, v) => (id, (v * 100).toLongExact) }
      val means = (0 until 40).flatMap { i =>
        val ws = cents.map { case (id, c) => (weight(md5u(id, i)), c) }
        val sw = ws.map(_._1.toLong).sum
        if (sw == 0) None
        else Some((i, ws.map { case (w, c) => w * c }.sum.toDouble / sw))
      }
      val sorted = means.sortBy { case (i, m) => (m, i) }.map(_._2)
      val m = sorted.length
      val lo = sorted(math.max(math.ceil(m * 0.025).toInt, 1) - 1)
      val hi = sorted(math.ceil(m * 0.975).toInt - 1)
      val sx = cents.map(_._2).sum
      def r6(x: Double) = math.round(x * 1e6) / 1e6
      g -> ((rs.size.toLong, r6(sx.toDouble / rs.size / 100.0),
        r6(lo / 100.0), r6(hi / 100.0)))
    }
    assert(got == want, s"got $got\nwant $want")
    assert(got.values.forall { case (_, mean, lo, hi) =>
      lo <= mean && mean <= hi
    })
    // layout blindness: the draw hashes the id, not the partition
    assert(run(df.repartition(7)) == got)
  }

  // ---- CUPED ----

  test("cupedMeans: θ exact on a linear relation, full variance kill") {
    import org.apache.spark.sql.functions._
    // per user u: pre-period spend = u+1, post-period spend = 2(u+1) —
    // Y = 2X exactly, so pooled θ = 2, ρ² = 1, and every user's
    // adjusted Y is 2·X̄ (the grand pre-mean, doubled).
    val rows = (0L until 40L).flatMap { u =>
      Seq((u, ts("2024-01-10 00:00:00"), BigDecimal(u + 1).setScale(2)),
        (u, ts("2024-01-20 00:00:00"), BigDecimal(2 * (u + 1)).setScale(2)))
    }
    val df = rows.toDF("user_id", "ts", "value")
    def run(d: org.apache.spark.sql.DataFrame) =
      Stats.cupedMeans(d, "user_id", "value", "ts", "2024-01-15 00:00:00")
        .collect().map(r => r.getInt(0) ->
          ((r.getAs[Long]("n_users"), r.getAs[Double]("mean_raw"),
            r.getAs[Double]("mean_cuped"), r.getAs[Double]("theta"),
            r.getAs[Double]("var_reduction")))).toMap
    val got = run(df)
    // X̄ = mean(1..40) = 20.5, so both arms' adjusted mean = 41.0 —
    // CUPED removes ALL between-user spread here
    (0 to 1).foreach { v =>
      val (n, _, cuped, theta, vr) = got(v)
      assert(n === 20L)
      assert(theta === 2.0)
      assert(vr === 1.0)
      assert(cuped === 41.0)
    }
    // raw means differ by arm (odd users spend more); adjusted don't
    assert(got(0)._2 !== got(1)._2)
    assert(run(df.repartition(7)) === got) // layout-blind
  }

  // ---- SPRT ----

  test("sprtDecision replays the sequential fold; horizon → continue") {
    import org.apache.spark.sql.functions._
    // arm 0: all successes → fast accept_h1; arm 1: strict alternation
    // keeps the symmetric LLR oscillating around 0 → never decides
    val rows = (0L until 60L).map { i =>
      val arm = (i % 2).toInt
      val succ = if (arm == 0) true else (i / 2) % 2 == 0
      (i, arm, succ)
    }
    val df = rows.toDF("event_id", "arm", "succ")
    val got = Stats.sprtDecision(df, col("arm"), col("succ"),
        Seq(col("event_id")), p0 = 0.4, p1 = 0.6, horizon = 25)
      .collect().map(r => r.getInt(0) ->
        ((r.getInt(1), r.getLong(2), r.getAs[Double]("llr"),
          r.getString(4)))).toMap
    // sequential reference over the same µ-nat constants
    val (l1, l0, up, lo) = Stats.sprtMicroNats(0.4, 0.6, 0.05, 0.20)
    def ref(trials: Seq[Boolean]): (Int, Long, Double, String) = {
      var s = 0L
      trials.take(25).zipWithIndex.foreach { case (t, i) =>
        if (t) s += 1
        val llr = s * l1 + (i + 1 - s) * l0
        if (llr >= up) return (i + 1, s, llr / 1e6, "accept_h1")
        if (llr <= lo) return (i + 1, s, llr / 1e6, "accept_h0")
      }
      val n = math.min(trials.size, 25)
      (n, s, (s * l1 + (n - s) * l0) / 1e6, "continue")
    }
    (0 to 1).foreach { arm =>
      val trials = rows.filter(_._2 == arm).sortBy(_._1).map(_._3)
      assert(got(arm) === ref(trials), s"arm $arm")
    }
    assert(got(0)._4 === "accept_h1")
    assert(got(1)._4 === "continue")
    assert(got(1)._1 === 25) // reported at the horizon row
  }

  // ---- DiD ----

  test("stat_did recovers a planted effect under a shared time trend") {
    import org.apache.spark.sql.functions._
    // both arms drift +2.00 post; arm 1 additionally gains +3.25 —
    // the raw post-difference is confounded, DiD isolates 3.25
    val rows = (0L until 200L).map { i =>
      val treated = i % 2 == 1
      val post = i % 4 >= 2
      val v = BigDecimal(10) + (if (post) BigDecimal(2) else BigDecimal(0)) +
        (if (treated && post) BigDecimal("3.25") else BigDecimal(0)) +
        BigDecimal((i % 7).toInt) // user-level noise, balanced across cells
      (i, if (post) ts("2024-01-20 00:00:00") else ts("2024-01-10 00:00:00"),
        v.setScale(2))
    }
    val df = rows.toDF("user_id", "ts", "value")
    val cut = lit("2024-01-15 00:00:00").cast("timestamp")
    val x = Stats.cents(col("value"))
    val m = df.groupBy(pmod(col("user_id"), lit(2)).cast("int").as("variant"),
        (col("ts") >= cut).as("post"))
      .agg(count(lit(1)).as("n"), sum(x).as("sx"))
    def mean(v: Int, p: Boolean) =
      max(when(col("variant") === v && col("post") === p, col("sx")))
        .cast("double") /
        max(when(col("variant") === v && col("post") === p, col("n")))
          .cast("double") / 100.0
    val did = m.agg(graft.ops.TimeSeries.portableRound6(
        (mean(1, true) - mean(1, false)) - (mean(0, true) - mean(0, false)))
        .as("did")).head.getDouble(0)
    // noise term i%7 is NOT balanced identically across the 4 cells for
    // arbitrary n, but with 200 rows the (variant, post) cells each see
    // the same multiset of i%7 values (period 28 divides nothing... it
    // does not — so compute the expected value from the same cells)
    val cells = rows.groupBy(r => (r._1 % 2 == 1, r._2.getTime >
      ts("2024-01-15 00:00:00").getTime))
    def cm(t: Boolean, p: Boolean) = {
      val vs = cells((t, p)).map(_._3)
      (vs.sum / vs.size).toDouble
    }
    val want = math.round(((cm(true, true) - cm(true, false)) -
      (cm(false, true) - cm(false, false))) * 1e6) / 1e6
    assert(did === want)
    assert(math.abs(did - 3.25) < 0.5, s"planted effect ~3.25, got $did")
  }

  // ---- winsorized means ----

  test("winsorized mean caps the whale; clean arm untouched") {
    import org.apache.spark.sql.functions._
    // arm 0: 99 spends of 10.00 and ONE 10000.00 whale; arm 1: 100×10.00.
    // pooled p99 rank = ⌈0.99·200⌉ = 198 → cap = 10.00, so the whale
    // winsorizes to 10.00: arm 0's winsorized mean collapses to 10.00.
    val rows = (0 until 200).map { i =>
      val arm = i % 2
      val v = if (arm == 0 && i == 0) BigDecimal(10000) else BigDecimal(10)
      (i.toLong, "purchase", v.setScale(2))
    }
    val df = rows.toDF("user_id", "event_type", "value")
    val x = Stats.cents(col("value"))
    val base = df.where(col("event_type") === "purchase")
      .select(pmod(col("user_id"), lit(2)).cast("int").as("variant"), x.as("x"))
    val dom = base.groupBy(col("x")).agg(count(lit(1)).as("c"))
    val wOrd = org.apache.spark.sql.expressions.Window.orderBy(col("x"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    val rank = floor((col("n") * 99 + 99) / 100)
    val cap = dom.withColumn("cum", sum(col("c")).over(wOrd))
      .withColumn("n", sum(col("c")).over(wAll))
      .agg(min(when(col("cum") >= rank && col("cum") - col("c") < rank,
        col("x"))).as("cap"))
    val got = base.crossJoin(broadcast(cap))
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(least(col("x"), col("cap"))).as("sw"), max(col("cap")).as("capc"))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(0)._4 === 1000L, "pooled p99 cap must be 10.00")
    assert(got(0)._3 === 100L * 1000L, "whale winsorized to the cap")
    assert(got(1)._2 === got(1)._3, "clean arm untouched")
  }

  // ---- QTE ----

  test("quantileTreatmentEffect: a planted constant shift is the QTE") {
    import org.apache.spark.sql.functions._
    // arm 1 spends exactly 3.50 more than arm 0's matching row — every
    // quantile of arm 1 is arm 0's + 3.50, so QTE = 3.50 at p25/50/75
    val rows = (0 until 101).flatMap { i =>
      val base = BigDecimal((i % 17 + 1) * 2).setScale(2)
      Seq((2L * i, base), (2L * i + 1, base + BigDecimal("3.50")))
    }
    val df = rows.toDF("user_id", "value")
    val got = Stats.quantileTreatmentEffect(df,
        pmod(col("user_id"), lit(2)).cast("int"), "value")
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet === Set("p25", "p50", "p75"))
    got.foreach { case (q, (a0, a1, qte)) =>
      assert(qte === 3.5, s"$q: $a0 $a1 $qte")
      assert(a1 === a0 + 3.5)
    }
    // sequential type-1 reference on arm 0
    val sorted = rows.filter(_._1 % 2 == 0).map(_._2).sorted
    def q1(q: Double) = sorted(math.ceil(q * sorted.size).toInt - 1).toDouble
    assert(got("p25")._1 === q1(0.25))
    assert(got("p50")._1 === q1(0.50))
    assert(got("p75")._1 === q1(0.75))
  }

  test("power sizing: closed form on constructed moments") {
    import org.apache.spark.sql.functions._
    // sanity law on the registered formula: n = 2σ²z²/δ² with δ = 5%
    // of the mean — scale-free check: doubling every value leaves
    // n_per_arm unchanged (σ and δ scale together)
    val rows = (1 to 400).map(i => (i.toLong, "t",
      BigDecimal((i % 23 + 1)).setScale(2)))
    def power(mult: Int) = {
      val df = rows.map { case (id, t, v) => (id, t, v * mult) }
        .toDF("event_id", "event_type", "value")
        .withColumn("ts", lit(ts("2024-01-01 00:00:00")))
      val x = Stats.cents(col("value"))
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val m = df.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(x).as("sx"),
          sum(x.cast(d38) * x.cast(d38)).as("sxx"))
      val nD = col("n").cast(d38)
      val varC = (nD * col("sxx") - col("sx").cast(d38) * col("sx").cast(d38))
        .cast("double") / (nD * (nD - 1)).cast("double")
      val meanC = col("sx").cast("double") / col("n").cast("double")
      val delta = meanC * 0.05
      m.select(graft.ops.TimeSeries.portableRound6(
          varC * lit(Stats.PowerZsum2) * 2.0 / (delta * delta)).as("npa"))
        .head.getDouble(0)
    }
    val n1 = power(1)
    assert(n1 > 0)
    assert(math.abs(power(2) - n1) < 1e-3, "sizing must be scale-free")
    // hand check: cv² = var/mean², n = 2·z²·cv²/0.05²
    val vals = rows.map(_._3.toDouble * 100)
    val mean = vals.sum / vals.size
    val v = vals.map(x => (x - mean) * (x - mean)).sum / (vals.size - 1)
    val expect = 2.0 * Stats.PowerZsum2 * v / (0.05 * mean * 0.05 * mean)
    assert(math.abs(n1 - expect) / expect < 1e-9)
  }

  // ---- chi2Term overflow discipline ----

  /** Exact-arithmetic reference: BigInt products (never wrap), one
    * correctly-rounded toDouble on the difference, IEEE square +
    * divide — the same sequence chi2Term performs in DECIMAL(38,0). */
  private def chi2Ref(n: BigInt, o: BigInt, r: BigInt, c: BigInt): Double = {
    val num = (n * o - r * c).toDouble
    num * num / (n * r * c).toDouble
  }

  private def chi2Spark(n: Long, o: Long, r: Long, c: Long): Double = {
    import org.apache.spark.sql.functions._
    Seq((n, o, r, c)).toDF("n", "o", "r", "c")
      .select(Stats.chi2Term(col("n"), col("o"), col("r"), col("c")).as("t"))
      .head.getDouble(0)
  }

  test("chi2Term matches the exact reference on small counts") {
    for ((n, o, r, c) <- Seq((100L, 30L, 60L, 40L), (7L, 1L, 3L, 2L),
                             (1000000L, 123457L, 500001L, 250003L)))
      assert(chi2Spark(n, o, r, c) === chi2Ref(n, o, r, c))
  }

  // ---- inverse normal quantile + BH thresholds ----

  test("invNormCdf matches the textbook quantiles") {
    assert(math.abs(Stats.invNormCdf(0.975) - 1.9599639845) < 1e-6)
    assert(math.abs(Stats.invNormCdf(0.95) - 1.6448536270) < 1e-6)
    assert(math.abs(Stats.invNormCdf(0.5)) < 1e-12)
    assert(math.abs(Stats.invNormCdf(0.0013498980316301) + 3.0) < 1e-6)
    // symmetry across the tails (the approximation reflects)
    for (p <- Seq(0.001, 0.01, 0.2, 0.4))
      assert(math.abs(Stats.invNormCdf(p) + Stats.invNormCdf(1 - p)) < 1e-9)
  }

  test("BH threshold matrix: rank-1 bar is the Bonferroni bar; bars relax with rank") {
    val m = Stats.bhT2Matrix(0.05, 12)
    for (mm <- 1 to 12) {
      val row = m(mm - 1)
      assert(row.length == mm)
      // rank 1 tests at alpha/m (Bonferroni); rank m at plain alpha
      assert(math.abs(row.head -
        math.pow(Stats.invNormCdf(1 - 0.05 / (2 * mm)), 2)) < 1e-9)
      assert(math.abs(row.last -
        math.pow(Stats.invNormCdf(1 - 0.05 / 2), 2)) < 1e-9)
      // monotone: later ranks face lower bars (the step-up shape)
      row.zip(row.drop(1)).foreach { case (a, b) => assert(a > b) }
    }
  }

  test("stat_fdr output obeys the step-up rule on its own t2/rank columns") {
    val rows = SparkEntry.queries("stat_fdr")(spark, sf())
      .collect().map(r => (r.getLong(4), r.getDouble(3), r.getBoolean(5)))
      .sortBy(_._1)
    val mm = rows.length
    val thr = Stats.bhT2Matrix(0.05, 12)(mm - 1)
      .map(x => math.round(x * 1e6) / 1e6)
    val rstar = rows.filter { case (rank, t2, _) =>
      t2 >= thr(rank.toInt - 1) }.map(_._1).maxOption.getOrElse(0L)
    rows.foreach { case (rank, _, rejected) =>
      assert(rejected == (rank <= rstar),
        s"rank $rank: step-up says ${rank <= rstar}") }
  }

  test("chi2Term survives counts whose BIGINT products wrap") {
    // n·r·c ≈ 4.7e28 (wraps BIGINT ~5e9 times over); n·o ≈ 1.3e19 and
    // r·c ≈ 7.5e18 each individually exceed Long.MaxValue ≈ 9.2e18 —
    // the regime the old pairwise-BIGINT products wrapped in. The
    // decimal path must reproduce the exact-BigInt reference.
    val (n, o, r, c) = (6000000000L, 2123456789L, 3100000007L, 2400000011L)
    assert(BigInt(n) * o > BigInt(Long.MaxValue), "test must exercise the wrap")
    assert(chi2Spark(n, o, r, c) === chi2Ref(n, o, r, c))
    // and the denominator-only wrap (difference small, triple product huge)
    val (n2, o2, r2, c2) = (4000000000L, 1000000000L, 2000000000L, 1999999999L)
    assert(chi2Spark(n2, o2, r2, c2) === chi2Ref(n2, o2, r2, c2))
  }
}
