package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Tables

/** Round-14 pack: stylometry / lexical-diversity cards for corpus
  * curation (Yule's K, MATTR, Burrows' Delta) and two experiment-
  * analysis staples (log-rank survival comparison, fixed-effect
  * inverse-variance meta-pooling). All five follow the established
  * portability discipline: exact integer/DECIMAL(38,0) moments, libm
  * and per-term double chains quantized to a fixed grid then
  * integer-summed, one final IEEE chain, 4-6dp absorb. Width audits in
  * each scaladoc at the 625× tier (62.5M events / 3.1M docs).
  */
object StyloQueries extends QueryPack {

  private val d38 = (c: Column) => c.cast("decimal(38,0)")
  private def r4(c: Column): Column = round(c * 10000) / 10000
  private def r6(c: Column): Column = round(c * 1000000) / 1000000

  override def queries: Map[String, Q] = Map(

    // Yule's K per source — the repeat-rate lexical-diversity constant
    // (K = 10⁴·(Σc²−N)/N²): unlike TTR/hapax it is corpus-size-
    // invariant, the classic "is this source template spam" one-number
    // card beside text_hapax (which IS size-sensitive) and vocab_entropy.
    // Exact: Σc² as DECIMAL(38,0) (c ≤ 62.5M ⇒ c² ≤ 3.9e15, ×65k words
    // ⇒ ≤ 2.6e20, d38-safe), one double chain at the end. One
    // (source, word) hash-agg — the text_hapax plan shape.
    "text_yule_k" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .where(length(col("w")) > 0)
        .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
        .groupBy(col("source"))
        .agg(sum(col("c")).as("n"), count(lit(1)).as("vocab"),
          sum(d38(col("c")) * d38(col("c"))).as("s2"))
        .select(col("source"), col("n").as("n_tokens"), col("vocab"),
          r6((col("s2") - d38(col("n"))).cast("double") * lit(10000.0) /
            (col("n").cast("double") * col("n").cast("double")))
            .as("yule_k"))
    },

    // MATTR (moving-average type-token ratio, Covington & McFall 2010):
    // mean distinct-ratio over 50-token windows at stride 25 — the
    // length-robust lexical-diversity score per DOCUMENT (plain TTR
    // collapses for long docs; MATTR does not), the row-level twin of
    // the source-level Yule card. Row-local projection, zero shuffle
    // (the curate_filter scan-shape contract); cost is ≤2 distinct-ops
    // per token by the stride bound. Docs under 50 tokens report
    // n_windows=0 and a NULL mattr. Exact integers until one division.
    "text_mattr" -> { (s, dir) =>
      val t = col("t")
      val n = size(t)
      val starts = when(n >= 50, sequence(lit(1), n - 49, lit(25)))
        .otherwise(array().cast("array<int>"))
      val distincts = transform(starts, st =>
        size(array_distinct(slice(t, st, lit(50)))).cast("long"))
      Tables.documents(s, dir)
        .select(col("doc_id"),
          filter(split(col("text"), " "), w => length(w) > lit(0)).as("t"))
        .select(col("doc_id"), n.cast("long").as("n_tokens"),
          size(starts).cast("long").as("n_windows"),
          aggregate(distincts, lit(0L), (a, x) => a + x).as("sd"))
        .select(col("doc_id"), col("n_tokens"), col("n_windows"),
          when(col("n_windows") > 0, r6(col("sd").cast("double") /
            (lit(50.0) * col("n_windows").cast("double")))).as("mattr"))
    },

    // Burrows' Delta between sources (Burrows 2002): mean |z-score
    // difference| over the corpus's top-30 words — THE stylometric
    // distance; near-zero Delta across supposedly-independent sources
    // is the tell of a single template farm behind both. All decisions
    // on exact integers: per-source relative frequencies quantize to
    // the 1e-9 grid (fq = round(c/n·1e9) — c/n is one IEEE division,
    // identical both engines), then for each word the z-score NUMERATOR
    // S·fq − Σfq and the variance numerator Vnum = S·Σfq² − (Σfq)² stay
    // exact integers (widths: fq ≤ 1e9, S ≤ |sources|, Σfq² ≤ S·1e18 —
    // DECIMAL(38,0)), and |z_a − z_b| = |Δznum|/√Vnum shares one
    // sqrt-terminated chain (sqrt is IEEE-exact; the d38→double cast of
    // Vnum rounds identically in both engines). |z| ≤ √S bounds every
    // term ≤ ~4.5, so the 1e-6-grid quantized term sum over 30 words
    // fits a long with 10 digits to spare. Plan: one vocab hash-agg +
    // TakeOrdered-30 broadcast + a dense |S|×30 grid self-joined on
    // word — nothing corpus-sized past the first agg.
    "text_burrows_delta" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val words = docs
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .where(length(col("w")) > 0)
      val top = words.groupBy(col("w")).agg(count(lit(1)).as("cw"))
        .orderBy(col("cw").desc, col("w").asc).limit(30)
        .select(col("w"))
      val totals = words.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val counts = words.join(broadcast(top), "w")
        .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
      // dense grid: every (source, top-word) cell, absent counts = 0
      val grid = totals.crossJoin(broadcast(top))
        .join(counts, Seq("source", "w"), "left")
        .select(col("source"), col("w"),
          round(coalesce(col("c"), lit(0L)).cast("double") /
            col("n").cast("double") * lit(1.0e9), 0).cast("long").as("fq"))
      val stats = grid.groupBy(col("w"))
        .agg(count(lit(1)).as("ns"), sum(d38(col("fq"))).as("sf"),
          sum(d38(col("fq")) * d38(col("fq"))).as("sf2"))
        .select(col("w"), col("ns"), col("sf"),
          (d38(col("ns")) * col("sf2") - col("sf") * col("sf")).as("vnum"))
      val z = grid.join(broadcast(stats), "w")
        .select(col("source"), col("w"), col("vnum"),
          (d38(col("ns")) * d38(col("fq")) - col("sf")).as("znum"))
      val a = z.select(col("source").as("source_a"), col("w"),
        col("vnum"), col("znum").as("za"))
      val b = z.select(col("source").as("source_b"), col("w"),
        col("znum").as("zb"))
      // the pair join runs on the |sources|×30 GRID, bounded by
      // construction — broadcast by declaration, not by estimate (the
      // optimizer sees corpus-derived aggregates and would sort-merge).
      // SCALE BOUND ASSUMPTION: output (and join work) grows |sources|²
      // — fine while `source` is a catalog dimension (tens to low
      // thousands: 10³ sources → 5×10⁵ pairs × 30 words). If sources
      // ever become unbounded (e.g. per-domain crawl provenance), cap
      // the pair grid first: rank sources by volume and delta only the
      // top-N (the broadcast side then stays N×30 by construction).
      a.join(broadcast(b), Seq("w")).where(col("source_a") < col("source_b"))
        .select(col("source_a"), col("source_b"),
          when(col("vnum") > 0, round(
            abs((col("za") - col("zb")).cast("double")) /
              sqrt(col("vnum").cast("double")) * lit(1.0e6), 0)
            .cast("long")).otherwise(lit(0L)).as("q"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("n_words"), sum(col("q")).as("sq"))
        .select(col("source_a"), col("source_b"), col("n_words"),
          r4(col("sq").cast("double") / lit(1.0e6) /
            col("n_words").cast("double")).as("delta"))
    },

    // Log-rank test between the even- and odd-user cohorts on observed
    // lifetime (days between first and last event) — the standard
    // two-sample survival comparison behind every retention experiment
    // readout; ev_survival draws the curves, this scores their
    // difference. No censoring in the observed-window convention, which
    // keeps every at-risk/death count an exact integer. Per distinct
    // lifetime t: e₁ = d·n₁/n and the hypergeometric variance term are
    // one fixed-order double chain each from exact integers (identical
    // both engines), quantized to the 1e-9 grid and integer-summed;
    // Z = U/√V is the final chain. The lifetime domain is value-bounded
    // (≤ days in the table's span), so the unpartitioned cumulative
    // window runs on the collapsed grid, never on users.
    "stat_logrank" -> { (s, dir) =>
      val life = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(datediff(to_date(max(col("ts"))), to_date(min(col("ts"))))
          .cast("long").as("t"))
        .select(col("t"),
          (((col("user_id") % 2) + 2) % 2 === 0).as("g1"))
      val byT = life.groupBy(col("t"))
        .agg(sum(when(col("g1"), 1L).otherwise(0L)).as("d1"),
          sum(when(!col("g1"), 1L).otherwise(0L)).as("d2"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("t"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val tot1 = life.agg(sum(when(col("g1"), 1L).otherwise(0L)).as("t1"),
        sum(when(!col("g1"), 1L).otherwise(0L)).as("t2"))
      val risks = byT
        .withColumn("cb1", coalesce(sum(col("d1")).over(w), lit(0L)))
        .withColumn("cb2", coalesce(sum(col("d2")).over(w), lit(0L)))
        .crossJoin(broadcast(tot1))
        .select(col("t"), col("d1"), col("d2"),
          (col("t1") - col("cb1")).as("n1"), (col("t2") - col("cb2")).as("n2"))
      val d = col("d1") + col("d2")
      val n = col("n1") + col("n2")
      val uTerm = col("d1").cast("double") -
        d.cast("double") * col("n1").cast("double") / n.cast("double")
      val vTerm = d.cast("double") *
        (col("n1").cast("double") / n.cast("double")) *
        (lit(1.0) - col("n1").cast("double") / n.cast("double")) *
        ((n - d).cast("double") / (n - 1).cast("double"))
      risks
        .select(round(uTerm * lit(1.0e9), 0).cast("long").as("qu"),
          when(n > 1, round(vTerm * lit(1.0e9), 0).cast("long"))
            .otherwise(lit(0L)).as("qv"))
        .agg(count(lit(1)).as("n_times"),
          sum(d38(col("qu"))).as("su"), sum(d38(col("qv"))).as("sv"))
        .crossJoin(broadcast(tot1))
        .select(col("t1").as("n_users_even"), col("t2").as("n_users_odd"),
          col("n_times"),
          r4(when(col("sv") > 0,
            (col("su").cast("double") / lit(1.0e9)) /
              sqrt(col("sv").cast("double") / lit(1.0e9)))).as("z_logrank"))
    },

    // Fixed-effect inverse-variance meta-analysis of the daily
    // even-vs-odd purchase-spend effect: each day is one "study"
    // (effect = mean difference in cents, var = s²A/nA + s²B/nB from
    // exact integer moments), pooled = Σ(e/v)/Σ(1/v) with SE = √(1/Σw).
    // The one-number "did the experiment move spend, pooling every day
    // at its own precision" card that stat_did/stat_cuped sit beside.
    // Per-day e and v are fixed-order double chains from exact cents
    // moments (the Levene/ANOVA pattern); e/v quantizes to the 1e-6
    // grid and 1/v to 1e-9, both integer-summed — widths: |e/v| ≤ 1e3,
    // 1/v ≤ ~1 per day, ×400 days, long-safe with 9 digits spare.
    "stat_meta" -> { (s, dir) =>
      val ev = Tables.events(s, dir).where(col("event_type") === "purchase")
        .select(to_date(col("ts")).as("day"),
          (((col("user_id") % 2) + 2) % 2 === 0).as("g1"),
          graft.ops.Stats.cents(col("value")).as("x"))
      def m(g: Column, e: Column) = sum(when(g, e).otherwise(lit(0L)))
      val day = ev.groupBy(col("day")).agg(
        m(col("g1"), lit(1L)).as("na"), m(col("g1"), col("x")).as("sa"),
        m(col("g1"), d38(col("x")) * d38(col("x"))).as("qa"),
        m(!col("g1"), lit(1L)).as("nb"), m(!col("g1"), col("x")).as("sb"),
        m(!col("g1"), d38(col("x")) * d38(col("x"))).as("qb"))
      val s2a = (d38(col("na")) * col("qa") - d38(col("sa")) * d38(col("sa")))
        .cast("double") /
        (col("na").cast("double") * (col("na") - 1).cast("double"))
      val s2b = (d38(col("nb")) * col("qb") - d38(col("sb")) * d38(col("sb")))
        .cast("double") /
        (col("nb").cast("double") * (col("nb") - 1).cast("double"))
      val e = col("sa").cast("double") / col("na").cast("double") -
        col("sb").cast("double") / col("nb").cast("double")
      val v = s2a / col("na").cast("double") + s2b / col("nb").cast("double")
      val ok = col("na") > 1 && col("nb") > 1 && v > 0
      day.select(
          when(ok, round(e / v * lit(1.0e6), 0).cast("long")).as("qe"),
          when(ok, round(lit(1.0) / v * lit(1.0e9), 0).cast("long")).as("qw"))
        .agg(count(col("qe")).as("k_days"),
          sum(d38(col("qe"))).as("se"), sum(d38(col("qw"))).as("sw"))
        .select(col("k_days"),
          r4(when(col("sw") > 0,
            col("se").cast("double") / lit(1.0e6) /
              (col("sw").cast("double") / lit(1.0e9)) / lit(100.0)))
            .as("pooled_effect_dollars"),
          r6(when(col("sw") > 0,
            sqrt(lit(1.0e9) / col("sw").cast("double")) / lit(100.0)))
            .as("pooled_se_dollars"))
    },

    // Uplift decile table + Qini numerator for the even/odd experiment:
    // users ranked by activity score (event count) into deciles, each
    // decile's treated-vs-control conversion lift, plus the cumulative
    // Qini value — the "who does the treatment actually move" readout
    // behind targeting policies, beside stat_qte's distributional view.
    // SCALE: decile assignment runs on the collapsed SCORE DOMAIN
    // (count-of-counts + one desc cumulative on distinct scores — never
    // an ntile over users, which would be a single-task 62.5M-row sort
    // at 625×), then broadcasts the |domain|-sized decile map back.
    // Users sharing a score share a decile (deterministic, documented).
    // All decisions exact integers: decile = min((10·cumBefore) DIV N,
    // 9); uplift/Qini are final double chains per 10-row group.
    "ev_uplift_deciles" -> { (s, dir) =>
      val users = Tables.events(s, dir).groupBy(col("user_id"))
        .agg(count(lit(1)).as("sc"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("conv"))
        .select(col("sc"),
          (((col("user_id") % 2) + 2) % 2 === 0).as("g1"), col("conv"))
      val dom = users.groupBy(col("sc")).agg(count(lit(1)).as("m"))
      val wDesc = org.apache.spark.sql.expressions.Window
        .orderBy(col("sc").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val dec = dom
        .withColumn("cb", coalesce(sum(col("m")).over(wDesc), lit(0L)))
        .crossJoin(broadcast(dom.agg(sum(col("m")).as("nu"))))
        .select(col("sc"), least(expr("(10 * cb) DIV nu"), lit(9L)).as("decile"))
      val byDec = users.join(broadcast(dec), "sc")
        .groupBy(col("decile"))
        .agg(sum(when(col("g1"), 1L).otherwise(0L)).as("n_treat"),
          sum(when(col("g1"), col("conv")).otherwise(0L)).as("conv_treat"),
          sum(when(!col("g1"), 1L).otherwise(0L)).as("n_ctrl"),
          sum(when(!col("g1"), col("conv")).otherwise(0L)).as("conv_ctrl"))
      val wCum = org.apache.spark.sql.expressions.Window
        .orderBy(col("decile"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      byDec
        .withColumn("cnt", sum(col("n_treat")).over(wCum))
        .withColumn("cct", sum(col("conv_treat")).over(wCum))
        .withColumn("cnc", sum(col("n_ctrl")).over(wCum))
        .withColumn("ccc", sum(col("conv_ctrl")).over(wCum))
        .select(col("decile"), col("n_treat"), col("conv_treat"),
          col("n_ctrl"), col("conv_ctrl"),
          // + 0.0 normalizes NEGATIVE ZERO: a tiny-negative difference
          // rounds to −0.0 in DuckDB (IEEE round keeps the sign) but
          // +0.0 through Spark's BigDecimal HALF_UP — the two hash
          // differently. −0.0 + 0.0 = +0.0 in both engines; identity
          // for every other value. Mirrored in the oracle.
          (r6(when(col("n_treat") > 0 && col("n_ctrl") > 0,
            col("conv_treat").cast("double") / col("n_treat").cast("double") -
              col("conv_ctrl").cast("double") / col("n_ctrl").cast("double")))
            + lit(0.0)).as("uplift"),
          (r6(when(col("cnc") > 0,
            col("cct").cast("double") - col("ccc").cast("double") *
              (col("cnt").cast("double") / col("cnc").cast("double"))))
            + lit(0.0)).as("qini"))
    },

    // Seasonal/trend STRENGTH per event type (Hyndman's F-statistics):
    // F_trend = max(0, 1 − Var(resid)/Var(trend+resid)) over the
    // deseasonalized series, F_seasonal = max(0, 1 − Var(resid)/
    // Var(seasonal+resid)) over the detrended one — the one-number
    // "does this series even HAVE structure" card on top of
    // ts_decompose's component table (decompose shows the pieces; this
    // says whether they matter). Portability: the decompose components
    // are ALREADY 6dp-quantized identically in both engines, so
    // q = round(component·1e6) recovers the same exact integers on
    // both sides (a 6dp-multiple double ×1e6 is within ½ of its
    // integer), and the three variances are exact integer moments from
    // there — width: |q| ≤ 1e6·max(n) ≈ 1e10, squares ≤ 1e20 × T rows,
    // DECIMAL(38,0). Interior rows only (the component contract). Two
    // final double divisions, 6dp.
    "ts_strength" -> { (s, dir) =>
      val comp = graft.ops.TimeSeries.decompose(
          Tables.events(s, dir), "event_type", "ts")
        .where(col("trend").isNotNull)
        .select(col("event_type"),
          round(col("resid") * lit(1.0e6), 0).cast("long").as("qr"),
          (round(col("trend") * lit(1.0e6), 0).cast("long") +
            round(col("resid") * lit(1.0e6), 0).cast("long")).as("qd"),
          (round(col("seasonal") * lit(1.0e6), 0).cast("long") +
            round(col("resid") * lit(1.0e6), 0).cast("long")).as("qt"))
      def vnum(c: String) =
        (d38(count(lit(1))) * sum(d38(col(c)) * d38(col(c))) -
          sum(d38(col(c))) * sum(d38(col(c)))).as(s"v$c")
      comp.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_interior"), vnum("qr"), vnum("qd"), vnum("qt"))
        .select(col("event_type"), col("n_interior"),
          r6(when(col("vqd") > 0, greatest(lit(0.0),
            lit(1.0) - col("vqr").cast("double") / col("vqd").cast("double"))))
            .as("f_trend"),
          r6(when(col("vqt") > 0, greatest(lit(0.0),
            lit(1.0) - col("vqr").cast("double") / col("vqt").cast("double"))))
            .as("f_seasonal"))
    },

    // Length-proportional Poisson sampling with Horvitz–Thompson
    // correction: each doc enters with probability p = min(1, len/20000)
    // on a deterministic md5 unit draw, and a selected doc carries
    // weight 1/p — the estimator card (Σ 1/p over the sample ≈ true doc
    // count per source) that importance-weighted curation pipelines run
    // to prove their weights are calibrated. Row-local projection, zero
    // shuffle before the source agg; 1/p quantizes to the 1e-6 grid
    // (1/p ≤ 20000 ⇒ q ≤ 2e10, long-safe) and sums exactly.
    "sample_importance" -> { (s, dir) =>
      val p = least(lit(1.0), col("w").cast("double") / lit(20000.0))
      Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("n_chars").cast("long").as("w"))
        .select(col("source"),
          when(graft.ops.CorpusOps.unitHash(col("doc_id")) < p,
            round(lit(1.0e6) / p, 0).cast("long")).as("q"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), count(col("q")).as("n_sampled"),
          sum(d38(col("q"))).as("sq"))
        .select(col("source"), col("n_docs"), col("n_sampled"),
          r4(col("sq").cast("double") / lit(1.0e6)).as("ht_estimate"),
          r6((col("sq").cast("double") / lit(1.0e6) -
            col("n_docs").cast("double")) / col("n_docs").cast("double"))
            .as("rel_err"))
    }
  )

  override def oracles: Map[String, String] = Map(

    "text_yule_k" ->
      """WITH w AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  WHERE length(w) > 0 GROUP BY 1, 2)
        |SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS vocab,
        |  round(CAST(sum(CAST(c AS HUGEINT) * c) - sum(c) AS DOUBLE)
        |      * 10000.0
        |      / (CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS DOUBLE))
        |    * 1000000) / 1000000 AS yule_k
        |FROM w GROUP BY source""".stripMargin,

    "text_mattr" ->
      """WITH d AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), w -> length(w) > 0) AS t
        |  FROM documents),
        |m AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
        |    CASE WHEN len(t) >= 50
        |         THEN range(1, len(t) - 48, 25) ELSE [] END AS starts, t
        |  FROM d)
        |SELECT doc_id, n_tokens,
        |  CAST(len(starts) AS BIGINT) AS n_windows,
        |  CASE WHEN len(starts) > 0 THEN
        |    round(CAST(list_sum([len(list_distinct(t[s:s+49]))
        |        FOR s IN starts]) AS DOUBLE)
        |      / (50.0 * len(starts)) * 1000000) / 1000000
        |  END AS mattr
        |FROM m""".stripMargin,

    "text_burrows_delta" ->
      """WITH words AS (SELECT source, w
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  WHERE length(w) > 0),
        |top AS (SELECT w FROM (SELECT w, count(*) AS cw FROM words
        |  GROUP BY 1 ORDER BY cw DESC, w ASC LIMIT 30)),
        |totals AS (SELECT source, CAST(count(*) AS BIGINT) AS n
        |  FROM words GROUP BY 1),
        |counts AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
        |  FROM words JOIN top USING (w) GROUP BY 1, 2),
        |grid AS (SELECT totals.source, top.w,
        |    CAST(round(CAST(coalesce(c, 0) AS DOUBLE) / CAST(n AS DOUBLE)
        |      * 1000000000.0) AS BIGINT) AS fq
        |  FROM totals CROSS JOIN top
        |  LEFT JOIN counts ON counts.source = totals.source
        |    AND counts.w = top.w),
        |stats AS (SELECT w, CAST(count(*) AS HUGEINT) AS ns,
        |    CAST(sum(CAST(fq AS HUGEINT)) AS HUGEINT) AS sf,
        |    CAST(count(*) AS HUGEINT)
        |      * sum(CAST(fq AS HUGEINT) * fq)
        |      - CAST(sum(CAST(fq AS HUGEINT)) AS HUGEINT)
        |        * CAST(sum(CAST(fq AS HUGEINT)) AS HUGEINT) AS vnum
        |  FROM grid GROUP BY 1),
        |z AS (SELECT source, grid.w, vnum,
        |    ns * fq - sf AS znum
        |  FROM grid JOIN stats ON stats.w = grid.w),
        |q AS (SELECT a.source AS source_a, b.source AS source_b,
        |    CASE WHEN a.vnum > 0 THEN
        |      CAST(round(abs(CAST(a.znum - b.znum AS DOUBLE))
        |        / sqrt(CAST(a.vnum AS DOUBLE)) * 1000000.0) AS BIGINT)
        |    ELSE 0 END AS q
        |  FROM z a JOIN z b ON a.w = b.w AND a.source < b.source)
        |SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_words,
        |  round(CAST(sum(CAST(q AS HUGEINT)) AS DOUBLE) / 1000000.0
        |    / CAST(count(*) AS DOUBLE) * 10000) / 10000 AS delta
        |FROM q GROUP BY 1, 2""".stripMargin,

    "stat_logrank" ->
      """WITH life AS (SELECT
        |    CAST(date_diff('day', CAST(min(ts) AS DATE),
        |      CAST(max(ts) AS DATE)) AS BIGINT) AS t,
        |    ((user_id % 2) + 2) % 2 = 0 AS g1
        |  FROM events GROUP BY user_id),
        |byt AS (SELECT t,
        |    CAST(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
        |    CAST(sum(CASE WHEN g1 THEN 0 ELSE 1 END) AS BIGINT) AS d2
        |  FROM life GROUP BY 1),
        |tot AS (SELECT CAST(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS t1,
        |    CAST(sum(CASE WHEN g1 THEN 0 ELSE 1 END) AS BIGINT) AS t2
        |  FROM life),
        |risks AS (SELECT t, d1, d2,
        |    t1 - CAST(coalesce(sum(d1) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS n1,
        |    t2 - CAST(coalesce(sum(d2) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS n2
        |  FROM byt, tot),
        |terms AS (SELECT
        |    CAST(round((CAST(d1 AS DOUBLE)
        |      - CAST(d1 + d2 AS DOUBLE) * CAST(n1 AS DOUBLE)
        |        / CAST(n1 + n2 AS DOUBLE)) * 1000000000.0) AS BIGINT) AS qu,
        |    CASE WHEN n1 + n2 > 1 THEN
        |      CAST(round(CAST(d1 + d2 AS DOUBLE)
        |        * (CAST(n1 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
        |        * (1.0 - CAST(n1 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
        |        * (CAST((n1 + n2) - (d1 + d2) AS DOUBLE)
        |           / CAST((n1 + n2) - 1 AS DOUBLE))
        |        * 1000000000.0) AS BIGINT)
        |    ELSE 0 END AS qv
        |  FROM risks),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n_times,
        |    CAST(sum(CAST(qu AS HUGEINT)) AS HUGEINT) AS su,
        |    CAST(sum(CAST(qv AS HUGEINT)) AS HUGEINT) AS sv
        |  FROM terms)
        |SELECT t1 AS n_users_even, t2 AS n_users_odd, n_times,
        |  round(CASE WHEN sv > 0 THEN
        |      (CAST(su AS DOUBLE) / 1000000000.0)
        |        / sqrt(CAST(sv AS DOUBLE) / 1000000000.0)
        |    END * 10000) / 10000 AS z_logrank
        |FROM m, tot""".stripMargin,

    "stat_meta" ->
      """WITH ev AS (SELECT CAST(ts AS DATE) AS day,
        |    ((user_id % 2) + 2) % 2 = 0 AS g1,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
        |  FROM events WHERE event_type = 'purchase'),
        |d AS (SELECT day,
        |    CAST(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |    CAST(sum(CASE WHEN g1 THEN x ELSE 0 END) AS BIGINT) AS sa,
        |    CAST(sum(CASE WHEN g1 THEN CAST(x AS HUGEINT) * x
        |      ELSE 0 END) AS HUGEINT) AS qa,
        |    CAST(sum(CASE WHEN g1 THEN 0 ELSE 1 END) AS BIGINT) AS nb,
        |    CAST(sum(CASE WHEN g1 THEN 0 ELSE x END) AS BIGINT) AS sb,
        |    CAST(sum(CASE WHEN g1 THEN 0
        |      ELSE CAST(x AS HUGEINT) * x END) AS HUGEINT) AS qb
        |  FROM ev GROUP BY 1),
        |t AS (SELECT day, na, nb,
        |    CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
        |      - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS e,
        |    CAST(CAST(na AS HUGEINT) * qa
        |        - CAST(sa AS HUGEINT) * sa AS DOUBLE)
        |      / (CAST(na AS DOUBLE) * CAST(na - 1 AS DOUBLE))
        |      / CAST(na AS DOUBLE)
        |    + CAST(CAST(nb AS HUGEINT) * qb
        |        - CAST(sb AS HUGEINT) * sb AS DOUBLE)
        |      / (CAST(nb AS DOUBLE) * CAST(nb - 1 AS DOUBLE))
        |      / CAST(nb AS DOUBLE) AS v
        |  FROM d),
        |q AS (SELECT
        |    CASE WHEN na > 1 AND nb > 1 AND v > 0
        |      THEN CAST(round(e / v * 1000000.0) AS BIGINT) END AS qe,
        |    CASE WHEN na > 1 AND nb > 1 AND v > 0
        |      THEN CAST(round(1.0 / v * 1000000000.0) AS BIGINT) END AS qw
        |  FROM t),
        |m AS (SELECT CAST(count(qe) AS BIGINT) AS k_days,
        |    CAST(sum(CAST(qe AS HUGEINT)) AS HUGEINT) AS se,
        |    CAST(sum(CAST(qw AS HUGEINT)) AS HUGEINT) AS sw
        |  FROM q)
        |SELECT k_days,
        |  round(CASE WHEN sw > 0 THEN CAST(se AS DOUBLE) / 1000000.0
        |      / (CAST(sw AS DOUBLE) / 1000000000.0) / 100.0 END
        |    * 10000) / 10000 AS pooled_effect_dollars,
        |  round(CASE WHEN sw > 0 THEN
        |      sqrt(1000000000.0 / CAST(sw AS DOUBLE)) / 100.0 END
        |    * 1000000) / 1000000 AS pooled_se_dollars
        |FROM m""".stripMargin,

    "ev_uplift_deciles" ->
      """WITH users AS (SELECT CAST(count(*) AS BIGINT) AS sc,
        |    ((user_id % 2) + 2) % 2 = 0 AS g1,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS conv
        |  FROM events GROUP BY user_id),
        |dom AS (SELECT sc, CAST(count(*) AS BIGINT) AS m
        |  FROM users GROUP BY 1),
        |tot AS (SELECT CAST(sum(m) AS BIGINT) AS nu FROM dom),
        |dec AS (SELECT sc,
        |    least((10 * CAST(coalesce(sum(m) OVER (ORDER BY sc DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT)) // nu, 9) AS decile
        |  FROM dom, tot),
        |bydec AS (SELECT decile,
        |    CAST(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS n_treat,
        |    CAST(sum(CASE WHEN g1 THEN conv ELSE 0 END) AS BIGINT) AS conv_treat,
        |    CAST(sum(CASE WHEN g1 THEN 0 ELSE 1 END) AS BIGINT) AS n_ctrl,
        |    CAST(sum(CASE WHEN g1 THEN 0 ELSE conv END) AS BIGINT) AS conv_ctrl
        |  FROM users JOIN dec USING (sc) GROUP BY 1),
        |cum AS (SELECT decile, n_treat, conv_treat, n_ctrl, conv_ctrl,
        |    CAST(sum(n_treat) OVER w AS BIGINT) AS cnt,
        |    CAST(sum(conv_treat) OVER w AS BIGINT) AS cct,
        |    CAST(sum(n_ctrl) OVER w AS BIGINT) AS cnc,
        |    CAST(sum(conv_ctrl) OVER w AS BIGINT) AS ccc
        |  FROM bydec
        |  WINDOW w AS (ORDER BY decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT decile, n_treat, conv_treat, n_ctrl, conv_ctrl,
        |  round(CASE WHEN n_treat > 0 AND n_ctrl > 0 THEN
        |      CAST(conv_treat AS DOUBLE) / CAST(n_treat AS DOUBLE)
        |      - CAST(conv_ctrl AS DOUBLE) / CAST(n_ctrl AS DOUBLE) END
        |    * 1000000) / 1000000 + 0.0 AS uplift,
        |  round(CASE WHEN cnc > 0 THEN
        |      CAST(cct AS DOUBLE) - CAST(ccc AS DOUBLE)
        |        * (CAST(cnt AS DOUBLE) / CAST(cnc AS DOUBLE)) END
        |    * 1000000) / 1000000 + 0.0 AS qini
        |FROM cum""".stripMargin,

    "ts_strength" ->
      s"""WITH ${EventQueries.hourlyGridCtes},
         |t AS (SELECT event_type, bucket, n,
         |    CAST(sum(n) OVER w AS BIGINT) AS s25,
         |    CAST(count(*) OVER w AS BIGINT) AS c25
         |  FROM ff
         |  WINDOW w AS (PARTITION BY event_type ORDER BY bucket
         |    ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
         |sea AS (SELECT event_type, CAST(hour(bucket) AS INT) AS hod,
         |    CAST(sum(25 * n - s25) AS BIGINT) AS num,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM t WHERE c25 = 25 GROUP BY 1, 2),
         |q AS (SELECT t.event_type,
         |    CAST(round(CAST(25 * cnt * n - cnt * s25 - num AS DOUBLE)
         |      / CAST(25 * cnt AS DOUBLE) * 1000000.0) AS BIGINT) AS qr,
         |    CAST(round(CAST(s25 AS DOUBLE) / 25.0 * 1000000.0) AS BIGINT)
         |      AS qt0,
         |    CAST(round(CAST(num AS DOUBLE) / CAST(25 * cnt AS DOUBLE)
         |      * 1000000.0) AS BIGINT) AS qs0
         |  FROM t JOIN sea ON t.event_type = sea.event_type
         |    AND CAST(hour(bucket) AS INT) = sea.hod
         |  WHERE c25 = 25),
         |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_interior,
         |    CAST(count(*) AS HUGEINT) * sum(CAST(qr AS HUGEINT) * qr)
         |      - CAST(sum(CAST(qr AS HUGEINT)) AS HUGEINT)
         |        * CAST(sum(CAST(qr AS HUGEINT)) AS HUGEINT) AS vqr,
         |    CAST(count(*) AS HUGEINT)
         |        * sum(CAST(qt0 + qr AS HUGEINT) * (qt0 + qr))
         |      - CAST(sum(CAST(qt0 + qr AS HUGEINT)) AS HUGEINT)
         |        * CAST(sum(CAST(qt0 + qr AS HUGEINT)) AS HUGEINT) AS vqd,
         |    CAST(count(*) AS HUGEINT)
         |        * sum(CAST(qs0 + qr AS HUGEINT) * (qs0 + qr))
         |      - CAST(sum(CAST(qs0 + qr AS HUGEINT)) AS HUGEINT)
         |        * CAST(sum(CAST(qs0 + qr AS HUGEINT)) AS HUGEINT) AS vqt
         |  FROM q GROUP BY 1)
         |SELECT event_type, n_interior,
         |  round(CASE WHEN vqd > 0 THEN greatest(0.0,
         |      1.0 - CAST(vqr AS DOUBLE) / CAST(vqd AS DOUBLE)) END
         |    * 1000000) / 1000000 AS f_trend,
         |  round(CASE WHEN vqt > 0 THEN greatest(0.0,
         |      1.0 - CAST(vqr AS DOUBLE) / CAST(vqt AS DOUBLE)) END
         |    * 1000000) / 1000000 AS f_seasonal
         |FROM m""".stripMargin,

    "sample_importance" ->
      """WITH d AS (SELECT source, CAST(n_chars AS BIGINT) AS w,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT)
        |      / 4294967296.0 AS u
        |  FROM documents),
        |q AS (SELECT source,
        |    CASE WHEN u < least(1.0, CAST(w AS DOUBLE) / 20000.0)
        |      THEN CAST(round(1000000.0
        |        / least(1.0, CAST(w AS DOUBLE) / 20000.0)) AS BIGINT)
        |    END AS q
        |  FROM d)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(q) AS BIGINT) AS n_sampled,
        |  round(CAST(sum(CAST(q AS HUGEINT)) AS DOUBLE) / 1000000.0
        |    * 10000) / 10000 AS ht_estimate,
        |  round((CAST(sum(CAST(q AS HUGEINT)) AS DOUBLE) / 1000000.0
        |      - CAST(count(*) AS DOUBLE)) / CAST(count(*) AS DOUBLE)
        |    * 1000000) / 1000000 AS rel_err
        |FROM q GROUP BY source""".stripMargin
  )
}
