package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed cardinality sketches as reusable library operators.
  *
  * [[hllMd5]] is an engine-portable HyperLogLog (Flajolet et al. 2007)
  * built entirely from Catalyst expressions: registers derive from md5
  * (bucket = first 8 hash bits, rank = 53 − bit-length of the next 52
  * bits), the harmonic sum stays in EXACT scaled-integer arithmetic
  * (Σ 2^(52−Mj) ≤ 2^60, BIGINT-safe), and the only float operations are
  * one division by a precomputed literal numerator plus a small-range
  * lookup into a precomputed 256·ln(256/z) table — so the approximate
  * estimate itself is bit-reproducible across engines and runs (the
  * DuckDB oracle replays it literally; Spark's native
  * `approx_count_distinct` HLL++ is not portable that way).
  *
  * Scale shape: partial+final hash aggregation whose state is the SKETCH
  * (≤256 registers per group), never the value set — register partials
  * combine with plain `max` per bucket, so the shuffle carries
  * sketch-sized rows regardless of input cardinality. Being
  * expression-only it also runs inside streaming windowed aggregations.
  *
  * KMV (bottom-k) lives in `graft.functions.KmvDistinct` as a
  * TypedImperativeAggregate; this file hosts the expression-level
  * sketches.
  */
object Sketches {

  /** m = 256 buckets (b = 8): standard error ≈ 1.04/√256 ≈ 6.5%. */
  val HllBuckets = 256

  /** α₂₅₆ · m² · 2⁵² — the raw-estimate numerator, computed once so the
    * identical double literal lands in the Spark plan and any replaying
    * oracle SQL. */
  val HllNumerator: Double =
    0.7213 / (1 + 1.079 / HllBuckets) * HllBuckets.toDouble * HllBuckets *
      4503599627370496.0 // 2^52

  /** Small-range correction table m·ln(m/z) for z ∈ [1, m] empty buckets,
    * precomputed so both engines index the same literals instead of
    * calling their own libm `ln`. */
  val HllLnTable: IndexedSeq[Double] =
    (1 to HllBuckets).map(z => HllBuckets * math.log(HllBuckets.toDouble / z))

  /** The table as SQL literals in e-notation. A bare decimal literal like
    * `15.457410813160315` parses as DECIMAL in DuckDB, and the later
    * DECIMAL→DOUBLE conversion can land one ulp away from the Scala
    * double that produced the text (observed: sf0.001 regenerated data
    * hit table entries where the decimal round-trip differs — FAIL by
    * 1.8e-15). Exponent notation forces DOUBLE parsing; %.17e
    * round-trips every double exactly. Locale.ROOT pins the decimal
    * separator — the f-interpolator uses the JVM default locale, which
    * would emit `1,5e+01` under a comma-separator locale and break both
    * engines' parsers. */
  val HllLnTableSql: String =
    HllLnTable.map(v =>
      String.format(java.util.Locale.ROOT, "%.17e", Double.box(v)))
      .mkString(", ")

  /** HLL register columns for one value expression: (bucket, rank). */
  def hllRegister(value: Column): (Column, Column) = {
    val h = md5(value.cast("string"))
    (conv(substring(h, 1, 2), 16, 10).cast("int"),
      lit(53) - length(conv(substring(h, 3, 13), 16, 2)))
  }

  /** Count–Min sketch (Cormode & Muthukrishnan 2005) — the frequency
    * twin of the cardinality sketches above, equally engine-portable:
    * cell hashes derive from md5 with the row index salted into the
    * input, so a replaying oracle lands on identical cells. Counts are
    * exact integers; the only approximation is collision over-count,
    * which is one-sided (estimate ≥ true count, never under).
    *
    * Scale shape: the sketch is a [[CmsDepth]]×[[CmsWidth]] cell table
    * (4096 rows) regardless of input size — one hash-aggregate with
    * map-side combine builds it, and it broadcasts for the estimation
    * join. The heavy-hitter pattern is two-pass: sketch pass bounds
    * memory, candidates whose ESTIMATE clears the threshold get an
    * exact second-pass verify — the sketch's one-sided error means no
    * true heavy hitter is ever pruned. */
  val CmsDepth = 4
  val CmsWidth = 1024

  /** Cell column for hash row `row` of `value`: 20 md5 bits mod width. */
  def cmsCell(row: Int, value: Column): Column =
    conv(substring(md5(concat(lit(row.toString), lit(":"), value.cast("string"))), 1, 5), 16, 10)
      .cast("bigint") % CmsWidth

  /** Build the sketch: one row per touched cell, (r, c, cnt). */
  def cmsSketch(df: DataFrame, value: Column): DataFrame =
    df.select(posexplode(array((0 until CmsDepth).map(r => cmsCell(r, value)): _*))
        .as(Seq("r", "c")))
      .groupBy("r", "c").agg(count(lit(1)).as("cnt"))

  /** Point-query estimates for `items` (one column `item`): min over the
    * depth rows of the item's cell counts. The sketch side is tiny —
    * broadcast it so estimation never shuffles the candidate set. */
  def cmsEstimate(items: DataFrame, sketch: DataFrame): DataFrame = {
    val cells = items.select(col("item"),
      posexplode(array((0 until CmsDepth).map(r => cmsCell(r, col("item"))): _*))
        .as(Seq("r", "c")))
    cells.join(broadcast(sketch), Seq("r", "c"))
      .groupBy("item").agg(min("cnt").as("est"))
  }

  /** Equi-join cardinality estimate from two CMS sketches — the classic
    * inner-product application (Cormode & Muthukrishnan 2005 §4.2):
    * |A ⋈ B| ≤ min over hash rows of Σ_c A_r[c]·B_r[c], one-sided like
    * the point estimate. This is how a planner sizes a join WITHOUT
    * touching either table again: both sketches are ≤ depth·width rows,
    * so the estimate is a broadcast join of two tiny tables — at 100 TB
    * the sketches are built once per table scan and reused for every
    * join-order decision. */
  def cmsJoinSize(a: DataFrame, b: DataFrame): DataFrame =
    a.as("a").join(broadcast(b.as("b")),
        col("a.r") === col("b.r") && col("a.c") === col("b.c"))
      .groupBy(col("a.r")).agg(sum(col("a.cnt") * col("b.cnt")).as("ip"))
      .agg(min("ip").as("est_join_size"))

  /** Bottom-k (KMV) signature of `value`: the k smallest distinct
    * md5-derived 32-bit hashes — a mergeable distinct-set summary. One
    * distinct shuffle + a TakeOrdered (never a global sort). */
  def kmvSig(df: DataFrame, value: Column, k: Int): DataFrame =
    df.select(conv(substring(md5(value.cast("string")), 1, 8), 16, 10)
        .cast("bigint").as("hv"))
      .distinct().orderBy("hv").limit(k)

  /** Grouped bottom-k sketch TABLE: one row per group with the k
    * smallest distinct hashes as a sorted array — the mergeable summary
    * a sketch table stores (daily sketches roll up to any coarser
    * period without re-reading raw data). Built as distinct → per-group
    * rank ≤ k → collect: the rank filter triggers WindowGroupLimit, so
    * every partition prunes to k rows per group MAP-SIDE and no
    * aggregation state ever holds a whole distinct set (the
    * collect_set-then-slice formulation does, and dies on a
    * million-distinct group at scale). */
  def kmvSketchTable(df: DataFrame, groupCols: Seq[String], hvCol: String,
                     k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(hvCol))
    df.select(groupCols.map(col) :+ col(hvCol): _*).distinct()
      .withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(col(hvCol))).as("sketch"))
  }

  /** KMV estimate from a [[kmvSketchAgg]] array: exact size below k,
    * else (k−1) / (h_k / 2³²) — the same formula the agg_kmv oracle
    * replays, one double division then one portable round. */
  def kmvEstimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("long"))
      .otherwise(round(lit((k - 1).toDouble) /
        (element_at(sketch, k).cast("double") / 4294967296.0), 0).cast("long"))

  /** The md5-derived 32-bit hash every KMV op shares. */
  def kmvHash(value: Column): Column =
    conv(substring(md5(value.cast("string")), 1, 8), 16, 10).cast("bigint")

  /** Set-overlap estimation from two bottom-k signatures (Beyer et al.
    * 2007, "On synopses for distinct-value estimation"): the union's
    * bottom-k is a uniform sample of the union, so
    * jaccard ≈ |{h ∈ U_k : h ∈ A ∧ h ∈ B}| / |U_k|, the union size
    * comes from U_k's k-th smallest hash, and the intersection is their
    * product. Everything after the signatures is k-row arithmetic —
    * the sketches travel, the sets never do (how a 100 TB audience
    * overlap is answered without a distinct-join of two corpora). */
  def kmvOverlap(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    val dom = 4294967296.0 // hash domain: 2^32
    val u = a.union(b).distinct().orderBy("hv").limit(k)
    val kth = u.agg(max("hv").as("kth"), count(lit(1)).as("ku"))
    val inter = u.join(a, "hv").join(b, "hv").agg(count(lit(1)).as("n_both"))
    inter.crossJoin(kth).select(
      (col("n_both").cast("double") / col("ku")).as("est_jaccard"),
      ((col("ku") - 1).cast("double") * dom / col("kth")).as("est_union"),
      (col("n_both").cast("double") / col("ku") *
        ((col("ku") - 1).cast("double") * dom / col("kth"))).as("est_intersection"))
  }

  /** Approximate distinct count of `value` per `groupCols`:
    * (groupCols..., approx_users = estimate, n_empty = empty buckets).
    * Deterministic: identical input multiset → identical estimate, on
    * any engine implementing the same literal arithmetic. */
  /** Per-group HLL register table (group cols, bucket, mj = max rank) —
    * the MERGEABLE summary an HLL sketch table stores: registers combine
    * by element-wise max, which is associative, so daily register tables
    * roll up to any coarser period with one more max-aggregate. */
  def hllRegisters(df: DataFrame, groupCols: Seq[String],
                   value: Column): DataFrame = {
    val (bucket, rank) = hllRegister(value)
    df.select(groupCols.map(col) :+ bucket.as("bucket") :+ rank.as("rank"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max("rank").as("mj"))
  }

  /** The estimate from a register table (exact scaled-integer harmonic
    * sum, one literal-numerator division, literal small-range table). */
  def hllEstimateFromRegisters(regs: DataFrame, groupCols: Seq[String],
                               estimateCol: String): DataFrame = {
    val agg = regs.groupBy(groupCols.map(col): _*)
      .agg((sum(expr("shiftleft(1L, 52 - mj)")) +
          (lit(HllBuckets.toLong) - count(lit(1))) * lit(1L << 52)).as("vscaled"),
        (lit(HllBuckets) - count(lit(1))).cast("int").as("n_empty"))
    val rawE = lit(HllNumerator) / col("vscaled").cast("double")
    agg.select(groupCols.map(col) :+
      when(col("n_empty") > 0 && rawE <= lit(2.5 * HllBuckets),
        element_at(array(HllLnTable.map(lit): _*), col("n_empty")))
        .otherwise(rawE).as(estimateCol) :+
      col("n_empty"): _*)
  }

  def hllMd5(df: DataFrame, groupCols: Seq[String], value: Column,
             estimateCol: String = "approx_users"): DataFrame =
    hllEstimateFromRegisters(hllRegisters(df, groupCols, value),
      groupCols, estimateCol)

  /** Bounded-state quantiles: equi-width binned histogram + inversion.
    * The quantile q reports the lower bound of the smallest bin whose
    * cumulative count reaches ⌈q·n⌉ — error is one bin width, state is
    * |bins| per group (vs `percentile()`'s full value map: the same
    * bounded-vs-data-sized state tradeoff as agg_kmv_rollup, but for
    * quantiles — the deterministic alternative to t-digest/KLL, whose
    * merge/compress order makes results run-dependent). The histogram
    * table is the mergeable sketch: partial (group, bin) counts from
    * any split of the data sum to the same table, so rollups are exact.
    * One hash-agg over the data; the cum-sum window runs per group over
    * |bins| rows, and ranks/thresholds stay integers end to end. */
  def binnedQuantiles(df: DataFrame, groupCols: Seq[String], value: Column,
                      binWidth: Long, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), "q in (0,1]")
    val hist = df
      .groupBy((groupCols.map(col) :+
        floor(value / binWidth).cast("long").as("bin")): _*)
      .agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(col("bin"))
    val tot = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
    val cum = hist.withColumn("cum", sum(col("c")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .withColumn("n", sum(col("c")).over(tot))
    // per quantile: the first bin where cum ≥ q·n, compared as the exact
    // integer cross-product cum·10⁶ ≥ n·(q·10⁶) — no float rank ever
    // exists, so no bin edge can straddle an ulp in either engine. The
    // products go through DECIMAL(38,0): a BIGINT cum·10⁶ wraps past
    // ~9.2e12 rows per group (DuckDB's HUGEINT promotion would sail on,
    // silently diverging) — the same overflow rule as tCloseness.
    val labels = qs.map(q => s"q${(q * 100).round}")
    require(labels.distinct == labels,
      s"quantile labels collide at 2-digit resolution: $qs")
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val picks = qs.zip(labels).map { case (q, label) =>
      val q6 = (q * 1e6).round
      min(when(d38(col("cum")) * 1000000L >= d38(col("n")) * lit(q6),
        col("bin") * binWidth)).as(label)
    }
    cum.groupBy(groupCols.map(col): _*)
      .agg(max(col("n")).as("n"), picks: _*)
  }

  /** Quantile inversion over an already-collected sorted (bin, c)
    * histogram ARRAY — the expression-only form of [[binnedQuantiles]]'
    * pick, for contexts where the histogram must live inside ONE
    * aggregate value (a streaming chained aggregation's state, a
    * sketch-table row). Same exact-integer rank rule: first bin whose
    * cum·10⁶ reaches n·q₆. */
  def histQuantile(hist: Column, n: Column, binWidth: Long,
                   q: Double): Column = {
    val q6 = (q * 1e6).round
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    aggregate(hist,
      struct(lit(0L).as("cum"), lit(null).cast("long").as("ans")),
      (acc, h) => {
        val cum2 = acc.getField("cum") + h.getField("c")
        // DECIMAL cross-product: same overflow rule as binnedQuantiles.
        struct(cum2.as("cum"),
          coalesce(acc.getField("ans"),
            when(d38(cum2) * 1000000L >= d38(n) * q6,
              h.getField("bin") * binWidth)).as("ans"))
      }).getField("ans")
  }
}
