package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared exact-moment statistics kernels (the stat_* family's common
  * core, reused by the streaming twins so stream ≡ batch is equality of
  * one implementation, not of two transcriptions). */
object Stats {

  private val d38 = org.apache.spark.sql.types.DecimalType(38, 0)

  /** Cents-exact value column (the engine-wide money convention). */
  def cents(valueCol: Column): Column =
    (valueCol.cast("decimal(18,2)") * 100).cast("long")

  /** Per-group exact moments (grp, ni, si, qi): BIGINT count/sum,
    * DECIMAL(38,0) sum of squares. `extraKeys` prepends additional
    * grouping expressions (e.g. a streaming event-time window), so the
    * streaming twin aggregates through THIS definition, not a copy. */
  def groupMoments(df: DataFrame, groupCol: String, valueCol: String,
                   extraKeys: Seq[Column] = Nil): DataFrame = {
    val x = cents(col(valueCol))
    df.groupBy(extraKeys :+ col(groupCol).as("grp"): _*)
      .agg(count(lit(1)).as("ni"), sum(x).as("si"),
        sum(x.cast(d38) * x.cast(d38)).as("qi"))
  }

  /** Kendall tau-b concordance between two integral columns. The pair
    * census collapses to the JOINT VALUE-DOMAIN table first, so the
    * O(n²) pair space becomes one |domain|²-cell broadcast cross join
    * of cell COUNTS — concordant/discordant mass is Σ cᵢ·cⱼ over cells
    * with x_i<x_j, split by the y order. Only safe when both domains
    * are dictionary-bounded (quantities, grades, bucketed scores); a
    * continuous column must be binned first. Tie terms Σt(t−1) and
    * n(n−1) stay exact DECIMAL(38,0); the two variance factors cross
    * to double BEFORE their product (the product is ~n⁴ and would
    * overflow any fixed width — the spearman den2 discipline). */
  def kendallTauB(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df
      .select(col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("c"))
      .localCheckpoint() // domain-bounded; pair join + tie tables reuse it
    val pairs = cells.select(col("x").as("x1"), col("y").as("y1"),
        col("c").cast(d38).as("c1"))
      .join(broadcast(cells.select(col("x").as("x2"), col("y").as("y2"),
        col("c").cast(d38).as("c2"))), col("x1") < col("x2"))
      .agg(
        // coalesce: an all-tied axis has ZERO x1<x2 pairs and the sums
        // go null — the census says 0, and the oracle says the same
        coalesce(sum(when(col("y1") < col("y2"), col("c1") * col("c2"))
          .otherwise(lit(0).cast(d38))), lit(0).cast(d38)).as("conc"),
        coalesce(sum(when(col("y1") > col("y2"), col("c1") * col("c2"))
          .otherwise(lit(0).cast(d38))), lit(0).cast(d38)).as("disc"))
    def tieHalf(k: String) = cells
      .groupBy(col(k)).agg(sum(col("c")).as("t"))
      .agg(sum(col("t").cast(d38) * (col("t") - 1).cast(d38)).as("th"))
    val m = cells.agg(sum(col("c")).as("n"))
      .crossJoin(tieHalf("x").select(col("th").as("tx2")))
      .crossJoin(tieHalf("y").select(col("th").as("ty2")))
      .crossJoin(pairs)
    // doubled halves (n(n−1), Σt(t−1)) avoid fractional intermediates;
    // the /2 factors cancel inside the sqrt ratio
    val n2 = col("n").cast(d38) * (col("n") - 1).cast(d38)
    m.select(col("n").as("n_rows"),
      col("conc").cast("double").as("conc"),
      col("disc").cast("double").as("disc"),
      when(((n2 - col("tx2")) > 0) && ((n2 - col("ty2")) > 0),
        TimeSeries.portableRound4(
          (col("conc") - col("disc")).cast("double") * 2.0 /
            sqrt((n2 - col("tx2")).cast("double") *
              (n2 - col("ty2")).cast("double")))).as("tau_b"))
  }

  /** Kaplan–Meier survival from per-subject (lifetime, observed-death)
    * rows. Everything collapses to the lifetime-domain table (calendar-
    * bounded, never row-bounded): at-risk n_t = total − Σ_{L<t} m_L via
    * one domain window, and the survival product folds over the sorted
    * death-time array — prefix slices replay the same left-to-right
    * double sequence a recursive-CTE oracle computes, so S(t) is
    * bit-identical. Censored subjects stay at risk through their
    * lifetime and contribute no drop (the standard KM convention). */
  def kaplanMeier(subjects: DataFrame, tCol: String,
                  deadCol: String): DataFrame = {
    val lif = subjects
      .select(col(tCol).cast("long").as("t"), col(deadCol).as("dead"))
      .groupBy(col("t")).agg(count(lit(1)).as("m"),
        sum(when(col("dead"), 1L).otherwise(0L)).as("d"))
      .localCheckpoint() // domain-bounded; total + window reuse it
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("t"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    lif
      .crossJoin(broadcast(lif.agg(sum(col("m")).as("n"))))
      .withColumn("n_risk", col("n") - coalesce(sum(col("m")).over(w), lit(0L)))
      .where(col("d") > 0)
      .agg(sort_array(collect_list(
        struct(col("t"), col("d"), col("n_risk")))).as("steps"))
      .select(posexplode(col("steps")).as(Seq("i", "st")), col("steps"))
      .select(col("st.t").as("t_day"), col("st.d").as("d"),
        col("st.n_risk").as("n_risk"),
        TimeSeries.portableRound4(
          aggregate(slice(col("steps"), lit(1), col("i") + 1), lit(1.0),
            (acc, x) => acc * (lit(1.0) -
              x.getField("d").cast("double") /
                x.getField("n_risk").cast("double")))).as("survival"))
  }

  /** One-way ANOVA F from per-group moments, optionally per extra key
    * columns (e.g. a streaming window). All moments exact; the one
    * non-rational term A = Σᵢ Sᵢ²/nᵢ folds over the k-bounded group
    * array in sorted grp order, so every engine (and the streaming
    * twin) adds the same doubles in the same sequence. Output keeps
    * `keyCols` plus n, k, f (f null when ssw = 0 or the dfs are
    * degenerate). */
  def fFromGroupMoments(g: DataFrame, keyCols: Seq[String]): DataFrame = {
    val grouped =
      if (keyCols.isEmpty) g.groupBy()
      else g.groupBy(keyCols.map(col): _*)
    val t = grouped.agg(
      sum(col("ni")).as("n"), sum(col("si")).cast(d38).as("s"),
      sum(col("qi")).as("q"), count(lit(1)).as("k"),
      sort_array(collect_list(struct(col("grp"), col("si"), col("ni"))))
        .as("terms"))
    val aFold = aggregate(col("terms"), lit(0.0), (acc, e) =>
      acc + e.getField("si").cast("double") * e.getField("si").cast("double") /
        e.getField("ni").cast("double"))
    val sd = col("s").cast("double")
    t.withColumn("a", aFold)
      .withColumn("ssb", col("a") - sd * sd / col("n").cast("double"))
      .withColumn("ssw", col("q").cast("double") - col("a"))
      .withColumn("f",
        when(col("ssw") > 0 && col("k") > 1 && col("n") > col("k"),
          TimeSeries.portableRound4(
            col("ssb") * (col("n") - col("k")).cast("double") /
              (col("ssw") * (col("k") - 1).cast("double")))))
      .drop("terms", "a", "s", "q", "ssb", "ssw")
  }

  /** Poisson(1) cumulative distribution through k = 6 — the literal
    * table both engines replay for the bootstrap weight draw (computed
    * ONCE here; injecting the values keeps every libm exp/factorial out
    * of the per-row path and out of cross-engine drift). P(w > 6) ≈
    * 8·10⁻⁵ per draw; the CASE tail assigns those the weight 7. */
  val PoissonCum: Array[Double] = {
    val probs = (0 to 6).map(k => math.exp(-1.0) / (1 to k).product)
    probs.scanLeft(0.0)(_ + _).tail.toArray
  }

  /** Poisson bootstrap CI for each group's mean — THE distributed
    * bootstrap (each row enters replicate i with multiplicity
    * Poisson(1), so no replicate ever needs a global resample pass):
    * every row draws `b` weights from its OWN hash (deterministic,
    * layout-blind, reproducible on any engine), replicate means fold as
    * exact cents sums, and the CI is read off the ranked replicate
    * means at the ceil(α·m) indexes. Identically-keyed duplicate rows
    * share their draws — the one documented bias, negligible unless the
    * corpus is mostly verbatim repeats (which dedup handles first).
    *
    * Scale: the ×b fan-out happens map-side and collapses immediately
    * into the (group, i) hash-agg with map-side partials — the shuffle
    * carries |groups|·b partial rows, never b copies of the data. The
    * ranking runs on |groups|·b replicate means. */
  def poissonBootstrapCI(df: DataFrame, groupCol: String, valueCol: String,
                         rowKey: Column, b: Int = 40): DataFrame = {
    val x = cents(col(valueCol))
    val u = conv(substring(md5(concat_ws("|", col("__rk"), col("i"))), 1, 8),
      16, 10).cast("double") / 4294967296.0
    val w = PoissonCum.zipWithIndex.reverse
      .foldLeft(lit(7).cast("int")) { case (rest, (c, k)) =>
        when(u < lit(c), k).otherwise(rest)
      }
    val reps = df
      .select(col(groupCol).as("grp"), x.as("x"), rowKey.as("__rk"),
        explode(sequence(lit(0), lit(b - 1))).as("i"))
      .withColumn("w", w)
      .groupBy(col("grp"), col("i"))
      .agg(sum(col("w").cast("long") * col("x")).as("swx"),
        sum(col("w").cast("long")).as("sw"))
      .where(col("sw") > 0)
      .withColumn("mean_c", col("swx").cast("double") / col("sw").cast("double"))
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("mean_c").asc, col("i").asc)
    val ranked = reps
      .withColumn("rk", row_number().over(wOrd))
      .withColumn("m", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))))
      .withColumn("lo_idx", ceil(col("m") * 0.025).cast("int"))
      .withColumn("hi_idx", ceil(col("m") * 0.975).cast("int"))
      .groupBy(col("grp"))
      .agg(max(when(col("rk") === greatest(col("lo_idx"), lit(1)),
          col("mean_c"))).as("lo_c"),
        max(when(col("rk") === col("hi_idx"), col("mean_c"))).as("hi_c"))
    val point = df.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n"), sum(x).as("sx"))
    point.join(ranked, "grp")
      .select(col("grp").as(groupCol), col("n"),
        TimeSeries.portableRound6(
          col("sx").cast("double") / col("n").cast("double") / 100.0).as("mean"),
        TimeSeries.portableRound6(col("lo_c") / 100.0).as("lo"),
        TimeSeries.portableRound6(col("hi_c") / 100.0).as("hi"))
  }
}
