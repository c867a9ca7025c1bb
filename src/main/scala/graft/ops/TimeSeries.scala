package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-series primitives over event streams: uniform resampling with gap
  * fill, linear interpolation of missing points, and recursive
  * exponential smoothing — the monitoring/forecasting layer a pipeline
  * daemon feeds (the reference surfaces per-vertex rate series from its
  * daemon, `pkg/daemon/server/service/rater`; these are the analytics the
  * consumer of such series runs).
  *
  * Scale discipline shared by all three: the raw event table is touched
  * exactly ONCE, by a (key, bucket) hash aggregation with map-side
  * partials. Everything after — grid generation, gap fill, window passes,
  * the EWMA fold — runs on the AGGREGATED series, whose size is
  * |keys| × |buckets in range|: independent of raw row count, so 100 TB
  * of events collapses to the same few-thousand-row series before any
  * quadratic-ish or per-key-ordered logic runs. Per-key series are
  * bounded by the time range (720 hourly buckets/month), never by data
  * volume, which is what makes the per-key ordered fold safe.
  */
object TimeSeries {

  /** 4-decimal round as multiply → integer round → divide, so every
    * engine rounds the SAME binary double: `round(x, 4)` diverges on
    * half ties (Spark re-reads the double's shortest decimal string,
    * DuckDB multiplies by 10⁴ first — one tie in ~4k interpolated rows
    * landed on opposite sides). Both sides of the oracle use this form. */
  def portableRound4(c: Column): Column = round(c * 10000, 0) / 10000

  /** 6-decimal variant for ratios/keys that need finer resolution. */
  def portableRound6(c: Column): Column = round(c * 1000000, 0) / 1000000

  /** Per-key uniform bucket grid with gap fill: every key covers every
    * bucket between its first and last active bucket; silent hours get
    * n = 0 / sum = 0.00. The grid is built per key from the aggregated
    * span (sequence + explode — distributed, no driver loop) and
    * left-joined back to the actuals. Sums travel as DECIMAL so the
    * fill zero and the aggregate are both exact.
    */
  def resample(events: DataFrame, keyCol: String, tsCol: String,
               valueCol: String, bucket: String = "hour"): DataFrame = {
    val hourly = events
      .groupBy(col(keyCol), date_trunc(bucket, col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("sum_value"))
    val step = bucket match {
      case "hour" => expr("INTERVAL 1 HOUR")
      case "day"  => expr("INTERVAL 1 DAY")
      case other  => throw new IllegalArgumentException(s"bucket: $other")
    }
    // Gap rows come from lead() on the aggregated series — each present
    // bucket emits itself plus the empty buckets up to its successor —
    // NOT from a per-key-span grid joined back to the actuals: that
    // formulation reads the raw table twice (the join pushes key-notnull
    // filters into one copy of the agg subtree, defeating exchange
    // reuse). This way the raw scan happens exactly once.
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
    hourly
      .withColumn("next_b", lead(col("bucket"), 1).over(w))
      .select(col(keyCol), col("n"), col("sum_value"), col("bucket").as("b"),
        explode(sequence(col("bucket"),
          coalesce(col("next_b") - step, col("bucket")), step)).as("bucket"))
      .select(col(keyCol), col("bucket"),
        when(col("bucket") === col("b"), col("n")).otherwise(lit(0L)).as("n"),
        // the exact DECIMAL sum is cast to DOUBLE only at the output
        // boundary (cents-exact well past 2⁵²) — wide decimals hash
        // differently across engine arrow bridges (r9 hash-only miss)
        when(col("bucket") === col("b"), col("sum_value"))
          .otherwise(lit(0).cast("decimal(18,2)"))
          .cast("double").as("sum_value"))
  }

  /** Linear interpolation of missing points on a uniform per-key grid.
    * Present buckets carry their bucket mean (exact DECIMAL sum cast to
    * double, then one IEEE division); absent buckets get
    * prev + (next − prev) · elapsed/gap from the nearest present
    * neighbors (leading/trailing gaps stay null — nothing to anchor to).
    * Two window passes over the aggregated series, co-located by one
    * shuffle on the key; the fractions derive from integer epoch
    * seconds, so the arithmetic is engine-portable to the bit before
    * the final 4-decimal round.
    */
  def interpolate(events: DataFrame, keyCol: String, tsCol: String,
                  valueCol: String): DataFrame = {
    // mean = double(sum)/n, NOT a decimal division: engines disagree on
    // the scale a decimal quotient keeps, but the decimal→double cast and
    // the IEEE double division are bit-identical everywhere.
    val grid = resample(events, keyCol, tsCol, valueCol)
      .withColumn("v", when(col("n") > 0,
        col("sum_value").cast("double") / col("n")))
    val order = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
    val back = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val present = when(col("v").isNotNull,
      struct(col("bucket").as("b"), col("v").as("pv")))
    val ep = (c: Column) => unix_timestamp(c.cast("timestamp"))
    val frac = (ep(col("bucket")) - ep(col("prev.b"))).cast("double") /
      (ep(col("next.b")) - ep(col("prev.b"))).cast("double")
    grid
      .withColumn("prev", last(present, ignoreNulls = true).over(back))
      .withColumn("next", first(present, ignoreNulls = true).over(fwd))
      .select(col(keyCol), col("bucket"), col("n"),
        portableRound4(
          when(col("v").isNotNull, col("v"))
            .otherwise(col("prev.pv") +
              (col("next.pv") - col("prev.pv")) * frac)).as("value"))
  }

  /** Seasonal-naive NEXT-bucket forecast with an empirical prediction
    * band — the number a capacity planner actually acts on (the
    * backtest scores the method; this ships tomorrow's number with its
    * uncertainty). Point forecast for bucket T+1 is the value one
    * season back (the bucket at T−season+1 on the gap-filled grid);
    * the band is the q-quantile of the backtest's |residual| history,
    * an exact type-1 rank off the collapsed residual-domain table (the
    * stat_qte discipline). EVERYTHING is integer arithmetic — counts,
    * residuals, the ⌈q·n⌉ rank, the ±band — so there is no float
    * anywhere for an engine to disagree on. lo clamps at 0 (a count
    * cannot be negative). One raw scan; every window runs on the
    * |keys|×|hours| grid or the residual-domain table. */
  def forecastInterval(events: DataFrame, keyCol: String, tsCol: String,
                       season: Int = 24, qNum: Int = 9,
                       qDen: Int = 10): DataFrame = {
    require(qNum > 0 && qDen > qNum, "quantile in (0,1) as a fraction")
    val series = resample(events, keyCol, tsCol, "value")
      .select(col(keyCol), col("bucket"), col("n"))
      .localCheckpoint() // grid-bounded; residuals + point lookup reuse it
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
    val resid = series
      .withColumn("pred", lag(col("n"), season).over(w))
      .where(col("pred").isNotNull)
      .select(col(keyCol), abs(col("n") - col("pred")).as("r"))
      .groupBy(col(keyCol), col("r")).agg(count(lit(1)).as("c"))
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col("r"))
    val wAll = Window.partitionBy(col(keyCol))
    val rank = floor((col("nr") * qNum + (qDen - 1)) / qDen) // ⌈q·n⌉
    val band = resid
      .withColumn("cum", sum(col("c")).over(wOrd))
      .withColumn("nr", sum(col("c")).over(wAll))
      .groupBy(col(keyCol))
      .agg(max(col("nr")).as("n_resid"),
        min(when(col("cum") >= rank && col("cum") - col("c") < rank,
          col("r"))).as("band"))
    val last = series.groupBy(col(keyCol)).agg(max(col("bucket")).as("bmax"))
    val step = expr("INTERVAL 1 HOUR")
    val point = series.join(last, Seq(keyCol))
      .where(col("bucket") ===
        col("bmax") - expr(s"INTERVAL ${season - 1} HOURS"))
      .select(col(keyCol), (col("bmax") + step).as("next_bucket"),
        col("n").as("point"))
    point.join(band, Seq(keyCol))
      .select(col(keyCol), col("next_bucket"), col("point"),
        greatest(col("point") - col("band"), lit(0L)).as("lo"),
        (col("point") + col("band")).as("hi"),
        col("band"), col("n_resid"))
  }

  /** Seasonal-naive forecast backtest: predict each bucket's count with
    * the value one season (24 buckets) earlier on the gap-filled grid,
    * and score the whole horizon per key — MAE and bias in EXACT integer
    * arithmetic (counts are integers; only the final mean divides), plus
    * coverage (how much of the span had a prediction). The capacity-
    * planning sanity check every rate-autoscaler baseline starts from;
    * beat-the-naive is the bar any fancier forecaster must clear.
    * Same shape as [[resample]] plus one lag window — one raw scan. */
  def seasonalNaiveBacktest(events: DataFrame, keyCol: String, tsCol: String,
                            season: Int = 24): DataFrame = {
    val series = resample(events, keyCol, tsCol, "value")
      .select(col(keyCol), col("bucket"), col("n"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
    series
      .withColumn("pred", lag(col("n"), season).over(w))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_buckets"),
        sum(when(col("pred").isNotNull, 1L).otherwise(0L)).as("n_scored"),
        sum(when(col("pred").isNotNull, abs(col("n") - col("pred")))).as("abs_err"),
        sum(when(col("pred").isNotNull, col("n") - col("pred"))).as("bias_sum"))
      .select(col(keyCol), col("n_buckets"), col("n_scored"),
        portableRound4(col("abs_err").cast("double") /
          nullif(col("n_scored"), lit(0L))).as("mae"),
        portableRound4(col("bias_sum").cast("double") /
          nullif(col("n_scored"), lit(0L))).as("bias"))
  }

  /** Recursive exponential smoothing over the gap-filled per-key count
    * series: ewma₀ = x₀, ewmaₜ = α·xₜ + (1−α)·ewmaₜ₋₁. The recursion is
    * inherently sequential, so it runs as an ordered left fold over each
    * key's AGGREGATED series (sort_array(collect_list) → aggregate HOF
    * appending one state per step → posexplode) — the same
    * fold-in-plan discipline as the classifier and pack_bins, and the
    * exact shape a recursive-CTE oracle replays step for step. State per
    * key is the series itself (time-range-bounded, see object doc).
    */
  def ewma(events: DataFrame, keyCol: String, tsCol: String,
           alpha: Double, valueCol: String = "value"): DataFrame = {
    // bucket pinned to TIMESTAMP_NTZ so the fold's declared state type
    // matches whether the caller's ts column is tz'd or not.
    val series = resample(events, keyCol, tsCol, valueCol)
      .select(col(keyCol), col("bucket").cast("timestamp_ntz").as("bucket"),
        col("n"))
    val folded = series
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("bucket"), col("n")))).as("xs"))
      .withColumn("states",
        aggregate(col("xs"),
          expr("CAST(array() AS ARRAY<STRUCT<bucket TIMESTAMP_NTZ, n BIGINT, ewma DOUBLE>>)"),
          (acc, x) => {
            val prev = element_at(acc, -1)("ewma")
            val e = when(size(acc) === 0, x("n").cast("double"))
              .otherwise(lit(alpha) * x("n").cast("double") +
                lit(1.0 - alpha) * prev)
            concat(acc, array(struct(x("bucket").as("bucket"),
              x("n").as("n"), e.as("ewma"))))
          }))
    folded.select(col(keyCol), explode(col("states")).as("s"))
      .select(col(keyCol), col("s.bucket").as("bucket"), col("s.n").as("n"),
        portableRound4(col("s.ewma")).as("ewma"))
  }

  /** Holt double exponential smoothing: levelₜ = α·xₜ + (1−α)(levelₜ₋₁
    * + trendₜ₋₁), trendₜ = β(levelₜ − levelₜ₋₁) + (1−β)·trendₜ₋₁ — the
    * trend-aware upgrade of [[ewma]] (a plain EWMA lags a ramp forever;
    * Holt's trend term closes the gap), and the one-step forecast
    * level + trend the capacity planner reads. Same ordered in-plan
    * fold over the gap-filled hourly grid, replayed step for step by a
    * recursive-CTE oracle; initialization level₀ = x₀, trend₀ = 0.
    * The float chain is written identically in both engines (literal
    * α, 1−α as the literal the oracle spells), so every state is
    * bit-reproducible before the final display round. */
  def holt(events: DataFrame, keyCol: String, tsCol: String,
           alpha: Double, beta: Double,
           valueCol: String = "value"): DataFrame = {
    val series = resample(events, keyCol, tsCol, valueCol)
      .select(col(keyCol), col("bucket").cast("timestamp_ntz").as("bucket"),
        col("n"))
    val folded = series
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("bucket"), col("n")))).as("xs"))
      .withColumn("states",
        aggregate(col("xs"),
          expr("CAST(array() AS ARRAY<STRUCT<bucket TIMESTAMP_NTZ, " +
            "n BIGINT, level DOUBLE, trend DOUBLE>>)"),
          (acc, x) => {
            val prevL = element_at(acc, -1)("level")
            val prevT = element_at(acc, -1)("trend")
            val level = when(size(acc) === 0, x("n").cast("double"))
              .otherwise(lit(alpha) * x("n").cast("double") +
                lit(1.0 - alpha) * (prevL + prevT))
            val trend = when(size(acc) === 0, lit(0.0))
              .otherwise(lit(beta) * (level - prevL) +
                lit(1.0 - beta) * prevT)
            concat(acc, array(struct(x("bucket").as("bucket"),
              x("n").as("n"), level.as("level"), trend.as("trend"))))
          }))
    folded.select(col(keyCol), explode(col("states")).as("s"))
      .select(col(keyCol), col("s.bucket").as("bucket"), col("s.n").as("n"),
        portableRound4(col("s.level")).as("level"),
        portableRound4(col("s.trend")).as("trend"),
        portableRound4(col("s.level") + col("s.trend")).as("forecast_next"))
  }

  /** Additive Holt–Winters (triple exponential smoothing) over each
    * key's gap-filled hourly counts — level + trend + a period-`m`
    * seasonal component, completing the forecasting family
    * (ewma ⊂ holt ⊂ this):
    * lₜ = α(xₜ − sₜ₋ₘ) + (1−α)(lₜ₋₁ + bₜ₋₁);
    * bₜ = β(lₜ − lₜ₋₁) + (1−β)bₜ₋₁;
    * sₜ = γ(xₜ − lₜ) + (1−γ)sₜ₋ₘ;  forecast₊₁ = lₜ + bₜ + sₜ₊₁₋ₘ.
    * Initialization is the ONLINE (no-lookahead) convention — l₁ = x₁,
    * b₁ = 0, and sₜ₋ₘ ≡ 0 until a full season of history exists — the
    * only convention both a streaming left fold and a recursive-CTE
    * oracle can replay without seeing the future.
    *
    * Engine-exactness: the double chain is written identically on both
    * sides (ts_holt's discipline); sₜ₋ₘ comes from the fold's OWN
    * HISTORY — entry t−m of the accumulated state array — while the
    * oracle carries a rotating m-slot seasonal list, and the two are the
    * same sequence by construction. 4dp portable round at the boundary.
    * Scale: the fold runs per key on the |keys|×|hours| series (the
    * ewma argument); the forecast's sₜ₊₁₋ₘ is one lag(m−1) window pass
    * on the same key partitioning. */
  def holtWinters(events: DataFrame, keyCol: String, tsCol: String,
                  alpha: Double = 0.3, beta: Double = 0.1,
                  gamma: Double = 0.3, m: Int = 24,
                  valueCol: String = "value"): DataFrame = {
    val series = resample(events, keyCol, tsCol, valueCol)
      .select(col(keyCol), col("bucket").cast("timestamp_ntz").as("bucket"),
        col("n"))
    val folded = series
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("bucket"), col("n")))).as("xs"))
      .withColumn("states",
        aggregate(col("xs"),
          expr("CAST(array() AS ARRAY<STRUCT<bucket TIMESTAMP_NTZ, " +
            "n BIGINT, level DOUBLE, trend DOUBLE, seasonal DOUBLE>>)"),
          (acc, x) => {
            val prevL = element_at(acc, -1)("level")
            val prevT = element_at(acc, -1)("trend")
            // the season-old seasonal: this fold's own entry t−m
            val sOld = when(size(acc) >= m,
              element_at(acc, size(acc) - (m - 1))("seasonal"))
              .otherwise(lit(0.0))
            val level = when(size(acc) === 0, x("n").cast("double"))
              .otherwise(lit(alpha) * (x("n").cast("double") - sOld) +
                lit(1.0 - alpha) * (prevL + prevT))
            val trend = when(size(acc) === 0, lit(0.0))
              .otherwise(lit(beta) * (level - prevL) +
                lit(1.0 - beta) * prevT)
            val seas = lit(gamma) * (x("n").cast("double") - level) +
              lit(1.0 - gamma) * sOld
            concat(acc, array(struct(x("bucket").as("bucket"),
              x("n").as("n"), level.as("level"), trend.as("trend"),
              seas.as("seasonal"))))
          }))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
    folded.select(col(keyCol), explode(col("states")).as("s"))
      .select(col(keyCol), col("s.bucket").as("bucket"), col("s.n").as("n"),
        col("s.level").as("l"), col("s.trend").as("t"),
        col("s.seasonal").as("sv"))
      .withColumn("s_next", coalesce(lag(col("sv"), m - 1).over(w), lit(0.0)))
      .select(col(keyCol), col("bucket"), col("n"),
        portableRound4(col("l")).as("level"),
        portableRound4(col("t")).as("trend"),
        portableRound4(col("sv")).as("seasonal"),
        portableRound4(col("l") + col("t") + col("s_next"))
          .as("forecast_next"))
  }

  /** Robust per-key anomaly detection on hourly counts: flag buckets
    * whose deviation from the key's MEDIAN exceeds 3× the key's MAD
    * (median absolute deviation) — the outlier rule that a single spike
    * cannot poison, unlike mean/stddev z-scores where the anomaly
    * inflates its own threshold.
    *
    * Exactness: counts are integers, so the median of n of them is
    * integral or a half — 2·median is an exact BIGINT; deviations
    * |2·cnt − med2| are integers, so 2·MAD-of-dev2 (= 4·MAD) is again an
    * exact BIGINT, and the flag `2·dev2 > 3·mad4` (≡ |cnt−med| > 3·MAD)
    * is a pure integer comparison — no engine ever materializes a float
    * threshold a borderline bucket could straddle. A constant series has
    * mad4 = 0, so ANY deviation flags (the strict-MAD convention).
    *
    * Scale: one raw scan into the (key, hour) hash-agg; both medians and
    * the final flag run over the aggregated series (|keys|×|hours|,
    * data-volume-independent), co-partitioned on the key — the stats
    * joins reuse the series' partitioning. */
  def robustAnomalies(events: DataFrame, keyCol: String, tsCol: String,
                      nMads: Int = 3): DataFrame = {
    // ONE raw scan: the hourly series localCheckpoints, then feeds the
    // median pass, the MAD pass, and the final flag join — without the
    // lineage cut each consumer re-runs the raw hash-agg (three scans
    // of the fact table for one audit).
    val hourly = hourlyCounts(events, keyCol, tsCol).localCheckpoint()
    hourly.join(robustStats(hourly, keyCol, "cnt"), keyCol)
      .withColumn("dev2", abs(col("cnt") * 2 - col("med2")))
      .where(col("dev2") * 2 > col("mad4") * nMads)
      .select(col(keyCol), col("hour"), col("cnt"), col("med2"), col("mad4"))
  }

  private def hourlyCounts(events: DataFrame, keyCol: String,
                           tsCol: String): DataFrame =
    events.groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("cnt"))

  /** The (key, med2, mad4) baseline behind [[robustAnomalies]] — exposed
    * so a STREAM can freeze it from history and flag closing buckets
    * against it ([[graft.streaming.MadAlarm]]): med2 = 2·median of the
    * key's hourly counts, mad4 = 4·MAD, both exact BIGINTs. */
  def madStats(events: DataFrame, keyCol: String, tsCol: String): DataFrame =
    robustStats(hourlyCounts(events, keyCol, tsCol).localCheckpoint(),
      keyCol, "cnt")

  /** The shared robust-stats kernel: per key, med2 = 2·median and
    * mad4 = 4·MAD of an INTEGER value column, both exact BIGINTs (the
    * median of n integers is integral or a half). One rule, one
    * implementation — [[robustAnomalies]]/[[madStats]] use it over
    * hourly counts, [[graft.ops.Similarity.kmeansOutliers]] over
    * centroid distances — so the strict-MAD convention (mad4 = 0 flags
    * any deviation) cannot drift between batch and streaming twins.
    * The |keys|-row median table broadcasts back for the deviation
    * pass; callers with an expensive `df` lineage should checkpoint it
    * first (both passes re-execute it otherwise). */
  def robustStats(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val med = df.groupBy(col(keyCol))
      .agg((percentile(col(valueCol), lit(0.5)) * 2).cast("long").as("med2"))
    df.join(broadcast(med), keyCol)
      .withColumn("dev2", abs(col(valueCol) * 2 - col("med2")))
      .groupBy(col(keyCol))
      .agg(first(col("med2")).as("med2"),
        (percentile(col("dev2"), lit(0.5)) * 2).cast("long").as("mad4"))
  }

  /** CUSUM change-point detection (Page 1954) over each key's gap-filled
    * hourly counts: the one-sided upward statistic
    * Sₜ = max(0, Sₜ₋₁ + xₜ − (μ + k)) with reference μ = the key's mean
    * rate, slack k = μ/2, alarm at h = 4μ — the sequential detector that
    * catches a sustained LEVEL SHIFT a point-outlier rule
    * ([[robustAnomalies]]) never accumulates.
    *
    * The recursion is NOT run as a fold: max(0, ·) has the closed form
    * Sₜ = Pₜ − min(0, min_{i≤t} Pᵢ) over the drift prefix sums
    * Pₜ = Σ_{j≤t} (xⱼ − 1.5μ), so the whole detector is two ordinary
    * window passes (running sum, running min) per key — parallel,
    * incremental, and hash-identical across engines because everything
    * is scaled by 2T into exact BIGINTs (μ = Σx/T never materializes:
    * dₜ = 2T·xₜ − 3Σx, alarm ⇔ 2T·Sₜ > 8Σx·T... cancelled to the
    * per-key constants below). Magnitudes: |dₜ| ≤ 3·Σx ≤ 3·(corpus
    * rows); prefix sums ≤ T·that — upgrade the sums to DECIMAL(38,0)
    * past ~10¹⁴ hourly events per key.
    *
    * Scale: one raw scan (the resample hash-agg); both windows run on
    * the |keys|×|hours| series, co-partitioned by one shuffle on the
    * key. Output is the full scaled trajectory (auditable, and the
    * oracle hash-checks every step, not just the alarms). */
  def cusum(events: DataFrame, keyCol: String, tsCol: String,
            valueCol: String = "value"): DataFrame = {
    val series = resample(events, keyCol, tsCol, valueCol)
      .select(col(keyCol), col("bucket"), col("n"))
    // per-key totals via whole-partition window frames, NOT a self-join:
    // every window below shares one HashPartitioning(key), so the plan is
    // scan → (key,hour) agg → ONE key shuffle → window passes — a
    // grouped-totals join would re-execute the resample subtree (or need
    // a lineage cut) and add a second exchange for nothing.
    val wAll = Window.partitionBy(col(keyCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
    series
      .withColumn("t", count(lit(1)).over(wAll))
      .withColumn("sx", sum(col("n")).over(wAll))
      .withColumn("d", lit(2L) * col("t") * col("n") - lit(3L) * col("sx"))
      .withColumn("p", sum(col("d")).over(w))
      .withColumn("s2t", col("p") - least(lit(0L), min(col("p")).over(w)))
      .select(col(keyCol), col("bucket"), col("n"),
        col("s2t").as("cusum_scaled"),
        (col("s2t") > lit(8L) * col("sx")).as("alarm"))
  }

  /** Retrospective single change-point per key — binary segmentation's
    * first split, the offline twin of [[cusum]]'s online detector: over
    * the gap-filled hourly count series, pick the boundary t (1 ≤ t < T)
    * maximizing the between-segment SSE reduction
    * gain(t) = Sl²/t + Sr²/(T−t) − S²/T. Prefix sums are exact BIGINTs;
    * every square goes through DECIMAL(38,0) BEFORE the product (the
    * drift_cells overflow discipline — a BIGINT Sl² wraps once a key's
    * total count passes ~3e9), and the gain is one deterministic IEEE
    * chain (+,−,×,÷ only), so the ARGMAX itself is engine-portable; ties
    * break on the earlier boundary. Keys with a single bucket have no
    * interior boundary and drop out.
    *
    * Scale: one raw scan (the resample hash-agg), then two window passes
    * sharing one HashPartitioning(key) over the |keys|×|hours| series —
    * series-sized, never event-sized; the argmax is a per-key
    * WindowGroupLimit-prunable rank. */
  def changePoint(events: DataFrame, keyCol: String, tsCol: String,
                  valueCol: String = "value"): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val series = resample(events, keyCol, tsCol, valueCol)
      .select(col(keyCol), col("bucket"), col("n"))
    val wAll = Window.partitionBy(col(keyCol))
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
    val sl = col("sl"); val sr = col("stot") - col("sl")
    val gain = (d38(sl) * d38(sl)).cast("double") / col("t").cast("double") +
      (d38(sr) * d38(sr)).cast("double") /
        (col("tt") - col("t")).cast("double") -
      (d38(col("stot")) * d38(col("stot"))).cast("double") /
        col("tt").cast("double")
    series
      .withColumn("t", row_number().over(wOrd).cast("long"))
      .withColumn("sl", sum(col("n")).over(wOrd))
      .withColumn("tt", count(lit(1)).over(wAll))
      .withColumn("stot", sum(col("n")).over(wAll))
      .where(col("t") < col("tt"))
      .withColumn("gain", gain)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(col("gain").desc, col("t"))))
      .where(col("rn") === 1)
      .select(col(keyCol), col("t").as("t_split"),
        col("bucket").as("split_bucket"), col("tt").as("n_hours"),
        portableRound6(col("gain")).as("gain"),
        portableRound6(sl.cast("double") / col("t").cast("double"))
          .as("mean_before"),
        portableRound6(sr.cast("double") /
          (col("tt") - col("t")).cast("double")).as("mean_after"))
  }

  /** Hour-of-day seasonal profile per key: for each (key, hour-of-day),
    * the mean gap-filled hourly count relative to the key's overall mean
    * — the seasonal index a deseasonalizer divides out and a capacity
    * planner reads directly. Exact until one division:
    * ratio = (Σₕ n · Tₖ) / (Bₕ · Σₖ n) with every product a BIGINT,
    * rounded on the portable 6-decimal grid.
    *
    * Scale: the raw table collapses to the hourly series once; both
    * profile levels are tiny re-aggregations of it (≤ |keys|·24 rows). */
  def seasonalProfile(events: DataFrame, keyCol: String, tsCol: String,
                      valueCol: String = "value"): DataFrame = {
    val series = resample(events, keyCol, tsCol, valueCol)
      .select(col(keyCol), col("bucket"), col("n"))
      .localCheckpoint() // two consumers; without the cut both re-agg raw
    val hod = series
      .groupBy(col(keyCol), hour(col("bucket")).cast("int").as("hod"))
      .agg(sum(col("n")).as("n_sum"), count(lit(1)).as("n_buckets"))
    val tot = series.groupBy(col(keyCol))
      .agg(sum(col("n")).as("t_sum"), count(lit(1)).as("t_buckets"))
    hod.join(broadcast(tot), Seq(keyCol))
      .select(col(keyCol), col("hod"), col("n_sum"), col("n_buckets"),
        portableRound6((col("n_sum") * col("t_buckets")).cast("double") /
          (col("n_buckets") * col("t_sum")).cast("double"))
          .as("seasonal_ratio"))
  }

  /** Lagged cross-correlation between every ordered pair of keys'
    * gap-filled hourly count series: Pearson r of (xₜ, yₜ₊ₗ) for lags
    * 0..maxLag — the lead/lag structure miner (does signup activity lead
    * purchases by 2 hours?). Buckets align on exact integer epoch-hours;
    * all six moments accumulate as BIGINTs, the variance product crosses
    * into DECIMAL(38,0) (it overflows 2⁶³ at ~10⁵ events/hour), and the
    * only float ops are two casts, one sqrt (IEEE-correctly-rounded in
    * every engine, unlike libm ln/exp) and one division, rounded on the
    * 6-decimal grid. Zero-variance series yield NULL r.
    *
    * Scale: the |keys|×|hours| series self-joins on the integer hour —
    * output is |pairs|·|lags| rows; the fact table is long gone. */
  def crossCorrelation(events: DataFrame, keyCol: String, tsCol: String,
                       maxLag: Int = 3, valueCol: String = "value"): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val series = resample(events, keyCol, tsCol, valueCol)
      .select(col(keyCol).as("k"),
        (unix_timestamp(col("bucket").cast("timestamp")) / 3600L)
          .cast("long").as("h"),
        col("n"))
      .localCheckpoint() // consumed twice (both join sides)
    // `hp` is ALIASED before the join on purpose: with the raw
    // `hb === h + lag` condition the multi-join flattener saw
    // Join(Cross(a, lags), b) as one reorderable chain and paired a
    // with b on the only directly-applicable predicate — the NON-equi
    // `ka < kb` — planning a |series|² BroadcastNestedLoopJoin
    // (13M comparisons, a measured 0.7 s single task at sf0.1) and
    // leaving the equi key for a second BNLJ against the lag range.
    // The non-trivial projection stops the flattening, so the lag
    // attach stays first and the b-join keeps its equi key (hash join,
    // |series|·(maxLag+1) probes).
    val a = series.select(col("k").as("ka"), col("h"), col("n").as("x"))
      .crossJoin(spark_range_lags(series, maxLag))
      .select(col("ka"), col("x"), col("lag"),
        (col("h") + col("lag")).as("hp"))
    val b = series.select(col("k").as("kb"), col("h").as("hb"), col("n").as("y"))
    a.join(b, col("hb") === col("hp") && col("ka") < col("kb"))
      .groupBy(col("ka").as("type_a"), col("kb").as("type_b"), col("lag"))
      .agg(count(lit(1)).as("n_overlap"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      // operands cross to DECIMAL(38,0) BEFORE the products (a long
      // n·sxx wraps silently at heavy traffic), and the two exact
      // variance factors cross to double BEFORE den2 (their product is
      // beyond any fixed width) — both engines at the same spots
      .withColumn("den2",
        (col("n_overlap").cast(dec) * col("sxx").cast(dec)
          - col("sx").cast(dec) * col("sx").cast(dec)).cast("double") *
          (col("n_overlap").cast(dec) * col("syy").cast(dec)
            - col("sy").cast(dec) * col("sy").cast(dec)).cast("double"))
      // explicit zero-variance guard: Spark's double / returns NULL on a
      // 0 divisor but DuckDB follows IEEE to ±Inf — never let the hash
      // depend on which convention wins
      .select(col("type_a"), col("type_b"), col("lag"), col("n_overlap"),
        when(col("den2") > 0, portableRound6(
          (col("n_overlap").cast(dec) * col("sxy").cast(dec)
            - col("sx").cast(dec) * col("sy").cast(dec)).cast("double") /
            sqrt(col("den2")))).as("r"))
  }

  /** Granger causality between every ordered pair of keys' gap-filled
    * hourly count series — "does x's PAST improve the prediction of y
    * beyond y's own past?", the directional companion to
    * [[crossCorrelation]]'s symmetric lead/lag r. Lag-1 OLS, solved in
    * closed form from exact integer moments: the restricted model
    * y_t = a + b·y_{t−1} and the unrestricted y_t = a + b·y_{t−1} +
    * c·x_{t−1}; each RSS comes from Cramer's rule on the normal
    * equations — RSS = Σy² − (vᵀ·adj(A)·v)/det(A), where every entry of
    * A, v is a BIGINT moment and the determinant/quadratic-form
    * polynomials evaluate in DECIMAL(38,0) (the oracle mirrors them in
    * HUGEINT). The only float ops are the two exact-numerator → double
    * casts, two divisions, and the F-ratio chain — engine-portable to
    * the bit. F = (RSS_r − RSS_u)·(n−3)/RSS_u (one restriction);
    * singular designs (constant series → collinear regressors) yield
    * null, not a division error.
    *
    * Capacity: the Q polynomial is degree-4 in the moments (sy²·syl2·
    * sxl2) — at ~1e7 events per key-hour-grid it approaches the 38-digit
    * ceiling; past that, rescale the counts (the chi2Term escalation
    * note applies).
    *
    * Scale shape: the raw stream collapses to the |keys|×|hours| grid in
    * ONE hash-agg; the pair join and moments run on the grid only —
    * time-range-bounded, FLAT in corpus size (the ts_xcorr shape). */
  def granger(events: DataFrame, keyCol: String, tsCol: String,
              valueCol: String = "value"): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val series = resample(events, keyCol, tsCol, valueCol)
      .select(col(keyCol).as("k"),
        (unix_timestamp(col("bucket").cast("timestamp")) / 3600L)
          .cast("long").as("h"),
        col("n"))
      .localCheckpoint() // consumed three times (y, y-lag, x-lag legs)
    val e = series.select(col("k").as("effect"), col("h"), col("n").as("y"))
    val el = series.select(col("k").as("ke2"), (col("h") + 1).as("h"),
      col("n").as("yl"))
    val cl = series.select(col("k").as("cause"), (col("h") + 1).as("h"),
      col("n").as("xl"))
    val m = e.join(el, "h").where(col("ke2") === col("effect"))
      .join(cl, "h").where(col("cause") =!= col("effect"))
      .groupBy(col("cause"), col("effect"))
      .agg(count(lit(1)).as("n"),
        sum(col("y")).as("sy"), sum(col("yl")).as("syl"),
        sum(col("xl")).as("sxl"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("y") * col("yl")).as("syyl"),
        sum(col("y") * col("xl")).as("syxl"),
        sum(col("yl") * col("yl")).as("syl2"),
        sum(col("xl") * col("xl")).as("sxl2"),
        sum(col("yl") * col("xl")).as("sylxl"))
    def d(c: String) = col(c).cast(dec)
    val detU = d("n") * (d("syl2") * d("sxl2") - d("sylxl") * d("sylxl")) -
      d("syl") * (d("syl") * d("sxl2") - d("sxl") * d("sylxl")) +
      d("sxl") * (d("syl") * d("sylxl") - d("syl2") * d("sxl"))
    val q =
      d("sy") * d("sy") * (d("syl2") * d("sxl2") - d("sylxl") * d("sylxl")) +
      d("syyl") * d("syyl") * (d("n") * d("sxl2") - d("sxl") * d("sxl")) +
      d("syxl") * d("syxl") * (d("n") * d("syl2") - d("syl") * d("syl")) -
      lit(2) * d("sy") * d("syyl") * (d("syl") * d("sxl2") - d("sxl") * d("sylxl")) +
      lit(2) * d("sy") * d("syxl") * (d("syl") * d("sylxl") - d("syl2") * d("sxl")) -
      lit(2) * d("syyl") * d("syxl") * (d("n") * d("sylxl") - d("syl") * d("sxl"))
    val detR = d("n") * d("syl2") - d("syl") * d("syl")
    val qR = d("sy") * d("sy") * d("syl2") + d("syyl") * d("syyl") * d("n") -
      lit(2) * d("sy") * d("syyl") * d("syl")
    val rssU = col("syy").cast("double") - q.cast("double") / detU.cast("double")
    val rssR = col("syy").cast("double") - qR.cast("double") / detR.cast("double")
    val f = (rssR - rssU) * (col("n").cast("double") - 3.0) / rssU
    val ok = detR > 0 && detU > 0
    m.select(col("cause"), col("effect"), col("n"),
      portableRound6(when(ok, rssR)).as("rss_r"),
      portableRound6(when(ok, rssU)).as("rss_u"),
      portableRound6(when(ok && rssU > 0, f)).as("f_granger"))
  }

  /** Autocorrelation function of each key's gap-filled hourly count
    * series at lags 1..maxLag — the seasonality/persistence detector
    * (a daily cycle shows as a peak at lag 24; white noise decays to ~0
    * by lag 1). The self-lag member of the [[crossCorrelation]] family:
    * same exact-BIGINT moments, same DECIMAL(38,0) variance product,
    * same single sqrt+division on the 6-decimal grid — but joined
    * key=key instead of across keys, so output is |keys|·maxLag rows.
    *
    * Scale shape: the raw stream collapses to the |keys|×|hours| grid
    * in ONE hash-agg (inside resample); the lag self-join runs on the
    * grid only — time-range-bounded, FLAT in corpus size. */
  def autocorrelation(events: DataFrame, keyCol: String, tsCol: String,
                      maxLag: Int = 24, valueCol: String = "value"): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val series = resample(events, keyCol, tsCol, valueCol)
      .select(col(keyCol).as("k"),
        (unix_timestamp(col("bucket").cast("timestamp")) / 3600L)
          .cast("long").as("h"),
        col("n"))
      .localCheckpoint() // consumed twice (both join sides)
    val a = series.select(col("k"), col("h"), col("n").as("x"))
      .crossJoin(spark_range_lags(series, maxLag).where(col("lag") >= 1))
    val b = series.select(col("k").as("kb"), col("h").as("hb"), col("n").as("y"))
    a.join(b, col("kb") === col("k") && col("hb") === col("h") + col("lag"))
      .groupBy(col("k").as(keyCol), col("lag"))
      .agg(count(lit(1)).as("n_overlap"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      // same width discipline as crossCorrelation: DECIMAL operands
      // before products, double factors before den2
      .withColumn("den2",
        (col("n_overlap").cast(dec) * col("sxx").cast(dec)
          - col("sx").cast(dec) * col("sx").cast(dec)).cast("double") *
          (col("n_overlap").cast(dec) * col("syy").cast(dec)
            - col("sy").cast(dec) * col("sy").cast(dec)).cast("double"))
      .select(col(keyCol), col("lag"), col("n_overlap"),
        when(col("den2") > 0, portableRound6(
          (col("n_overlap").cast(dec) * col("sxy").cast(dec)
            - col("sx").cast(dec) * col("sy").cast(dec)).cast("double") /
            sqrt(col("den2")))).as("r"))
  }

  /** Partial autocorrelation (lags 1–3) of each key's hourly count
    * series — the AR-order diagnostic ts_acf can't give: ACF at lag 2
    * is inflated by the lag-1 chain (x_t←x_{t−1}←x_{t−2}); PACF
    * measures lag k's DIRECT effect with the shorter lags regressed
    * out, so an AR(p) process cuts off sharply after lag p — the
    * standard Box–Jenkins order-selection read.
    *
    * Sample ACF with the GLOBAL mean (the stationary estimator
    * Durbin–Levinson requires — ts_acf's per-overlap Pearson is a
    * different statistic): ρ_k multiplied through by N² so every term
    * is an exact DECIMAL(38,0)/HUGEINT integer — N²Σx_tx_{t+k} −
    * N·S·(S_head+S_tail) + (N−k)S² over N·Σx² − S² — then ONE double
    * chain per lag, and the Durbin–Levinson recursion (φ11=ρ1;
    * φ22=(ρ2−ρ1²)/(1−ρ1²); φ33 via the level-2 coefficients) written
    * as the identical double expression in both engines. Constant
    * series (zero variance) yield nulls via the den>0 guard, as do
    * keys shorter than the lag.
    *
    * Scale shape: the corpus collapses in resample's one hash-agg;
    * the lag join is grid-sized (|keys|·hours·3), the result |keys|
    * rows. */
  def pacf(events: DataFrame, keyCol: String, tsCol: String,
           valueCol: String = "value"): DataFrame = {
    val dl = acfRho123(events, keyCol, tsCol, valueCol)
      .withColumn("v1", lit(1.0) - col("r1") * col("r1"))
      .withColumn("phi22",
        when(col("v1") > 0, (col("r2") - col("r1") * col("r1")) / col("v1")))
      .withColumn("phi21", col("r1") - col("phi22") * col("r1"))
      .withColumn("v2",
        col("v1") * (lit(1.0) - col("phi22") * col("phi22")))
    dl.select(col("k").as(keyCol), col("nn").as("n_hours"),
      portableRound6(col("r1")).as("r1"),
      portableRound6(col("r2")).as("r2"),
      portableRound6(col("r3")).as("r3"),
      portableRound6(col("r1")).as("pacf1"),
      portableRound6(col("phi22")).as("pacf2"),
      portableRound6(when(col("v2") > 0,
        (col("r3") - col("phi21") * col("r2") - col("phi22") * col("r1"))
          / col("v2"))).as("pacf3"))
  }

  /** Ljung–Box portmanteau Q over lags 1–3 of each key's hourly count
    * series — the "is this white noise" gate that must pass before
    * ts_forecast_interval's residual bands or stat inference on the
    * series can be trusted: under independence Q ~ χ²(3); a large Q
    * says the autocorrelation structure ts_pacf profiles is REAL, not
    * sampling noise. Q = n(n+2)·Σ_k ρ_k²/(n−k) on the same exact
    * integer-moment ρ's as pacf (shared [[acfRho123]] pipeline), one
    * fixed-arity double chain — null whenever a lag is missing or the
    * series is constant. */
  def ljungBox(events: DataFrame, keyCol: String, tsCol: String,
               valueCol: String = "value"): DataFrame = {
    val base = acfRho123(events, keyCol, tsCol, valueCol)
    val nd = col("nn").cast("double")
    val q = nd * (nd + lit(2.0)) *
      (col("r1") * col("r1") / (nd - lit(1.0)) +
        col("r2") * col("r2") / (nd - lit(2.0)) +
        col("r3") * col("r3") / (nd - lit(3.0)))
    base.select(col("k").as(keyCol), col("nn").as("n_hours"),
      portableRound6(col("r1")).as("r1"),
      portableRound6(col("r2")).as("r2"),
      portableRound6(col("r3")).as("r3"),
      portableRound6(q).as("q_lb"))
  }

  /** Shared exact-moment sample-ACF pipeline (lags 1–3, global mean,
    * multiplied through by N² — see [[pacf]]): one row per key with
    * UNROUNDED ρ₁..ρ₃ doubles (null on constant/short keys), the
    * common input of pacf's Durbin–Levinson chain and ljungBox's Q. */
  private def acfRho123(events: DataFrame, keyCol: String, tsCol: String,
                        valueCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val series = resample(events, keyCol, tsCol, valueCol)
      .select(col(keyCol).as("k"),
        (unix_timestamp(col("bucket").cast("timestamp")) / 3600L)
          .cast("long").as("h"),
        col("n"))
      .localCheckpoint() // three consumers: totals + both lag-join sides
    val tot = series.groupBy(col("k").as("kt"))
      .agg(count(lit(1)).as("nn"), sum(col("n")).as("s"),
        sum(col("n").cast(dec) * col("n").cast(dec)).as("sxx"))
    val a = series.select(col("k"), col("h"), col("n").as("x"))
      .crossJoin(spark_range_lags(series, 3).where(col("lag") >= 1))
    val b = series.select(col("k").as("kb"), col("h").as("hb"),
      col("n").as("y"))
    val perLag = a
      .join(b, col("kb") === col("k") && col("hb") === col("h") + col("lag"))
      .groupBy(col("k"), col("lag"))
      .agg(sum(col("x").cast(dec) * col("y").cast(dec)).as("sxy"),
        sum(col("x")).as("sh"), sum(col("y")).as("st"))
    def pick(l: Int, c: String) =
      max(when(col("lag") === l, col(c))).as(s"$c$l")
    val pivAggs = Seq(1, 2, 3).flatMap(l =>
      Seq(pick(l, "sxy"), pick(l, "sh"), pick(l, "st")))
    // key universe from the totals side: a key too short for even
    // lag 1 (single bucket) must surface as a null row, not vanish
    // (the ts_hurst convention)
    val piv = perLag.groupBy(col("k")).agg(pivAggs.head, pivAggs.tail: _*)
    val j = tot.join(piv, col("kt") === col("k"), "left")
    val nD = col("nn").cast(dec)
    val sD = col("s").cast(dec)
    val denDec = nD * col("sxx") - sD * sD
    val nd = col("nn").cast("double")
    def rho(l: Int) = when(denDec > 0 && col(s"sxy$l").isNotNull,
      (nD * nD * col(s"sxy$l")
        - nD * sD * (col(s"sh$l") + col(s"st$l")).cast(dec)
        + (nD - lit(l).cast(dec)) * sD * sD).cast("double") /
        denDec.cast("double") / nd)
    j.select(col("kt").as("k"), col("nn"),
      rho(1).as("r1"), rho(2).as("r2"), rho(3).as("r3"))
  }

  /** Hurst exponent (rescaled-range) of each key's hourly count series
    * — the LONG-memory read the lag-bounded diagnostics (ts_acf/ts_pacf
    * stop at a few hours) cannot give: H ≈ 0.5 for independent traffic,
    * H → 1 for persistent/trending load (capacity must be planned on
    * runs, not means), H < 0.5 for mean-reverting. Classic R/S over
    * dyadic block sizes m ∈ {8,16,32,64}:
    *
    * Within each full block, the range of cumulative deviations and the
    * deviation sd share the block denominator m, which CANCELS in R/S —
    * so R/S = (max−min of m·prefix_j − j·S) / √(m·Σx² − S²), integer
    * numerators and an integer radicand, ONE sqrt + division per block.
    * Per-block R/S is quantized to the 1e-6 grid and summed exactly
    * (the jackknife discipline — cross-block float sums are
    * order-dependent); zero-variance blocks drop (their R is 0/0).
    * H is the least-squares slope of log₂(mean R/S) on log₂(m), and the
    * dyadic sizes make the x-axis EXACT integers 3..6 — the regression
    * collapses to fixed rational weights (Σu=18, Σu²=86, den=20), so
    * the only libm calls are the four log2's, 4dp-rounded (the
    * vocab_entropy precedent). Null H when any size lacks a valid
    * block.
    *
    * Scale shape: corpus gone after resample's hash-agg; one window
    * shuffle over the 4×-exploded grid; output |keys| rows. */
  def hurst(events: DataFrame, keyCol: String, tsCol: String,
            valueCol: String = "value"): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val sizes = Seq(8, 16, 32, 64)
    val series = resample(events, keyCol, tsCol, valueCol)
      .withColumn("t", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(keyCol)).orderBy(col("bucket"))) - 1)
      .select(col(keyCol).as("k"), col("t"), col("n").as("x"))
    val g = series
      .select(col("k"), col("t"), col("x"),
        explode(typedlit(sizes)).as("m"))
      .withColumn("b", graft.ops.Stats.fdiv(col("t"), col("m")))
      .withColumn("j", pmod(col("t"), col("m")) + 1)
    val wSeq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k"), col("m"), col("b")).orderBy(col("j"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wBlk = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k"), col("m"), col("b"))
    val blocks = g
      .withColumn("prefix", sum(col("x")).over(wSeq))
      .withColumn("s", sum(col("x")).over(wBlk))
      .withColumn("cnt", count(lit(1)).over(wBlk))
      .withColumn("sxx",
        sum(col("x").cast(dec) * col("x").cast(dec)).over(wBlk))
      .where(col("cnt") === col("m"))
      .withColumn("ym", col("m") * col("prefix") - col("j") * col("s"))
      .groupBy(col("k"), col("m"), col("b"))
      .agg(max(col("ym")).as("ymax"), min(col("ym")).as("ymin"),
        max(col("m").cast(dec) * col("sxx")
          - col("s").cast(dec) * col("s").cast(dec)).as("d2"))
    val q = round((col("ymax") - col("ymin")).cast("double") /
      sqrt(col("d2").cast("double")) * lit(1.0e6), 0).cast("long")
    val perSize = blocks
      .where(col("d2") > 0)
      .select(col("k"), col("m"), q.as("q"))
      .groupBy(col("k"), col("m"))
      .agg(count(lit(1)).as("nb"), sum(col("q").cast(dec)).as("sq"))
    def pick(m: Int, c: String) =
      max(when(col("m") === m, col(c))).as(s"$c$m")
    val pivAggs = sizes.flatMap(m => Seq(pick(m, "nb"), pick(m, "sq")))
    // key universe first: a key whose every block is zero-variance
    // (constant traffic) must surface as a null row, not vanish
    val piv = series.select(col("k")).distinct()
      .join(perSize.groupBy(col("k")).agg(pivAggs.head, pivAggs.tail: _*),
        Seq("k"), "left")
    def rs(m: Int) = col(s"sq$m").cast("double") /
      col(s"nb$m").cast("double") / lit(1.0e6)
    def v(m: Int) = when(col(s"nb$m") > 0, log2(rs(m)))
    val suv = lit(3.0) * v(8) + lit(4.0) * v(16) +
      lit(5.0) * v(32) + lit(6.0) * v(64)
    val sv = v(8) + v(16) + v(32) + v(64)
    // Σu = 18, Σu² = 86, k = 4 over the exact log2 sizes u = 3..6:
    // slope denominator 4·86 − 18² = 20
    val hurstC = (lit(4.0) * suv - lit(18.0) * sv) / lit(20.0)
    piv.select(
      Seq(col("k").as(keyCol)) ++
        sizes.map(m => coalesce(col(s"nb$m"), lit(0L)).as(s"nb$m")) ++
        sizes.map(m =>
          portableRound6(when(col(s"nb$m") > 0, rs(m))).as(s"rs$m")) :+
        portableRound4(hurstC).as("hurst"): _*)
  }

  /** Micro-scaled trig tables for [[periodogram]] — computed ONCE in
    * Scala and injected as literals into BOTH engines (the
    * discountMicros / minhash-seed pattern), so no libm cos/sin runs
    * inside either engine's per-row path. */
  private[graft] def cosMicros(p: Int): IndexedSeq[Long] =
    IndexedSeq.tabulate(p)(k => math.round(math.cos(2 * math.Pi * k / p) * 1e6))
  private[graft] def sinMicros(p: Int): IndexedSeq[Long] =
    IndexedSeq.tabulate(p)(k => math.round(math.sin(2 * math.Pi * k / p) * 1e6))

  /** Fixed-frequency periodogram of each key's hourly count series —
    * the spectral "how strongly daily / weekly is this signal" read
    * behind seasonality-aware forecasting and anomaly baselines
    * (ts_holtwinters assumes a 24 h season; this MEASURES whether that
    * assumption holds, and whether a 168 h one would too).
    *
    * For period P ∈ {24, 168}: the Fourier component at frequency 1/P
    * is A = N·Σxₜcμ(t mod P) − S·Σcμ(t mod P), B likewise with sin —
    * mean-removed WITHOUT forming the rational mean (multiply through
    * by N, the stat_trimmed integer trick), every sum an exact
    * DECIMAL(38,0) over micro-scaled literal trig tables. amp is the
    * fitted sinusoid's per-hour amplitude 2·√(A²+B²)/(N²·10⁶);
    * strength = amp²/2 ÷ series variance is the variance fraction that
    * component explains (≈1 for a pure sinusoid, ~0 for white noise) —
    * null for a constant series. One hash-agg after resample's grid:
    * the corpus is gone after one shuffle, the per-key state is six
    * integers per period.
    *
    * Reference behavior: numaflow pipelines feed downstream seasonal
    * forecast/alarm vertices (docs/user-guide §monitoring); the
    * periodogram is the batch diagnostic that sizes those windows. */
  def periodogram(events: DataFrame, keyCol: String, tsCol: String,
                  valueCol: String = "value"): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val series = resample(events, keyCol, tsCol, valueCol)
      .select(col(keyCol),
        (unix_timestamp(col("bucket").cast("timestamp")) / 3600L)
          .cast("long").as("h"),
        col("n"))
    def trig(p: Int, table: IndexedSeq[Long]): Column =
      element_at(typedlit(table), (pmod(col("h"), lit(p)) + 1).cast("int"))
    val aggs = Seq(
      count(lit(1)).as("nh"),
      sum(col("n")).cast(dec).as("s"),
      sum(col("n").cast(dec) * col("n").cast(dec)).as("snn")) ++
      Seq(24, 168).flatMap { p =>
        Seq(
          sum(col("n").cast(dec) * trig(p, cosMicros(p)).cast(dec))
            .as(s"snc$p"),
          sum(trig(p, cosMicros(p))).cast(dec).as(s"sc$p"),
          sum(col("n").cast(dec) * trig(p, sinMicros(p)).cast(dec))
            .as(s"sns$p"),
          sum(trig(p, sinMicros(p))).cast(dec).as(s"ss$p"))
      }
    val m = series.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
    val nd = col("nh").cast("double")
    val vard = (col("nh").cast(dec) * col("snn") - col("s") * col("s"))
      .cast("double") / (nd * nd)
    def component(p: Int): Seq[Column] = {
      val ad = (col("nh").cast(dec) * col(s"snc$p") - col("s") * col(s"sc$p"))
        .cast("double")
      val bd = (col("nh").cast(dec) * col(s"sns$p") - col("s") * col(s"ss$p"))
        .cast("double")
      val p2 = ad * ad + bd * bd
      val den = nd * nd * lit(1.0e6)
      Seq(
        portableRound6(lit(2.0) * sqrt(p2) / den).as(s"amp_$p"),
        when(vard > 0, portableRound6(lit(2.0) * p2 / (den * den) / vard))
          .as(s"strength_$p"))
    }
    m.select(col(keyCol) +: col("nh").as("n_hours") +:
      (component(24) ++ component(168)): _*)
  }

  /** Dominant-period detection per key — ts_periodogram generalized
    * from "how strong are 24 h / 168 h" to "WHICH period is strongest"
    * over the candidate grid {6, 8, 12, 24, 84, 168} h (the periods a
    * traffic series plausibly carries: intra-day harmonics, daily,
    * half-weekly, weekly). Same exact machinery — injected trig
    * literals, mean removal multiplied through by N — emitting one
    * (period, amp, strength) row per candidate, then a |keys|·6-row
    * rank window picks the strongest (ties break on the SHORTER
    * period; constant series keep a null-strength row). This is the
    * number ts_holtwinters' season length should be SET from. */
  def autoperiod(events: DataFrame, keyCol: String, tsCol: String,
                 valueCol: String = "value",
                 periods: Seq[Int] = Seq(6, 8, 12, 24, 84, 168)): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val series = resample(events, keyCol, tsCol, valueCol)
      .select(col(keyCol).as("k"),
        (unix_timestamp(col("bucket").cast("timestamp")) / 3600L)
          .cast("long").as("h"),
        col("n"))
    def trig(p: Int, table: IndexedSeq[Long]): Column =
      element_at(typedlit(table), (pmod(col("h"), lit(p)) + 1).cast("int"))
    val aggs = Seq(
      count(lit(1)).as("nh"),
      sum(col("n")).cast(dec).as("s"),
      sum(col("n").cast(dec) * col("n").cast(dec)).as("snn")) ++
      periods.flatMap { p =>
        Seq(
          sum(col("n").cast(dec) * trig(p, cosMicros(p)).cast(dec))
            .as(s"snc$p"),
          sum(trig(p, cosMicros(p))).cast(dec).as(s"sc$p"),
          sum(col("n").cast(dec) * trig(p, sinMicros(p)).cast(dec))
            .as(s"sns$p"),
          sum(trig(p, sinMicros(p))).cast(dec).as(s"ss$p"))
      }
    val m = series.groupBy(col("k")).agg(aggs.head, aggs.tail: _*)
    val nd = col("nh").cast("double")
    val vard = (col("nh").cast(dec) * col("snn") - col("s") * col("s"))
      .cast("double") / (nd * nd)
    def row(p: Int): Column = {
      val ad = (col("nh").cast(dec) * col(s"snc$p") - col("s") * col(s"sc$p"))
        .cast("double")
      val bd = (col("nh").cast(dec) * col(s"sns$p") - col("s") * col(s"ss$p"))
        .cast("double")
      val p2 = ad * ad + bd * bd
      val den = nd * nd * lit(1.0e6)
      struct(lit(p.toLong).as("period"),
        portableRound6(lit(2.0) * sqrt(p2) / den).as("amp"),
        when(vard > 0, portableRound6(lit(2.0) * p2 / (den * den) / vard))
          .as("strength"))
    }
    val rows = m.select(col("k"), col("nh"),
        explode(array(periods.map(row): _*)).as("r"))
      .select(col("k"), col("nh"), col("r.period").as("period"),
        col("r.amp").as("amp"), col("r.strength").as("strength"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("k"))
      .orderBy(col("strength").desc_nulls_last, col("period").asc)
    rows.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("k").as(keyCol), col("nh").as("n_hours"),
        col("period").as("best_period"), col("amp"), col("strength"))
  }

  /** Additive trend/seasonal/residual decomposition of each key's
    * hourly count series — the STL idea with EXACT arithmetic: trend is
    * a centered 25-bucket moving mean, so trend·25 is an integer;
    * seasonal is the hour-of-day mean of the detrended interior, so
    * seasonal·(25·cnt_hod) is an integer; and the residual shares the
    * common denominator 25·cnt_hod — every component is one integer
    * numerator over one integer denominator, a SINGLE float division
    * each, rounded on the 6dp grid (no running float sums anywhere, so
    * no engine can disagree on an addition order). Edge buckets
    * (incomplete 25-window) report null components — the honest answer,
    * not an extrapolation.
    *
    * Scale shape: two grid-bounded windows + one |keys|×24 join; the
    * corpus is gone after resample's one hash-agg. */
  def decompose(events: DataFrame, keyCol: String, tsCol: String,
                valueCol: String = "value"): DataFrame = {
    val series = resample(events, keyCol, tsCol, valueCol)
      .select(col(keyCol), col("bucket"), col("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("bucket")).rowsBetween(-12, 12)
    val t = series
      .withColumn("s25", sum(col("n")).over(w))
      .withColumn("c25", count(lit(1)).over(w))
      .localCheckpoint() // seasonal agg + final projection both read it
    // sea derives FROM t: alias its key before the join, or Spark's
    // self-join ambiguity check rejects the plan
    val sea = t.where(col("c25") === 25)
      .groupBy(col(keyCol).as("__sea_key"),
        hour(col("bucket")).cast("int").as("hod"))
      .agg(sum(lit(25L) * col("n") - col("s25")).as("num"),
        count(lit(1)).as("cnt"))
    val interior = col("c25") === 25
    t.join(sea, col(keyCol) === col("__sea_key") &&
        hour(col("bucket")).cast("int") === col("hod"), "left")
      .select(col(keyCol), col("bucket"), col("n"),
        when(interior, portableRound6(
          col("s25").cast("double") / 25.0)).as("trend"),
        when(interior, portableRound6(
          col("num").cast("double") / (lit(25L) * col("cnt")).cast("double")))
          .as("seasonal"),
        when(interior, portableRound6(
          (lit(25L) * col("cnt") * col("n") - col("cnt") * col("s25")
            - col("num")).cast("double") /
            (lit(25L) * col("cnt")).cast("double"))).as("resid"))
  }

  /** Banded Theil–Sen trend slope per key: the median of pairwise
    * slopes (nⱼ−nᵢ)/(j−i) over the gap-filled hourly grid, restricted
    * to pairs at most `maxLag` hours apart. The robust alternative to
    * OLS trend (one spike moves the mean slope, not the median), and
    * the band is what makes it deployable: full Theil–Sen is O(T²) in
    * the series length, the band is O(T·maxLag) — and local slopes are
    * the ones that carry trend signal anyway.
    *
    * Median extraction is EXPLICIT (the two middle row_numbers, then
    * their mean) rather than an engine quantile call — percentile
    * interpolation formulas differ across engines in the last ulp; the
    * value at a rank of a sorted multiset does not. Slopes are exact
    * integer differences cast once to double; the only other float ops
    * are one mean of ≤2 values and the 6dp rounding.
    *
    * Scale shape: the slope table is grid²-band-bounded (never
    * corpus-bounded); one window sort per key over it. */
  /** Hourly (k, h, n) grid for the banded pair kernels, lineage-cut and
    * SPREAD across the session's task slots: the grid is tiny after the
    * resample aggregate (AQE coalesces it to one partition), but every
    * grid row fans ×band in the downstream pair join, so the whole
    * kernel otherwise lands on ONE task (measured: theilSen's slope
    * stage was a single 780 ms task at sf0.1; spread, the query runs
    * 1.17 → 0.87 s). Width = defaultParallelism — compute-proportional
    * (the fan multiplies CPU, not bytes), and it follows the session's
    * core budget at every scale. */
  private def bandedGrid(events: DataFrame, keyCol: String, tsCol: String,
                         valueCol: String): DataFrame =
    resample(events, keyCol, tsCol, valueCol)
      .select(col(keyCol).as("k"),
        (unix_timestamp(col("bucket").cast("timestamp")) / 3600L)
          .cast("long").as("h"),
        col("n"))
      .repartition(events.sparkSession.sparkContext.defaultParallelism,
        col("k"), col("h"))
      .localCheckpoint()

  def theilSen(events: DataFrame, keyCol: String, tsCol: String,
               maxLag: Int = 48, valueCol: String = "value"): DataFrame = {
    // consumed twice (both join sides)
    val series = bandedGrid(events, keyCol, tsCol, valueCol)
    val a = series.select(col("k"), col("h"), col("n").as("x"))
      .crossJoin(spark_range_lags(series, maxLag).where(col("lag") >= 1))
    val b = series.select(col("k").as("kb"), col("h").as("hb"),
      col("n").as("y"))
    val slopes = a.join(b,
        col("kb") === col("k") && col("hb") === col("h") + col("lag"))
      .select(col("k"),
        ((col("y") - col("x")).cast("double") / col("lag").cast("double"))
          .as("s"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("s"))
    slopes
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("k"))))
      // Spark's `/` on longs is DOUBLE division — floor() recovers the
      // integer middle ranks ((cnt+1)÷2, cnt÷2+1; equal when cnt is odd)
      .where(col("rn") === floor((col("cnt") + 1) / 2) ||
        col("rn") === floor(col("cnt") / 2) + 1)
      .groupBy(col("k").as(keyCol))
      .agg(first(col("cnt")).cast("long").as("n_slopes"),
        portableRound6(sum(col("s")) / count(lit(1))).as("slope_med"))
  }

  /** lag values 0..maxLag as a one-column broadcastable frame (built
    * from the session of `like`, not a driver literal list — keeps the
    * helper serializable-free). */
  private def spark_range_lags(like: DataFrame, maxLag: Int): DataFrame =
    like.sparkSession.range(maxLag + 1L).select(col("id").cast("long").as("lag"))

  /** Banded EXACT matrix profile over the hourly grid (Yeh et al. 2016,
    * the motif/discord primitive, restated relationally): for every
    * length-`subLen` subsequence of each key's hourly-count series, the
    * squared Euclidean distance to its nearest neighbor among
    * subsequences `minLag..maxLag` hours away, either direction. Low
    * mp2 = motif (a repeated shape — e.g. the daily cycle repeating),
    * high mp2 = discord (the series' most anomalous window — the
    * subsequence-level generalization of ts_anomaly's pointwise
    * z-score). The band does double duty: it is the O(T·band) cost cap
    * (full matrix profile is O(T²)) AND the exclusion zone that keeps a
    * subsequence from trivially matching its own overlap — the
    * ts_theil_sen banding argument applied to distances.
    *
    * Exactness: distances on integer hourly counts — d_t = (x_t −
    * x_{t+lag})² per lag, dist²(i, i+lag) = Σ_{t∈[i, i+subLen)} d_t, a
    * rolling BIGINT sum (exact while hourly deltas < 6·10⁸, i.e. until
    * d2·subLen crosses 2⁶³; cents-grade exact at any realistic rate).
    * The nearest neighbor ties break by SIGNED lag ascending
    * (backward match preferred) — a total order both engines share.
    *
    * Scale shape: the |lags|-way fan-out joins grid rows (key-hour
    * aggregates, not raw events); the rolling sum is one window sort
    * per (key, lag) partition — T rows each, parallel across the
    * key×lag grid, never a global sort; the endpoint union doubles a
    * banded table. Nothing touches raw-event cardinality past the
    * hourly aggregate. */
  /** SAX-style shape census — the SCALE PATH beside [[matrixProfile]]'s
    * exact band (the LSH-vs-exact-verify pattern of the dedup family,
    * restated for motifs): non-overlapping `windowHours` windows per
    * key, each summarized as a `segments`-bit SHAPE WORD (bit j set ⇔
    * segment j's count sum exceeds the window mean — the exact,
    * z-norm-free analogue of SAX's symbolization), then a census of
    * identical words. A word with many windows is a recurring daily
    * shape; a word seen once is a shape-level discord candidate worth
    * the exact profile's attention.
    *
    * Everything is hash-agg arithmetic on exact integers — window
    * index and segment index are floor divisions off the key's anchor
    * hour, the above-mean test is `segments·s_j > total` (integer, no
    * division), and the census is one more hash-agg. NO window
    * functions, NO joins past the |keys|-row anchor broadcast and the
    * per-window totals join: at any corpus size the cost past the
    * hourly aggregate is |keys|·T rows through three hash-aggs. */
  def shapeCensus(events: DataFrame, keyCol: String, tsCol: String,
                  windowHours: Int = 24, segments: Int = 4): DataFrame = {
    require(windowHours % segments == 0, "segments must divide windowHours")
    val segLen = windowHours / segments
    val series = resample(events, keyCol, tsCol, "value")
      .select(col(keyCol).as("k"),
        (unix_timestamp(col("bucket").cast("timestamp")) / 3600L)
          .cast("long").as("h"),
        col("n"))
      .localCheckpoint() // anchor agg + the segment join both read it
    val anchors = series.groupBy(col("k")).agg(min(col("h")).as("h0"))
    val seg = series.join(broadcast(anchors), "k")
      .select(col("k"),
        // Spark's `/` on longs is double division — exact below 2⁵³,
        // and cast("long") floors the non-negative offsets
        ((col("h") - col("h0")) / windowHours).cast("long").as("win"),
        (((col("h") - col("h0")) % windowHours) / segLen).cast("long")
          .as("sidx"),
        col("n"))
      .groupBy(col("k"), col("win"), col("sidx"))
      .agg(sum(col("n")).as("s"), count(lit(1)).as("hours"))
      .localCheckpoint() // window totals + the word fold both read it
    val totals = seg.groupBy(col("k"), col("win"))
      .agg(sum(col("s")).as("total"), sum(col("hours")).as("nh"))
    seg.join(totals, Seq("k", "win"))
      .where(col("nh") === windowHours) // complete windows only
      .groupBy(col("k"), col("win"))
      .agg(sum(when(lit(segments.toLong) * col("s") > col("total"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(sidx AS INT))"))
        .otherwise(0L)).as("word"))
      .groupBy(col("k").as(keyCol), col("word"))
      .agg(count(lit(1)).as("n_windows"),
        min(col("win")).as("first_win"), max(col("win")).as("last_win"))
  }

  def matrixProfile(events: DataFrame, keyCol: String, tsCol: String,
                    subLen: Int = 24, minLag: Int = 12,
                    maxLag: Int = 48): DataFrame = {
    // both sides of the lag join; spread for the ×|lags| fan
    val series = bandedGrid(events, keyCol, tsCol, "value")
    val a = series.crossJoin(
      spark_range_lags(series, maxLag).where(col("lag") >= minLag))
    val b = series.select(col("k").as("kb"), col("h").as("hb"),
      col("n").as("y"))
    val d = a.join(b,
        col("kb") === col("k") && col("hb") === col("h") + col("lag"))
      .select(col("k"), col("lag"), col("h"),
        ((col("n") - col("y")) * (col("n") - col("y"))).as("d2"))
    val w = Window.partitionBy(col("k"), col("lag")).orderBy(col("h"))
      .rowsBetween(Window.currentRow, subLen - 1)
    // the grid is contiguous per key (resample gap-fills), so a frame
    // holding exactly subLen rows IS the [h, h+subLen) hour window
    val dist = d
      .select(col("k"), col("lag"), col("h"),
        sum(col("d2")).over(w).as("dist2"),
        count(lit(1)).over(w).as("m"))
      .where(col("m") === subLen)
      .localCheckpoint() // both endpoint assignments read it
    dist.select(col("k"), col("h").as("i"), col("dist2"),
        col("lag").as("nn_lag"))
      .unionAll(dist.select(col("k"), (col("h") + col("lag")).as("i"),
        col("dist2"), (-col("lag")).as("nn_lag")))
      .groupBy(col("k"), col("i"))
      .agg(min(struct(col("dist2"), col("nn_lag"))).as("s"))
      .select(col("k").as(keyCol), col("i").as("h"),
        col("s.dist2").as("mp2"), col("s.nn_lag").as("nn_lag"))
  }

  /** Mann–Kendall trend test per key over the hourly count series — the
    * standard NONPARAMETRIC "is this metric trending" monitor (Mann 1945,
    * Kendall 1975): S = Σ_{i<j} sgn(xⱼ − xᵢ) over all bucket pairs, with
    * the tie-corrected variance Var(S) = [n(n−1)(2n+5) −
    * Σ_g t_g(t_g−1)(2t_g+5)] / 18 and the continuity-corrected normal
    * score z = (S∓1)/√Var(S). Robust to outliers and any monotone
    * transform of the counts — exactly what a regression slope on bursty
    * event data is not.
    *
    * Everything up to the final z is INTEGER-exact: S and both variance
    * terms are 64-bit sums (n is bucket-grid-bounded, so n³ ≪ 2⁶³), and
    * the single float op is one division + sqrt on the 6dp grid — no
    * accumulation order for engines to disagree on. Scale shape: the
    * corpus collapses in resample's one hash-agg; the pair space is
    * T²-bounded per key (T = time span in buckets, which does NOT grow
    * with corpus size), so the curve is FLAT past the first agg. */
  def mannKendall(events: DataFrame, keyCol: String, tsCol: String,
                  valueCol: String = "value"): DataFrame = {
    val series = resample(events, keyCol, tsCol, valueCol)
      .select(col(keyCol).as("k"), col("bucket"), col("n"))
      .localCheckpoint() // three consumers: both pair sides + tie groups
    val a = series.select(col("k"), col("bucket").as("ba"), col("n").as("xa"))
    val b = series.select(col("k").as("kb"), col("bucket").as("bb"),
      col("n").as("xb"))
    val s = a.join(b, col("kb") === col("k") && col("ba") < col("bb"))
      .groupBy(col("k"))
      .agg(sum(signum(col("xb") - col("xa")).cast("long")).as("s"),
        count(lit(1)).as("n_pairs"))
    val ties = series.groupBy(col("k"), col("n"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("k"))
      .agg(sum(col("t")).as("nb"),
        sum(col("t") * (col("t") - 1) * (lit(2L) * col("t") + 5)).as("tie_term"))
    s.join(ties, "k")
      .withColumn("var18",
        col("nb") * (col("nb") - 1) * (lit(2L) * col("nb") + 5) - col("tie_term"))
      .select(col("k").as(keyCol), col("nb").as("n_buckets"), col("s"),
        col("var18"), // Var(S)·18, integer-exact
        portableRound6(
          when(col("var18") <= 0 || col("s") === 0, lit(0.0))
            .when(col("s") > 0,
              (col("s") - 1).cast("double") /
                sqrt(col("var18").cast("double") / 18.0))
            .otherwise((col("s") + 1).cast("double") /
              sqrt(col("var18").cast("double") / 18.0))).as("z"))
  }
}
