package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Stats

/** Streaming CUPED monitor: per-window variance-reduced A/B means — the
  * live companion to the batch [[graft.ops.Stats.cupedMeans]], closing
  * the experimentation trio (AnovaStream = "is there a difference",
  * SprtStream = "stop early", CupedStream = "read the effect size with
  * the between-user noise removed").
  *
  * The covariate artifact is FROZEN from history (the MadAlarm /
  * EmbeddingGuard convention): `profile` carries each user's pre-period
  * cents X, and (θ, X̄) come from the batch fit — a live window must
  * not refit θ on itself, both because the pre-period predates
  * assignment by definition and because a refit would let a treatment
  * effect leak into its own control variate. Users without a profile
  * row enter with X = 0, exactly the batch op's missing-pre-period
  * convention.
  *
  * Shape: per-(window, user) cents sums (stateful agg #1) →
  * broadcast-join the profile (stream-static, map-side) → per-(window,
  * variant) sums (stateful agg #2, the Spark 4 chained pattern) → the
  * SAME [[Stats.cupedRawMean]]/[[Stats.cupedAdjustedMean]] expressions
  * as the batch report, so stream ≡ batch is one formula. State is
  * bounded by open windows × active users (agg #1) + windows × variants
  * (agg #2). */
object CupedStream {

  /** @param profile  (user, x_cents): frozen pre-period cents per user.
    * @param theta    pooled θ from the batch fit (per cents).
    * @param meanXCents pooled pre-period mean X̄ from the batch fit, in
    *                   cents (the same scale `profile` carries). */
  def windowedMeans(stream: DataFrame, userCol: String, valueCol: String,
                    tsCol: String, profile: DataFrame,
                    theta: Double, meanXCents: Double,
                    windowLen: String = "1 hour",
                    delay: String = "5 minutes"): DataFrame = {
    val perUser = stream
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowLen).as("w"),
        col(userCol).as("u"))
      .agg(sum(Stats.cents(col(valueCol))).as("yu"))
    val prof = profile.select(col(profile.columns(0)).as("u"),
      col(profile.columns(1)).cast("long").as("xu"))
    perUser
      .join(broadcast(prof), Seq("u"), "left")
      .withColumn("xu", coalesce(col("xu"), lit(0L)))
      .withColumn("variant", pmod(col("u"), lit(2)).cast("int"))
      .groupBy(col("w"), col("variant"))
      .agg(count(lit(1)).as("nv"), sum(col("xu")).as("sxv"),
        sum(col("yu")).as("syv"))
      .select(col("w.start").as("bucket"), col("variant"),
        col("nv").as("n_users"),
        Stats.cupedRawMean(col("syv"), col("nv")).as("mean_raw"),
        Stats.cupedAdjustedMean(col("syv"), col("sxv"), col("nv"),
          lit(theta), lit(meanXCents)).as("mean_cuped"))
  }
}
