package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Stats

/** Streaming Bayesian A/B readout — the windowed twin of the batch
  * `stat_bayes_ab` query: per closing event-time window, each arm's
  * conversion rate gets a Beta(1+s, 1+n−s) posterior and the emitted
  * number is P(p_B > p_A) under the normal approximation — the
  * "probability B is better" a live experiment dashboard shows instead
  * of a p-value (always-valid to peek at, unlike the fixed-horizon
  * t-test: the posterior is a state, not a stopping rule).
  *
  * One windowed aggregate over exact counts (map-side partials absorb
  * the volume; state = one 4-long row per open window); the posterior
  * moments are the SAME double ratios of exact counts as the batch
  * plan and Φ is the shared A&S 26.2.17 polynomial literal
  * ([[Stats.normCdf]] — never an engine libm), so a frozen-window
  * replay reproduces the batch row bit for bit (spec). Degenerate arms
  * are never a failure mode: the +1/+2/+3 posterior smoothing keeps
  * every denominator positive at n = 0. */
object BayesAbStream {

  /** @param stream  event rows: `tsCol` event time, `variantCol` 0/1
    *                arm, `convCol` boolean conversion flag.
    * @return per closed window: bucket (window start), per-arm trial
    *         and success counts, 6dp z and P(B > A). */
  def windowedPosterior(stream: DataFrame, tsCol: String,
                        variantCol: String, convCol: String,
                        windowDur: String = "1 hour",
                        delay: String = "5 minutes"): DataFrame = {
    val m = stream
      .withWatermark(tsCol, delay)
      .select(col(tsCol), col(variantCol).cast("long").as("variant"),
        col(convCol).cast("boolean").as("conv"))
      .groupBy(window(col(tsCol), windowDur).as("w"))
      .agg(
        sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("variant") === 0 && col("conv"), 1L).otherwise(0L))
          .as("s0"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("variant") === 1 && col("conv"), 1L).otherwise(0L))
          .as("s1"))
    // the batch stat_bayes_ab posterior kernel, verbatim
    def mu(sc: Column, nc: Column) =
      (sc + 1L).cast("double") / (nc + 2L).cast("double")
    def variance(sc: Column, nc: Column) =
      (sc + 1L).cast("double") * (nc - sc + 1L).cast("double") /
        ((nc + 2L).cast("double") * (nc + 2L).cast("double") *
          (nc + 3L).cast("double"))
    val z = (mu(col("s1"), col("n1")) - mu(col("s0"), col("n0"))) /
      sqrt(variance(col("s0"), col("n0")) + variance(col("s1"), col("n1")))
    m.withColumn("z", z)
      .select(col("w.start").as("bucket"),
        col("n0"), col("s0"), col("n1"), col("s1"),
        (round(col("z") * 1000000) / 1000000).as("z"),
        (round(Stats.normCdf(col("z")) * 1000000) / 1000000).as("p_b_gt_a"))
  }
}
