package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Per-document n-gram novelty at ingest — the streaming twin of
  * `Dedup.noveltyVsReference`: every arriving doc's DISTINCT w-grams
  * probe a FROZEN reference gram table (the settled corpus, hashed once
  * at freeze time), and each doc emits its exact gram/novel counts when
  * its event-time window closes. Novelty ≈ 0 flags recombined reference
  * text (a generator memorizing, a crawler re-crawling); a sudden rise
  * flags a source drifting off-corpus — both caught at ingest, not at
  * the next batch audit.
  *
  * Scale posture: grams travel as 8-byte xxhash64 keys (identity only,
  * never text); the reference side is static and hash-joins without a
  * per-batch exchange; per-doc state is two longs inside the windowed
  * agg, expired by the watermark. The grouping key includes the window
  * so state cannot accrete per doc id forever — one doc = one ts = one
  * window, so the per-doc row is complete when its window closes.
  *
  * Stream ≡ batch: a closed row equals `noveltyVsReference(docs, ref)`
  * for that doc against the same frozen reference (NoveltyStreamSpec). */
object NoveltyStream {

  /** @param stream   streaming (idCol, textCol, tsCol) rows
    * @param refGrams static frame with a `sh` column of xxhash64 gram
    *                 keys (distinct or not — deduped here once) */
  def perDoc(stream: DataFrame, refGrams: DataFrame, idCol: String,
             textCol: String, tsCol: String, w: Int = 3,
             windowDur: String = "1 hour",
             delay: String = "10 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, delay)
      .select(col(idCol), col(tsCol),
        explode(array_distinct(transform(
          Dedup.shingleArray(col(textCol), w), s => xxhash64(s)))).as("sh"))
      .join(refGrams.select(col("sh")).distinct()
        .withColumn("__seen", lit(1L)), Seq("sh"), "left")
      .groupBy(col(idCol), window(col(tsCol), windowDur))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__seen").isNull, 1L).otherwise(0L)).as("n_novel"))
      .select(col(idCol), col("window.start").as("window_start"),
        col("n_grams"), col("n_novel"),
        (round(col("n_novel").cast("double") / col("n_grams").cast("double")
          * 1000000) / 1000000).as("novelty_frac"))

  /** The reference artifact: the settled corpus's distinct gram keys —
    * compute once at freeze time, persist, hand to [[perDoc]]. */
  def freezeReference(ref: DataFrame, textCol: String, w: Int = 3): DataFrame =
    ref.select(explode(array_distinct(transform(
        Dedup.shingleArray(col(textCol), w), s => xxhash64(s)))).as("sh"))
      .distinct()
}
