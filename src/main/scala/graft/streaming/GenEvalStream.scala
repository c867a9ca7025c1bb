package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/** Streaming generation-quality monitor: a stream of (candidate,
  * reference) text pairs — a generation service's eval taps, a
  * distillation pipeline's teacher/student pairs — scored as windowed
  * CORPUS BLEU-2 per event-time window, emitted as windows close under
  * the watermark. The live twin of the batch `eval_bleu_corpus` query:
  * same micro-average (clip and length sums pooled per window BEFORE
  * the division), so a window's score equals the batch query run over
  * that window's rows exactly.
  *
  * Shape: the clip is computed ROW-LOCALLY ([[TextAnalysis.clippedOverlap]]
  * — each pair is self-contained, no (pair, gram) shuffle, no state
  * beyond the engine's windowed-agg store, bounded by open windows).
  * Fully declarative append-mode aggregation: nothing emits before its
  * window closes, late pairs past the watermark drop — the same
  * accounting as every windowed reduce in the engine.
  */
object GenEvalStream {

  /** @param pairs streaming DataFrame with `tsCol`, `candCol`, `refCol`.
    * @return one row per closed window: n_pairs, p1, p2, bleu2,
    *         len_ratio (null p2/bleu2 while a window holds only
    *         sub-2-token candidates, mirroring the batch guards). */
  def windowedBleu(pairs: DataFrame, tsCol: String, candCol: String,
                   refCol: String, windowLen: String = "1 hour",
                   delay: String = "5 minutes"): DataFrame = {
    // token arrays hoisted into their own projection: five consumers
    // (sizes + both native clips) reference them, and multi-referenced
    // columns keep CollapseProject from re-inlining the split per use.
    val (ct, rt) = (col("__ct"), col("__rt"))
    val scored = pairs
      .select(col(tsCol),
        TextAnalysis.tokens(col(candCol)).as("__ct"),
        TextAnalysis.tokens(col(refCol)).as("__rt"))
      .select(col(tsCol),
        size(ct).cast("long").as("c1"),
        size(rt).cast("long").as("r1"),
        greatest(size(ct) - 1, lit(0)).cast("long").as("c2"),
        TextAnalysis.clippedOverlap(ct, rt).as("clip1"),
        // n=2 on the token arrays directly: the native kernel combines
        // adjacent token hashes — no bigram string is materialized
        graft.functions.NgramClip(ct, rt, 2).as("clip2"))
    val p1d = col("sclip1").cast("double") / col("sc1").cast("double")
    val p2d = col("sclip2").cast("double") / col("sc2").cast("double")
    scored
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowLen).as("w"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("c1")).as("sc1"), sum(col("r1")).as("sr1"),
        sum(col("c2")).as("sc2"),
        sum(col("clip1")).as("sclip1"), sum(col("clip2")).as("sclip2"))
      .select(col("w.start").as("bucket"), col("n_pairs"),
        graft.ops.TimeSeries.portableRound4(p1d).as("p1"),
        when(col("sc2") > 0,
          graft.ops.TimeSeries.portableRound4(p2d)).as("p2"),
        when(col("sc2") > 0, graft.ops.TimeSeries.portableRound4(
          sqrt(p1d * p2d))).as("bleu2"),
        graft.ops.TimeSeries.portableRound4(
          col("sc1").cast("double") / col("sr1").cast("double"))
          .as("len_ratio"))
  }

  /** Windowed CORPUS ROUGE-L — the live twin of the batch
    * `eval_rouge_l_corpus` query: per closing window, the LCS / length
    * sums pool BEFORE the divisions (micro-average, the reported form),
    * so a window's score equals the batch query over that window's rows
    * exactly. Same row-local shape as [[windowedBleu]] — one native
    * [[graft.functions.LcsLength]] DP per pair, no gram state, windowed
    * sums only. */
  def windowedRouge(pairs: DataFrame, tsCol: String, candCol: String,
                    refCol: String, windowLen: String = "1 hour",
                    delay: String = "5 minutes"): DataFrame = {
    val (ct, rt) = (col("__ct"), col("__rt"))
    val scored = pairs
      .select(col(tsCol),
        TextAnalysis.tokens(col(candCol)).as("__ct"),
        TextAnalysis.tokens(col(refCol)).as("__rt"))
      .select(col(tsCol),
        size(ct).cast("long").as("cl"),
        size(rt).cast("long").as("rl"),
        graft.functions.LcsLength(ct, rt).as("lcs"))
    scored
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowLen).as("w"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("cl")).as("sc"), sum(col("rl")).as("sr"),
        sum(col("lcs")).as("slcs"))
      .select(col("w.start").as("bucket"), col("n_pairs"),
        graft.ops.TimeSeries.portableRound4(
          col("slcs").cast("double") / col("sc").cast("double"))
          .as("rouge_p"),
        graft.ops.TimeSeries.portableRound4(
          col("slcs").cast("double") / col("sr").cast("double"))
          .as("rouge_r"),
        graft.ops.TimeSeries.portableRound4(
          lit(2.0) * col("slcs").cast("double") /
            (col("sc") + col("sr")).cast("double")).as("rouge_f"))
  }

  /** Windowed CORPUS WER — the live twin of the batch `eval_wer_corpus`
    * query: per closing window, the token-edit and reference-length
    * sums pool BEFORE the division (micro-average — the form a
    * generation/ASR regression dashboard actually alarms on; averaging
    * per-pair WER over-weights short references). Same row-local shape
    * as [[windowedRouge]] — one native
    * [[graft.functions.TokenEditDistance]] DP per pair, no gram state,
    * windowed sums only, so a frozen window's row equals the batch
    * query over that window's rows exactly. */
  def windowedWer(pairs: DataFrame, tsCol: String, candCol: String,
                  refCol: String, windowLen: String = "1 hour",
                  delay: String = "5 minutes"): DataFrame = {
    val (ct, rt) = (col("__ct"), col("__rt"))
    val scored = pairs
      .select(col(tsCol),
        TextAnalysis.tokens(col(candCol)).as("__ct"),
        TextAnalysis.tokens(col(refCol)).as("__rt"))
      .select(col(tsCol),
        size(ct).cast("long").as("cl"),
        size(rt).cast("long").as("rl"),
        graft.functions.TokenEditDistance(ct, rt).as("edit"))
    scored
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowLen).as("w"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("rl")).as("s_ref"), sum(col("edit")).as("s_edit"),
        sum(greatest(col("cl"), col("rl"))).as("s_max"))
      .select(col("w.start").as("bucket"), col("n_pairs"),
        col("s_ref"), col("s_edit"),
        graft.ops.TimeSeries.portableRound4(
          col("s_edit").cast("double") / col("s_ref").cast("double"))
          .as("wer"),
        graft.ops.TimeSeries.portableRound4(
          lit(1.0) - col("s_edit").cast("double") /
            col("s_max").cast("double")).as("edit_sim"))
  }
}
