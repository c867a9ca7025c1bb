package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Ingest-time embedding QA: arriving vectors are judged against a
  * FROZEN quantizer profile ([[graft.ops.Similarity.outlierProfile]] —
  * trained centroids + per-cell distance median/MAD) and flagged when
  * they sit more than `nMads` MADs beyond their cell's median — the
  * streaming twin of [[graft.ops.Similarity.kmeansOutliers]] under the
  * frozen-baseline convention (same argument as MadAlarm: live garbage
  * cannot drag the threshold toward itself).
  *
  * ZERO state: scoring is one row-local expression (integer coding →
  * per-cell squared distance → lexicographic argmin → integer MAD
  * flag) over the broadcast 1-row profile — no watermark, no
  * aggregation, no shuffle; the stream stays append-mode and the flag
  * column is available to route (quality-gated sink, DLQ) like any
  * other predicate. Vectors of the wrong dimension never match the
  * profile and pass through with `outlier = null` (unjudgeable, the
  * caller's routing decision — silently dropping them would hide a
  * schema bug).
  */
object EmbeddingGuard {

  def judged(stream: DataFrame, vecCol: String, profile: DataFrame,
             dim: Int = 64, nMads: Int = 3): DataFrame = {
    // the profile's single column rides under an internal alias so a
    // stream that itself has a `cells` (or verdict/cell/dist2/outlier)
    // column is neither ambiguous nor shadowed by the re-select below
    val scored = Similarity.outlierVerdict(vecCol, dim, nMads,
      cellsCol = "__og_cells")
    stream.crossJoin(
        broadcast(profile.select(col("cells").as("__og_cells"))))
      .select((stream.columns.map(col).toSeq :+
        when(size(col(vecCol)) === dim,
          struct(scored: _*)).as("__og_verdict")): _*)
      .select((stream.columns.map(col).toSeq ++ Seq(
        col("__og_verdict.cell").as("cell"),
        col("__og_verdict.dist2").as("dist2"),
        col("__og_verdict.outlier").as("outlier"))): _*)
  }
}
