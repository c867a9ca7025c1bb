package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental view maintenance (IVM) for additive aggregates: keep a
  * per-key aggregate table current under a CDC delta stream WITHOUT
  * recomputing from the full corpus — the classic self-maintainable
  * view result (count/sum views are maintainable from the delta alone;
  * Gupta & Mumick, "Maintenance of Materialized Views", 1995).
  *
  * Delta encoding: one row per inserted (`op = "I"`) or deleted
  * (`op = "D"`) SOURCE row; an update is D(old) + I(new). This is
  * exactly what [[graft.ops.CorpusOps.snapshotDiff]] emits (added →
  * I(new), removed → D(old), changed → both), so snapshot diffing and
  * view maintenance compose.
  *
  * Scale shape — the base table is NEVER shuffled:
  *  - the delta collapses to per-key signed partial state first (one
  *    hash-agg over the delta only, map-side combined);
  *  - untouched base rows pass through via a broadcast ANTI join on the
  *    delta's key set, touched rows split off via the broadcast SEMI
  *    twin — both are map-side against a delta-key broadcast;
  *  - only the touched slice (bounded by the delta's key count, not the
  *    base size) enters the merge join.
  * At rest the state lives as a hash-bucketed table and a batch
  * rewrites only touched buckets ([[graft.streaming.SnapshotCdc]]
  * machinery) — a delta touching B of N buckets costs B/N of the view,
  * never a full recompute.
  *
  * Determinism: counts are BIGINT and measure sums should be DECIMAL —
  * integer/decimal addition is associative, so the maintained state is
  * bit-equal to a from-scratch recompute (the `view_ivm` oracle proves
  * exactly that equality against DuckDB).
  */
object Materialize {

  /** Build the base aggregate state from a source snapshot:
    * keys..., n = count(*), one summed column per measure. */
  def aggTable(src: DataFrame, keyCols: Seq[String],
               measures: Seq[(String, Column)]): DataFrame =
    src.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        measures.map { case (name, m) => sum(m).as(name) }: _*)

  /** Collapse a CDC delta to per-key SIGNED partial state: inserts add,
    * deletes subtract. One aggregation over the delta only. */
  def deltaState(delta: DataFrame, keyCols: Seq[String], opCol: String,
                 measures: Seq[(String, Column)]): DataFrame = {
    val sign = when(col(opCol) === "D", lit(-1L)).otherwise(lit(1L))
    delta.groupBy(keyCols.map(col): _*)
      .agg(sum(sign).as("n"),
        measures.map { case (name, m) => sum(sign * m).as(name) }: _*)
  }

  /** Merge signed delta state into the base aggregate table. Groups
    * whose count reaches zero leave the view (matching a recompute);
    * keys new to the view enter it. The base side splits on a BROADCAST
    * of the delta's keys, so the full view is never shuffled. */
  def applyDelta(base: DataFrame, delta: DataFrame, keyCols: Seq[String],
                 opCol: String, measures: Seq[(String, Column)]): DataFrame = {
    val ds = deltaState(delta, keyCols, opCol, measures)
    val deltaKeys = broadcast(ds.select(keyCols.map(col): _*))
    val untouched = base.join(deltaKeys, keyCols, "left_anti")
    val touched = base.join(deltaKeys, keyCols, "left_semi")
    val valueCols = "n" +: measures.map(_._1)
    val merged = touched.join(ds.select(
        keyCols.map(col) ++ valueCols.map(c => col(c).as(s"__d_$c")): _*),
        keyCols, "full_outer")
      .select(keyCols.map(col) ++ valueCols.map(c =>
        (coalesce(col(c), lit(0)) + coalesce(col(s"__d_$c"), lit(0))).as(c)): _*)
      .where(col("n") > 0)
    // Align merged value types to the base schema (coalesce+add can widen
    // decimals) so the union is exact.
    val baseTypes = base.schema.fields.map(f => f.name -> f.dataType).toMap
    val alignedMerged = merged.select(keyCols.map(col) ++ valueCols.map(c =>
      col(c).cast(baseTypes(c)).as(c)): _*)
    untouched.select((keyCols ++ valueCols).map(col): _*)
      .unionByName(alignedMerged)
  }
}
