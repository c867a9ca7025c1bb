package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Source transformer (SURVEY §2.2, T1/T2).
  *
  * The reference runs a transformer only at the source, before the ISB
  * write, so it can (a) re-assign event time — it is the event-time
  * extractor — (b) filter, (c) flat-map (numaflow
  * `rust/numaflow-core/src/transformer.rs:25-60`). The Spark translation of
  * "before the ISB write" is "before `withWatermark`": event-time rewrites
  * must happen upstream of the watermark column or late-data accounting is
  * wrong. These helpers exist to make that ordering explicit in pipelines.
  */
object Transform {

  /** (a) event-time assignment: replace/derive the event-time column. */
  def assignEventTime(df: DataFrame, tsCol: String, expr: Column): DataFrame =
    df.withColumn(tsCol, expr)

  /** (b) filter at source; dropping before the shuffle/ISB is the cheapest
    * place to shed data — Catalyst pushes this into the parquet scan. */
  def filterAtSource(df: DataFrame, pred: Column): DataFrame = df.where(pred)

  /** (c) flat-map: 1→N expansion with fresh keys/tags; at scale prefer
    * generator expressions (explode/posexplode) over typed flatMap so the
    * expansion stays inside whole-stage codegen. */
  def flatMapAtSource(df: DataFrame, cols: Seq[Column]): DataFrame =
    df.select(cols: _*)
}
