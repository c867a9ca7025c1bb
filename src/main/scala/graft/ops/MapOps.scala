package graft.ops

import org.apache.spark.sql.{Dataset, Encoder}

/** Map family (SURVEY §2.3): unary / batch / streaming map.
  *
  * The reference speaks to map UDFs over gRPC one message (`mapper/map/
  * unary.rs`), one read-batch (`batch.rs`), or one streamed response at a
  * time (`stream.rs`). Spark-native UDF logic is a closure, so the three
  * variants collapse onto Dataset primitives; the distinction that survives
  * is the *call amortization*:
  *  - unary  -> `flatMap` (per-row; stays in the codegen'd iterator)
  *  - batch  -> `mapPartitions` (amortize setup per partition, the analog
  *              of readBatchSize-grouped UDF calls)
  *  - stream -> `flatMap` returning a lazy Iterator (results flow before
  *              the input batch is exhausted, like mapStreaming)
  *
  * Prefer `select(expr)` columns over these for anything expressible in
  * Catalyst; closures break whole-stage codegen and column pruning.
  */
object MapOps {

  /** M1: unary flat-map, 1→N per input row. */
  def unary[T, U: Encoder](ds: Dataset[T])(f: T => IterableOnce[U]): Dataset[U] =
    ds.flatMap(f)

  /** M2: batch map — the whole partition in one call, amortizing any
    * per-call setup (dictionaries, models, connections). */
  def batch[T, U: Encoder](ds: Dataset[T])(f: Iterator[T] => Iterator[U]): Dataset[U] =
    ds.mapPartitions(f)

  /** M3: streaming map — lazy Iterator per row so downstream consumption
    * overlaps with production (UDTF-style). */
  def stream[T, U: Encoder](ds: Dataset[T])(f: T => Iterator[U]): Dataset[U] =
    ds.flatMap(f)
}
