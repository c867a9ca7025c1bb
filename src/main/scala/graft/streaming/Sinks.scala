package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, max, min}
import graft.ops.Routing
import graft.ops.Routing.TagCondition

/** Sink-side semantics (SURVEY §2.7): retry with exponential backoff,
  * fallback (DLQ) sink, onSuccess sink, and the single-pass multi-edge
  * router.
  *
  * The reference's per-message sink responses (Success/Failure/Fallback/
  * OnSuccess — `rust/numaflow-core/src/sinker/sink.rs:18,844-869`) become
  * per-batch semantics here: a writer either commits a micro-batch or
  * throws; retry/fallback/onSuccess policies wrap writers. Exactly-once
  * across multiple sinks relies on batchId-idempotent writers (the
  * checkpoint replays a failed batch with the same batchId).
  */
object Sinks {

  /** A micro-batch writer: (batch, batchId) => effect (may throw). */
  type Writer = (DataFrame, Long) => Unit

  /** Exponential backoff retry (sink.retryStrategy defaults: interval 1ms,
    * unbounded steps, factor/cap — numaflow const.go:218-233; bounded here
    * because unbounded retry in a test harness hangs forever). */
  final case class RetryPolicy(intervalMs: Long = 1, steps: Int = 5,
      factor: Double = 2.0, capMs: Long = 10000)

  sealed trait OnFailure
  case object FailureRetryThenThrow extends OnFailure
  /** Route the failed batch to a fallback writer (DLQ) — sink.go:26-29. */
  final case class FailureFallback(fallback: Writer) extends OnFailure
  /** Drop the failed batch (load-shed) — onFailure: drop. */
  case object FailureDrop extends OnFailure

  /** Wrap a writer with retry + failure policy. */
  def withRetry(primary: Writer, policy: RetryPolicy = RetryPolicy(),
                onFailure: OnFailure = FailureRetryThenThrow): Writer = {
    (df, id) =>
      var attempt = 0
      var delay = policy.intervalMs
      var done = false
      var lastErr: Throwable = null
      while (!done && attempt <= policy.steps) {
        try { primary(df, id); done = true }
        catch {
          case e: Throwable =>
            lastErr = e
            attempt += 1
            if (attempt <= policy.steps) {
              Thread.sleep(delay)
              delay = math.min((delay * policy.factor).toLong, policy.capMs)
            }
        }
      }
      if (!done) onFailure match {
        case FailureRetryThenThrow  => throw lastErr
        case FailureFallback(fb)    => fb(df, id)
        case FailureDrop            => ()
      }
  }

  /** onSuccess sink (sink.go:30-34): secondary fires only after the
    * primary committed; the secondary may transform the batch. */
  def withOnSuccess(primary: Writer, onSuccess: Writer): Writer =
    (df, id) => { primary(df, id); onSuccess(df, id) }

  /** Contract-enforcing split sink: every row is checked against the
    * rule predicates (row-local by design — relational rules like FK
    * orphans belong to the batch gate, `Relational.validateRules`);
    * clean rows go to `primary`, violating rows to `dlq` WITH a
    * `violated_rules` column naming every fired rule — the triage
    * handle a DLQ consumer actually needs. One pass over a persisted
    * batch, the split is a map-side filter pair; rule evaluation is
    * plain Catalyst predicates inside codegen. */
  def qualityGatedSink(rules: Seq[(String, org.apache.spark.sql.Column)],
                       primary: Writer, dlq: Writer): Writer = (batch, id) => {
    import org.apache.spark.sql.functions._
    val flagged = batch.withColumn("violated_rules",
      array_compact(array(rules.map { case (n, c) =>
        when(c, lit(n)).otherwise(lit(null).cast("string")) }: _*)))
      .persist()
    try {
      primary(flagged.where(size(col("violated_rules")) === 0)
        .drop("violated_rules"), id)
      dlq(flagged.where(size(col("violated_rules")) > 0), id)
    } finally { flagged.unpersist(); () }
  }

  /** Distribution-drift alarm over a metric column: each micro-batch's
    * binned distribution is scored against a FROZEN baseline (captured
    * once from a reference corpus via [[graft.ops.Relational.driftChi2]]
    * semantics) and `onAlarm` fires when the summed chi-square
    * contribution crosses `threshold` — the crawl-health tripwire that
    * catches a scraper/source regression while it is one micro-batch
    * old, not after it has polluted a snapshot. The baseline is a
    * bin→share map on the driver (bins are few by construction);
    * per-batch work is one map-side binned count. */
  def driftAlarm(baseline: Map[Long, Double], metricCol: String,
                 binWidth: Long, nBins: Int, threshold: Double,
                 onAlarm: (Long, Double) => Unit): Writer = (batch, id) => {
    import org.apache.spark.sql.functions._
    val counts = batch
      .select(least(floor(col(metricCol) / binWidth), lit(nBins - 1))
        .cast("long").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    if (total > 0) {
      val score = baseline.collect { case (bin, pRef) if pRef > 0 =>
        val pCur = counts.getOrElse(bin, 0L) / total
        (pCur - pRef) * (pCur - pRef) / pRef
      }.sum
      if (score > threshold) onAlarm(id, score)
    }
  }

  /** Exactly-once parquet sink: each micro-batch writes (overwrite) its
    * own `batchId=` partition directory, so a checkpoint replay of batch N
    * rewrites N's directory instead of appending duplicates — the
    * batchId-idempotent pattern that upgrades at-least-once replays to
    * exactly-once file output. Read the base path back as one partitioned
    * dataset. */
  def idempotentParquetSink(basePath: String): Writer = (df, batchId) =>
    df.write.mode("overwrite").parquet(s"$basePath/batchId=$batchId")

  /** [[idempotentParquetSink]] + a LIVE data-skipping index: each batch
    * writes its own `batchId=` partition, then computes per-file min/max
    * stats for EXACTLY that directory (batch-sized re-read, column
    * pruned) into the `_index` sidecar's matching partition — so the
    * manifest [[graft.ops.Scale.prunedRead]] consults stays current as
    * the stream ingests, at per-batch cost, with no full-table stats
    * rebuild. Both writes are batchId-overwrites: a checkpoint replay
    * converges on data AND index. */
  def indexedParquetSink(basePath: String, cols: Seq[String]): Writer = (df, batchId) => {
    val dataDir = s"$basePath/batchId=$batchId"
    df.write.mode("overwrite").parquet(dataDir)
    val spark = df.sparkSession
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(dataDir)
      .select(col("_metadata.file_path").as("file") +: cols.map(col): _*)
      .groupBy("file").agg(aggs.head, aggs.tail: _*)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${basePath}_index/batchId=$batchId")
  }

  /** Single-pass fan-out router for foreachBatch: evaluates every
    * conditional edge once per micro-batch over a persisted batch, so the
    * source is read once regardless of edge count (the reference's ISB
    * writer loop, `pipeline/isb/writer.rs:286-338`). Unconditional edges
    * receive everything; DROP-tagged rows are discarded first. */
  def routerForeachBatch(edges: Seq[(Option[TagCondition], Writer)],
                         tagsCol: String = "tags"): Writer = {
    (batch, id) =>
      val live = Routing.dropTagged(batch, tagsCol).persist()
      try {
        edges.foreach { case (cond, writer) =>
          val slice = cond.fold(live)(c => live.where(Routing.matches(col(tagsCol), c)))
          writer(slice, id)
        }
      } finally { live.unpersist() }
  }
}
