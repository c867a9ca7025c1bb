package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** TRUE (unbounded) cycles — SURVEY R4, the gap [[graft.ops.Cycles]]
  * documents: the reference runs genuinely cyclic DAGs where an edge
  * routes back to its own vertex or an ancestor, and a message may loop
  * forever (numaflow `test/diamond-e2e/diamond_test.go:110,136`
  * TestCycleToSelf/TestCycleBackward, `examples/10-cycle-to-self.yaml`,
  * `examples/11-cycle-backward.yaml`).
  *
  * Spark logical plans are DAGs, but a STREAM is not bounded by the plan:
  * each micro-batch is one traversal of the acyclic vertex body, and the
  * cycle edge is realized as a writer that appends the routed-back rows
  * into the SAME source buffer the stream reads from. Batch N's cycle
  * output becomes batch N+1's input — exactly the reference's ISB edge
  * pointing backwards — and a message loops as many times as the routing
  * logic sends it around, with no iteration cap anywhere: the loop count
  * is data-dependent and unbounded, the caveat the reference documents
  * (`docs/user-guide/reference/cycle.md`: "it is possible for a message
  * to loop forever") applies verbatim.
  *
  * Delivery: the feedback append happens inside foreachBatch, whose
  * replay-on-failure gives AT-LEAST-ONCE around the cycle — a batch that
  * dies between appending retries and committing its offset re-appends on
  * replay. Same contract as the reference's ISB (at-least-once, dedup
  * upgrades it); idempotent handling belongs in the vertex body, keyed on
  * the headers it controls.
  *
  * Scale — LOCAL-ONLY feedback edge, by construction: the feedback write
  * is `foreachPartition` against `UdSource.get(sourceName)`, and that
  * registry is a per-JVM ConcurrentHashMap. Under local[*] executor and
  * driver share one JVM, so the append lands in the exact source instance
  * the stream reads — correct. On a REAL cluster the executor-side lookup
  * would resolve a missing (or different) instance: the memory-source
  * cycle edge is a single-process ISB analog, NOT a distributed one. For
  * a cluster deployment route the feedback through a cluster-visible
  * broker instead — point the cycle edge at the Kafka/Pulsar SINK writing
  * the topic the vertex's own source reads (the reference's ISB is
  * exactly such a broker edge); the body/onDone wiring here is unchanged.
  * The routed-back subset is persisted for the two consumers (cycle edge
  * + downstream) so the vertex body runs once per batch.
  */
object CycleStream {

  /** Routing column the vertex body must set: true = send the row around
    * the cycle edge again, false = forward downstream. */
  val CycleCol = "__cycle"

  /** Start a cycle-to-self vertex over a registered
    * [[UdSource.MemoryGraftSource]] (or any GraftSource with an
    * `append`-style loopback — the memory source is the ISB analog).
    *
    * @param body   the vertex: maps the UdSource row set
    *               (keys/value/eventTime/headers/partition/offset) to rows
    *               carrying the same four message columns plus [[CycleCol]]
    * @param onDone per-batch consumer of the rows leaving the cycle
    *               (the downstream edge)
    */
  def cycleToSelf(spark: SparkSession, sourceName: String,
                  body: DataFrame => DataFrame,
                  onDone: DataFrame => Unit,
                  checkpoint: String): StreamingQuery = {
    val in = UdSource.readStream(spark, sourceName)
    in.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // NULL __cycle coalesces to false (forward downstream): a row the
        // body forgot to tag must still leave the vertex — both branch
        // filters below are complementary only over non-null booleans,
        // so an un-coalesced NULL would silently vanish from BOTH edges.
        val routed = body(batch)
          .select(col("keys"), col("value"), col("eventTime"),
            col("headers"),
            coalesce(col(CycleCol).cast("boolean"), lit(false)).as(CycleCol))
          .persist()
        try {
          routed.where(col(CycleCol)).drop(CycleCol)
            .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
              val src = UdSource.get(sourceName)
                .asInstanceOf[UdSource.MemoryGraftSource]
              rows.foreach { r =>
                src.append(
                  keys = Option(r.getSeq[String](0)).getOrElse(Seq.empty),
                  value = r.getAs[Array[Byte]](1),
                  eventTime = r.getAs[java.sql.Timestamp](2),
                  headers = Option(r.getMap[String, String](3))
                    .map(_.toMap).getOrElse(Map.empty))
              }
            }
          onDone(routed.where(!col(CycleCol)).drop(CycleCol))
        } finally routed.unpersist()
      }
      .start()
  }

  /** Block until the cycle drains: both the stream's own backlog AND the
    * feedback appends of every in-flight batch are consumed. A single
    * `processAllAvailable` is not enough — the batch it waits on may
    * itself append feedback rows after the availability check — so loop
    * until a full `processAllAvailable` pass grows the source by nothing.
    * (`pending == 0` is NOT a usable condition: the engine delivers the
    * final batch's `commit` — and hence the source ack — only when a
    * NEXT batch is constructed, so pending legitimately rests at the
    * last batch's row count on a drained stream.)
    * NEVER RETURNS if the routing loops a message forever — that is the
    * reference-documented cycle hazard, surfaced honestly. */
  def drain(q: StreamingQuery, sourceName: String): Unit = {
    val src = UdSource.get(sourceName)
    def total: Long = src.partitions.map(src.latestOffset).sum
    var before = -1L
    var after = total
    while (before != after) {
      before = after
      q.processAllAvailable()
      after = total
    }
  }
}
