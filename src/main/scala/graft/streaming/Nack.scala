package graft.streaming

import java.sql.Timestamp
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.Tags
import graft.streaming.UdSource.MemoryGraftSource

/** Per-message NACK (SURVEY M5): a UDF tags a message `__NACK__` with
  * `NackOptions{delay, max_deliveries}` and the platform redelivers it
  * later instead of acking (numaflow `message.rs:94,417-422,526-536`,
  * docs `user-guide/reference/per-message-nack.md`).
  *
  * Spark has no per-row nack — acknowledgment is the micro-batch
  * checkpoint — so redelivery is a LOOPBACK: the sink-side writer splits
  * NACK-tagged rows out of the batch and re-appends them to the source
  * buffer (the same cycle-to-self shape as R4), with the delivery count
  * carried in the message headers. Rows exceeding `maxDeliveries` route to
  * the DLQ writer (the reference NACKs them to the source until the source
  * gives up; a bound must exist somewhere — here it is explicit).
  *
  * Expected columns: keys array<string>, value binary, eventTime
  * timestamp, headers map<string,string>, tags array<string>.
  */
object Nack {

  /** Header carrying the delivery count across redeliveries. */
  val DeliveryHeader = "x-delivery-count"

  /** message.rs:526-536 NackOptions. */
  final case class NackOptions(delayMs: Long = 0, maxDeliveries: Int = 3)

  // ScheduledThreadPoolExecutor, not java.util.Timer: a Timer thread dies
  // permanently when one task throws (e.g. BufferFullException from a
  // bounded loopback), breaking every later delayed redelivery JVM-wide.
  // The executor survives task exceptions; each task body still catches,
  // so a failed re-append routes to the caller-supplied failure handler
  // rather than vanishing into the executor's swallowed Future.
  private lazy val scheduler = {
    val ex = new java.util.concurrent.ScheduledThreadPoolExecutor(1, (r: Runnable) => {
      val t = new Thread(r, "graft-nack-redelivery"); t.setDaemon(true); t
    })
    ex.setRemoveOnCancelPolicy(true)
    ex
  }

  /** A redelivery whose delayed re-append failed (row payload held until
    * the next micro-batch routes it to the DLQ). */
  private type FailedRow = (Seq[String], Array[Byte], Timestamp, Map[String, String])
  private val failedRedeliveries = ArrayBuffer.empty[FailedRow]

  /** Wrap `deliver`: NACK-tagged rows loop back to `loopback` after
    * `opts.delayMs` (deliveries counted), exhausted rows go to `dlq`,
    * everything else is delivered. A delayed re-append that throws (full
    * loopback buffer) is NOT lost: the row parks in `failedRedeliveries`
    * and routes to the DLQ on the next batch. */
  def redeliveryWriter(loopback: MemoryGraftSource, opts: NackOptions,
                       deliver: Sinks.Writer, dlq: Sinks.Writer): Sinks.Writer =
    (batch, id) => {
      val tagged = batch.persist()
      try {
        val parked = failedRedeliveries.synchronized {
          val out = failedRedeliveries.toList; failedRedeliveries.clear(); out
        }
        if (parked.nonEmpty) {
          val spark = batch.sparkSession
          import spark.implicits._
          dlq(parked.toDF("keys", "value", "eventTime", "headers")
            .withColumn("tags", array(lit(Tags.Nack))), id)
        }
        val nack = tagged.where(array_contains(col("tags"), Tags.Nack))
        val rows = nack
          .select(col("keys"), col("value"), col("eventTime"), col("headers"))
          .collect() // bounded: only the failing rows of one micro-batch
        // Row.getAs hands back mutable ArraySeq/Map views — normalize.
        def keysOf(r: org.apache.spark.sql.Row): Seq[String] =
          r.getAs[scala.collection.Seq[String]]("keys").toSeq
        def headersOf(r: org.apache.spark.sql.Row): Map[String, String] =
          r.getAs[scala.collection.Map[String, String]]("headers").toMap
        val (retry, exhausted) = rows.partition { r =>
          headersOf(r).getOrElse(DeliveryHeader, "1").toInt < opts.maxDeliveries
        }
        retry.foreach { r =>
          val hs = headersOf(r)
          val n = hs.getOrElse(DeliveryHeader, "1").toInt + 1
          val ks = keysOf(r); val v = r.getAs[Array[Byte]]("value")
          val ts = r.getAs[Timestamp]("eventTime")
          val newHs = hs + (DeliveryHeader -> n.toString)
          def append(): Unit = loopback.append(ks, v, ts, headers = newHs)
          if (opts.delayMs <= 0) append()
          else scheduler.schedule(new Runnable {
            def run(): Unit =
              try append()
              catch { case scala.util.control.NonFatal(_) =>
                failedRedeliveries.synchronized {
                  failedRedeliveries += ((ks, v, ts, newHs))
                }
              }
          }, opts.delayMs, java.util.concurrent.TimeUnit.MILLISECONDS)
        }
        if (exhausted.nonEmpty)
          dlq(dlqFrame(nack, scala.collection.immutable.ArraySeq.unsafeWrapArray(exhausted.map(keysOf))), id)
        deliver(tagged.where(!array_contains(col("tags"), Tags.Nack)), id)
      } finally tagged.unpersist()
    }

  /** Header marking a message re-driven from the DLQ. */
  val RedriveHeader = "x-redriven"

  /** Redrive (reference `test/redrive-e2e`): re-inject rows a DLQ writer
    * captured back into the pipeline's source AFTER the failure cause is
    * fixed. The delivery count resets — a redrive is a fresh attempt, not
    * delivery N+1 of the old one — and the rows are stamped
    * [[RedriveHeader]] for provenance. `dlqBatch` is any frame with the
    * NumaMessage columns (keys, value, eventTime, headers), e.g. what the
    * DLQ writer persisted. Driver-side collect is bounded by the DLQ's
    * own size — redrive is an operator action on parked failures, not a
    * data-path hop. */
  def redrive(dlqBatch: DataFrame, source: MemoryGraftSource): Long = {
    val rows = dlqBatch
      .select(col("keys"), col("value"), col("eventTime"), col("headers"))
      .collect()
    rows.foreach { r =>
      val hs = r.getAs[scala.collection.Map[String, String]]("headers").toMap
      source.append(
        r.getAs[scala.collection.Seq[String]]("keys").toSeq,
        r.getAs[Array[Byte]]("value"),
        r.getAs[Timestamp]("eventTime"),
        headers = hs - DeliveryHeader + (RedriveHeader -> "true"))
    }
    rows.length.toLong
  }

  /** The exhausted subset of the nack frame, selected by keys. */
  private def dlqFrame(nack: DataFrame, keys: Seq[Seq[String]]): DataFrame = {
    val keyLits = keys.map(k => array(k.map(lit): _*))
    if (keyLits.isEmpty) nack.limit(0)
    else nack.where(keyLits.map(col("keys") === _).reduce(_ || _))
  }
}
