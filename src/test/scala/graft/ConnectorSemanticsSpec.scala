package graft

import java.nio.file.Files
import java.sql.Timestamp
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._
import graft.model.{Pipeline, Tags}
import graft.ops.ReduceUdf
import graft.streaming.{Connectors, Nack, UdSource}
import graft.streaming.UdSource.{BufferFullException, DiscardLatest, MemoryGraftSource}

/** Broker-semantics adapters (S4-S7/K4-K5), per-message NACK (M5),
  * buffer-full policies (R5), the typed reduce-UDF contract (W8), and
  * MonoVertex bypass (X10). */
class ConnectorSemanticsSpec extends SparkSpec {
  import spark.implicits._

  private def t0 = ts("2024-01-01 00:00:00")

  // ---- SQS ---------------------------------------------------------------

  test("sqs source deletes on ack; sink batches sends by 10") {
    val queue = ArrayBuffer(
      ("r1", "m1", "v1"), ("r2", "m2", "v2"), ("r3", "m3", "v3"))
    val deletedReceipts = ArrayBuffer.empty[String]
    val sent = ArrayBuffer.empty[Seq[Array[Byte]]]
    val client = new Connectors.SqsClient {
      def receive(max: Int) = {
        val out = queue.take(max).toSeq
          .map { case (r, id, v) => (r, id, v.getBytes, Map.empty[String, String]) }
        queue.remove(0, math.min(max, queue.length))
        out
      }
      def delete(handles: Seq[String]): Unit = deletedReceipts ++= handles
      // send runs on executor threads (foreachPartition) — synchronize.
      def send(bodies: Seq[Array[Byte]]): Unit =
        sent.synchronized { sent += bodies }
    }

    val src = new Connectors.SqsSource(client, pollBatch = 2)
    assert(src.latestOffset(0) === 2) // first poll pulls 2
    val batch1 = src.read(0, 0, 2).toSeq
    assert(batch1.map(r => new String(r.value)) === Seq("v1", "v2"))
    assert(batch1.head.keys === Seq("m1")) // message id rides the keys
    src.ack(0, 2)
    assert(deletedReceipts.toSeq === Seq("r1", "r2")) // delete-on-ack
    assert(src.latestOffset(0) === 3 && src.pending === 1)
    src.ack(0, 3)
    assert(deletedReceipts.toSeq === Seq("r1", "r2", "r3") && src.pending === 0)

    // Produce is executor-side (one batching run per partition): a single
    // partition exercises the exact SendMessageBatch grouping...
    Connectors.sqsSink(client, "v")(
      (1 to 25).map(i => s"b$i").toDF("v").coalesce(1), 0L)
    assert(sent.map(_.size).toSeq === Seq(10, 10, 5)) // SendMessageBatch cap
    // ...and a multi-partition batch still honors the ≤10 cap per API call
    // with nothing lost (parallel producers batch independently).
    sent.clear()
    Connectors.sqsSink(client, "v")(
      (1 to 25).map(i => s"b$i").toDF("v").repartition(4), 0L)
    assert(sent.forall(_.size <= 10))
    assert(sent.flatMap(_.map(new String(_))).sorted.toSeq ===
      (1 to 25).map(i => s"b$i").sorted)
  }

  // ---- NATS core vs JetStream --------------------------------------------

  test("nats core is at-most-once; jetstream replays by stream sequence") {
    val inbox = ArrayBuffer("n1", "n2")
    val nats = new Connectors.NatsSource(new Connectors.NatsSubscription {
      def drain() = { val out = inbox.map(_.getBytes).toSeq; inbox.clear(); out }
    }, subject = "sub")
    assert(nats.latestOffset(0) === 2)
    assert(nats.read(0, 0, 2).map(r => new String(r.value)).toSeq === Seq("n1", "n2"))
    nats.ack(0, 2) // no-op: nothing to assert on the broker side, no replay

    var acked = 0L
    val stream = (1L to 5L).map(i => i -> s"j$i".getBytes)
    val js = new Connectors.JetStreamSource(new Connectors.JetStreamConsumer {
      def fetch(from: Long, until: Long) =
        stream.filter { case (s, _) => s >= from && s < until }
      def lastSequence: Long = 5L
      def ackUpTo(seq: Long): Unit = acked = seq
    }, subject = "js-sub")
    assert(js.latestOffset(0) === 5)
    // replayable: the same range can be fetched again (server-side storage)
    assert(js.read(0, 1, 3).map(r => new String(r.value)).toSeq === Seq("j1", "j2"))
    assert(js.read(0, 1, 3).map(r => r.offset).toSeq === Seq(1L, 2L))
    js.ack(0, 3)
    assert(acked === 3L && js.pending === 2)
  }

  // ---- Pulsar -------------------------------------------------------------

  test("pulsar acks cumulatively; sink produces keyed messages") {
    var arrivals = Seq((101L, "ka", "p1"), (102L, null: String, "p2"))
    var cumAck = 0L
    val src = new Connectors.PulsarSource(new Connectors.PulsarConsumer {
      def poll() = { val out = arrivals.map { case (m, k, v) => (m, k, v.getBytes) }
        arrivals = Seq.empty; out }
      def ackCumulative(mid: Long): Unit = cumAck = mid
    }, topic = "t")
    assert(src.latestOffset(0) === 2)
    assert(src.read(0, 0, 2).map(_.headers("pulsar-message-id")).toSeq === Seq("101", "102"))
    src.ack(0, 2)
    assert(cumAck === 102L) // cumulative: highest contained message id

    val produced = ArrayBuffer.empty[(String, String)]
    // produce runs on executor threads (foreachPartition) — synchronize.
    Connectors.pulsarSink(
      (k, v) => produced.synchronized { produced += ((k, new String(v))) },
      "k", "v")(
      Seq(("a", "x"), ("b", "y")).toDF("k", "v"), 0L)
    assert(produced.sorted.toSeq === Seq(("a", "x"), ("b", "y")))
  }

  // ---- M5 per-message NACK ------------------------------------------------

  test("M5: nack-tagged rows redeliver via loopback, exhausted rows hit the DLQ") {
    val loop = UdSource.register("nack-loop", new MemoryGraftSource(1))
    loop.append(Seq("ok"), "good".getBytes, t0)
    loop.append(Seq("bad"), "poison".getBytes, t0)

    val delivered = ArrayBuffer.empty[String]
    val deadLettered = ArrayBuffer.empty[(String, String)]
    val writer = Nack.redeliveryWriter(
      loopback = loop, opts = Nack.NackOptions(delayMs = 0, maxDeliveries = 2),
      deliver = (df, _) => delivered ++=
        df.select(col("value").cast("string")).as[String].collect(),
      dlq = (df, _) => deadLettered ++= df
        .select(col("keys")(0), col("headers"))
        .as[(String, Map[String, String])].collect()
        .map { case (k, h) => (k, h.getOrElse(Nack.DeliveryHeader, "1")) })

    // the "UDF": poison messages get the NACK tag every time
    val q = UdSource.readStream(spark, "nack-loop")
      .withColumn("tags",
        when(col("keys")(0) === "bad", array(lit(Tags.Nack)))
          .otherwise(array().cast("array<string>")))
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("nack").toString)
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        writer(b.toDF(), id))
      .start()
    try {
      q.processAllAvailable()
      assert(delivered.toSeq === Seq("good"))
      // delivery 1 → retried with count 2 → exhausted (maxDeliveries=2)
      assert(deadLettered.toSeq === Seq(("bad", "2")))
    } finally { q.stop(); UdSource.unregister("nack-loop") }
  }

  test("nats core trims its buffer on engine ack; pending is un-acked depth") {
    val inbox = ArrayBuffer("a", "b", "c", "d")
    val nats = new Connectors.NatsSource(new Connectors.NatsSubscription {
      def drain() = { val out = inbox.map(_.getBytes).toSeq; inbox.clear(); out }
    }, subject = "sub")
    assert(nats.latestOffset(0) === 4 && nats.pending === 4)
    nats.ack(0, 2) // engine-side only — releases buffer, anchors pending
    assert(nats.pending === 2, "pending must drop to un-acked depth")
    // un-acked records still readable at their original offsets post-trim
    assert(nats.read(0, 2, 4).map(r => new String(r.value)).toSeq === Seq("c", "d"))
    inbox ++= Seq("e")
    assert(nats.latestOffset(0) === 5) // offsets continue past the trim
    assert(nats.read(0, 4, 5).map(r => new String(r.value)).toSeq === Seq("e"))
    nats.ack(0, 5)
    assert(nats.pending === 0)
  }

  test("M5: a delayed redelivery that fails parks and reaches the DLQ next batch") {
    // bounded loopback that is already full → the delayed append throws
    // BufferFullException inside the scheduler task; with a raw
    // java.util.Timer that exception would kill the timer thread for the
    // whole JVM. Here the row parks and the NEXT writer invocation routes
    // it to the DLQ.
    val full = new MemoryGraftSource(1, maxLength = 1)
    full.append(Seq("occupant"), "x".getBytes, t0)

    val deadLettered = ArrayBuffer.empty[String]
    val writer = Nack.redeliveryWriter(
      loopback = full, opts = Nack.NackOptions(delayMs = 50, maxDeliveries = 5),
      deliver = (_, _) => (),
      dlq = (df, _) => deadLettered ++=
        df.select(col("keys")(0)).as[String].collect())

    val nacked = Seq((Seq("k1"), "v1".getBytes, t0,
      Map.empty[String, String], Seq(Tags.Nack)))
      .toDF("keys", "value", "eventTime", "headers", "tags")
    writer(nacked, 0L)
    Thread.sleep(500) // let the scheduled append fire and fail
    assert(deadLettered.isEmpty) // parked, not yet dead-lettered
    writer(nacked.limit(0), 1L) // next batch drains the parked rows
    assert(deadLettered.toSeq === Seq("k1"))

    // and the scheduler survived: a later delayed redelivery still works
    full.ack(0, 1) // free capacity
    writer(nacked, 2L)
    Thread.sleep(500)
    assert(full.pending >= 1, "scheduler thread must survive the earlier failure")
  }

  // ---- R5 buffer-full policies -------------------------------------------

  test("R5: discardLatest sheds, retryUntilSuccess backpressures") {
    val shed = new MemoryGraftSource(1, maxLength = 2, onFull = DiscardLatest)
    (1 to 4).foreach(i => shed.append(Seq.empty, s"m$i".getBytes, t0))
    assert(shed.pending === 2 && shed.droppedCount === 2)

    val strict = new MemoryGraftSource(1, maxLength = 1)
    strict.append(Seq.empty, "m1".getBytes, t0)
    intercept[BufferFullException] {
      strict.append(Seq.empty, "m2".getBytes, t0)
    }
    strict.ack(0, 1) // consumer catches up → capacity frees
    strict.append(Seq.empty, "m2".getBytes, t0)
    assert(strict.pending === 1)
  }

  // ---- W8 typed reduce UDF ------------------------------------------------

  test("W8: Aggregator (Open/Append/Close + merge) in a keyed window agg") {
    val df = Seq(
      (ts("2024-01-01 00:00:10"), "k1", 2.0),
      (ts("2024-01-01 00:00:20"), "k1", 4.0),
      (ts("2024-01-01 00:00:30"), "k2", 10.0),
      (ts("2024-01-01 00:01:10"), "k1", 9.0))
      .toDF("ts", "key", "value")
    val got = df.groupBy(window(col("ts"), "60 seconds"), col("key"))
      .agg(ReduceUdf.mean(col("value")).as("m"), avg(col("value")).as("builtin"))
      .select("key", "m", "builtin")
      .as[(String, Double, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, m, builtin) => assert(m === builtin) }
    assert(got.collectFirst { case ("k2", m, _) => m }.contains(10.0))
  }

  // ---- X10 MonoVertex bypass ---------------------------------------------

  test("X10: bypass edge routes tagged rows straight from source to sink") {
    import Pipeline._
    import graft.ops.Routing.TagCondition
    val src = Seq(
      ("k", ts("2024-01-01 00:00:10"), 1L, "fast"),
      ("k", ts("2024-01-01 00:00:20"), 2L, "slow"))
      .toDF("key", "ts", "value", "lane")
      .withColumn("tags", array(col("lane")))
    val spec = PipelineSpec(
      vertices = Seq(
        SourceV("in", src, "ts"),
        MapV("heavy", df => df.withColumn("value", col("value") * 100)),
        SinkV("out")),
      edges = Seq(
        Edge("in", "heavy", Some(TagCondition(Seq("slow")))),
        Edge("in", "out", Some(TagCondition(Seq("fast")))), // bypass
        Edge("heavy", "out")))
    val out = graft.streaming.Compiler.compile(spec, streaming = false)("out")
      .select("value").as[Long].collect().sorted
    assert(out.toSeq === Seq(1L, 200L)) // fast lane untouched, slow mapped
  }
}
