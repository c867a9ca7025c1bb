package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

/** Env-gated REAL-BROKER integration rig (r14 verdict #7): every test
  * here is skipped (`assume`) unless its endpoint env var is set, so
  * the suite is a no-op in this sandbox (no jars, zero egress) and
  * becomes live evidence with zero new code the first time the build
  * runs in an environment with a reachable broker:
  *
  *   GRAFT_KAFKA_BOOTSTRAP=host:port        (topic: GRAFT_KAFKA_TOPIC, pre-created, 1 partition)
  *   GRAFT_PULSAR_HOST / GRAFT_PULSAR_PORT  (topic: GRAFT_PULSAR_TOPIC)
  *   GRAFT_NATS_HOST / GRAFT_NATS_PORT
  *   GRAFT_JETSTREAM_HOST / GRAFT_JETSTREAM_PORT
  *     (stream GRAFT_JETSTREAM_STREAM pre-created over subject
  *      GRAFT_JETSTREAM_SUBJECT)
  *   GRAFT_SQS_QUEUE_URL (+ GRAFT_AWS_ACCESS_KEY / GRAFT_AWS_SECRET_KEY /
  *      GRAFT_AWS_REGION / GRAFT_AWS_SESSION_TOKEN for SigV4-signed AWS;
  *      unsigned otherwise — elasticmq/localstack)
  *
  * Each test is the minimal at-least-once round-trip through the SAME
  * wire client the engine deploys — produce → consume → ack — tagged
  * with a per-run nonce so reruns against a shared broker don't
  * cross-talk. These complement (never replace) the in-process stub
  * specs: the stubs pin protocol bytes; this rig pins real-broker
  * behavior when one exists. */
class BrokerIntegrationSpec extends AnyFunSuite {

  private val nonce = java.lang.Long.toHexString(
    java.util.concurrent.ThreadLocalRandom.current().nextLong() & Long.MaxValue)

  private def env(k: String): Option[String] = sys.env.get(k).filter(_.nonEmpty)

  private def await[A](what: String, timeoutMs: Long = 15000)(poll: => Option[A]): A = {
    val t0 = System.nanoTime()
    var r = poll
    while (r.isEmpty) {
      if ((System.nanoTime() - t0) / 1e6 > timeoutMs)
        fail(s"timed out after ${timeoutMs}ms waiting for $what")
      Thread.sleep(50)
      r = poll
    }
    r.get
  }

  test("kafka wire: produce → fetch round-trip against a real broker") {
    assume(env("GRAFT_KAFKA_BOOTSTRAP").isDefined,
      "set GRAFT_KAFKA_BOOTSTRAP=host:port (+ GRAFT_KAFKA_TOPIC, 1 partition) to run")
    val Array(host, port) = sys.env("GRAFT_KAFKA_BOOTSTRAP").split(":")
    val topic = env("GRAFT_KAFKA_TOPIC").getOrElse("graft-it")
    val conn = new graft.streaming.KafkaWire.Conn(host, port.toInt)
    try {
      val payloads = (1 to 3).map(i => s"$nonce-$i")
      val base = conn.produce(topic, 0,
        payloads.map(p => (s"k-$nonce".getBytes(UTF_8), p.getBytes(UTF_8))))
      val got = await(s"3 records from offset $base") {
        val (_, recs) = conn.fetch(topic, 0, base)
        val mine = recs.filter(_.offset >= base).take(3)
        if (mine.size == 3) Some(mine) else None
      }
      assert(got.map(r => new String(r.value, UTF_8)) == payloads)
    } finally conn.close()
  }

  test("pulsar wire: batched send → poll → cumulative ack against a real broker") {
    assume(env("GRAFT_PULSAR_HOST").isDefined,
      "set GRAFT_PULSAR_HOST/GRAFT_PULSAR_PORT (+ GRAFT_PULSAR_TOPIC) to run")
    val host = sys.env("GRAFT_PULSAR_HOST")
    val port = env("GRAFT_PULSAR_PORT").getOrElse("6650").toInt
    val topic = env("GRAFT_PULSAR_TOPIC").getOrElse("graft-it")
    val consumer = new graft.streaming.PulsarWire.Consumer(
      host, port, topic, subscription = s"graft-it-$nonce")
    val producer = new graft.streaming.PulsarWire.Producer(host, port, topic)
    try {
      val payloads = (1 to 3).map(i => s"$nonce-$i")
      producer.sendBatch(payloads.map(p => (s"k-$nonce", p.getBytes(UTF_8))))
      val mine = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      await("3 messages with this run's nonce") {
        consumer.poll().foreach { case (id, _, body) =>
          val s = new String(body, UTF_8)
          if (s.startsWith(nonce)) mine += ((id, s))
        }
        if (mine.size >= 3) Some(()) else None
      }
      assert(mine.map(_._2).toSeq == payloads)
      consumer.ackCumulative(mine.last._1)
    } finally { producer.close(); consumer.close() }
  }

  test("nats core wire: publish → subscription drain against a real broker") {
    assume(env("GRAFT_NATS_HOST").isDefined,
      "set GRAFT_NATS_HOST/GRAFT_NATS_PORT to run")
    val host = sys.env("GRAFT_NATS_HOST")
    val port = env("GRAFT_NATS_PORT").getOrElse("4222").toInt
    val subject = s"graft.it.$nonce"
    val sub = new graft.streaming.NatsWire.Subscription(host, port, subject)
    try {
      val payloads = (1 to 3).map(i => s"$nonce-$i")
      graft.streaming.NatsWire.publish(host, port, subject,
        payloads.map(_.getBytes(UTF_8)))
      val got = scala.collection.mutable.ArrayBuffer.empty[String]
      await("3 core-NATS messages") {
        got ++= sub.drain().map(new String(_, UTF_8))
        if (got.size >= 3) Some(()) else None
      }
      assert(got.toSeq == payloads)
    } finally sub.close()
  }

  test("jetstream wire: publish → range fetch → AckAll floor against a real broker") {
    assume(env("GRAFT_JETSTREAM_HOST").isDefined,
      "set GRAFT_JETSTREAM_HOST/GRAFT_JETSTREAM_PORT (+ GRAFT_JETSTREAM_STREAM/" +
        "GRAFT_JETSTREAM_SUBJECT, stream pre-created) to run")
    val host = sys.env("GRAFT_JETSTREAM_HOST")
    val port = env("GRAFT_JETSTREAM_PORT").getOrElse("4222").toInt
    val stream = env("GRAFT_JETSTREAM_STREAM").getOrElse("GRAFT_IT")
    val subject = env("GRAFT_JETSTREAM_SUBJECT").getOrElse("graft.it")
    val js = new graft.streaming.JetStreamWire(
      host, port, stream, subject, durable = s"graft-it-$nonce")
    try {
      val before = js.lastSequence
      val payloads = (1 to 3).map(i => s"$nonce-$i")
      graft.streaming.NatsWire.publish(host, port, subject,
        payloads.map(_.getBytes(UTF_8)))
      val after = await(s"stream sequence to advance past $before") {
        val s = js.lastSequence
        if (s >= before + 3) Some(s) else None
      }
      val got = js.fetch(before + 1, after + 1)
      assert(got.map(p => new String(p._2, UTF_8)).takeRight(3) == payloads)
      js.ackUpTo(after)
      assert(js.ackFloor == after)
    } finally js.close()
  }

  test("sqs wire: signed send → receive → delete against a real queue") {
    assume(env("GRAFT_SQS_QUEUE_URL").isDefined,
      "set GRAFT_SQS_QUEUE_URL (+ GRAFT_AWS_ACCESS_KEY/GRAFT_AWS_SECRET_KEY/" +
        "GRAFT_AWS_REGION for SigV4-signed AWS) to run")
    val creds = for {
      ak <- env("GRAFT_AWS_ACCESS_KEY"); sk <- env("GRAFT_AWS_SECRET_KEY")
    } yield graft.streaming.SigV4.Credentials(ak, sk, env("GRAFT_AWS_SESSION_TOKEN"))
    val wire = new graft.streaming.SqsWire(sys.env("GRAFT_SQS_QUEUE_URL"),
      credentials = creds, region = env("GRAFT_AWS_REGION").getOrElse("us-east-1"))
    val payloads = (1 to 2).map(i => s"$nonce-$i")
    wire.send(payloads.map(_.getBytes(UTF_8)))
    val mine = scala.collection.mutable.Map.empty[String, String] // body -> handle
    await("both messages with this run's nonce") {
      wire.receive(10).foreach { case (handle, _, body, _) =>
        val s = new String(body, UTF_8)
        if (s.startsWith(nonce)) mine(s) = handle
      }
      if (mine.size >= 2) Some(()) else None
    }
    assert(mine.keySet == payloads.toSet)
    wire.delete(mine.values.toSeq)
  }
}
