package graft.streaming

import java.lang.invoke.{MethodHandles, MethodHandle, MethodType}
import java.time.Duration

import graft.streaming.Connectors.JetStreamConsumer

/** Real-SDK binding for the JetStream source (S5) — the reference's own
  * ISB transport (`rust/extns/numaflow-nats/src/jetstream.rs`). The
  * engine ships no broker client jars (zero-egress build), so the
  * binding is CLASSPATH-GATED exactly like the Kafka wiring
  * (`Kafka.source` requires spark-sql-kafka at runtime): when the
  * official `io.nats:jnats` client is on the runtime classpath,
  * [[bind]] returns a [[JetStreamConsumer]] backed by it; when it is
  * not, [[isAvailable]] is false and [[bind]] fails immediately with a
  * clear message — never half-way into a stream.
  *
  * Every class and method is resolved ONCE at bind time via
  * MethodHandles (exact public jnats API names, pinned below), so an SDK
  * version that renamed any of them also fails at bind time, loudly.
  *
  * API mapping (jnats public API → adapter contract):
  *  - `lastSequence` ← `JetStreamManagement.getStreamInfo(stream)
  *    .getStreamState().getLastSequence()` — the broker's stream head.
  *  - `fetch(from, until)` ← a transient ordered pull subscription with
  *    `DeliverPolicy.ByStartSequence(from)`, drained while
  *    `streamSequence < until` — replay is served by the STREAM, the
  *    adapter buffers nothing (the property that makes JetStream the
  *    reference's ISB: `JetStreamSource` holds no state but the ack
  *    floor).
  *  - `ackUpTo(seq)` ← durable consumer with `AckPolicy.All`: acking
  *    the highest delivered message ≤ seq cumulatively acks everything
  *    before it (JetStream's AckAll contract).
  */
object JetStreamSdk {

  private val EntryClass = "io.nats.client.Nats"

  /** True when the jnats client is loadable in this JVM. */
  def isAvailable: Boolean =
    try { Class.forName(EntryClass); true }
    catch { case _: ClassNotFoundException => false }

  /** One resolved jnats surface; constructing it proves the classpath. */
  private final class Api {
    private val lookup = MethodHandles.publicLookup()
    private def cls(n: String): Class[_] =
      try Class.forName(n)
      catch { case e: ClassNotFoundException =>
        throw new IllegalStateException(
          s"NATS JetStream binding requires io.nats:jnats on the runtime " +
          s"classpath (class $n not found) — add the client jar, or use " +
          s"the injected-transport JetStreamSource for tests", e)
      }
    private def mh(c: Class[_], name: String, ret: Class[_], args: Class[_]*): MethodHandle =
      try lookup.findVirtual(c, name, MethodType.methodType(ret, args.toArray))
      catch { case e: ReflectiveOperationException =>
        throw new IllegalStateException(
          s"jnats API mismatch: ${c.getName}.$name — the binding pins the " +
          s"public jnats API; rebuild against this SDK version", e)
      }
    private def smh(c: Class[_], name: String, ret: Class[_], args: Class[_]*): MethodHandle =
      try lookup.findStatic(c, name, MethodType.methodType(ret, args.toArray))
      catch { case e: ReflectiveOperationException =>
        throw new IllegalStateException(
          s"jnats API mismatch: ${c.getName}.$name (static)", e)
      }

    val natsC: Class[_] = cls(EntryClass)
    val connC: Class[_] = cls("io.nats.client.Connection")
    val jsC: Class[_] = cls("io.nats.client.JetStream")
    val jsmC: Class[_] = cls("io.nats.client.JetStreamManagement")
    val subC: Class[_] = cls("io.nats.client.JetStreamSubscription")
    val msgC: Class[_] = cls("io.nats.client.Message")
    val metaC: Class[_] = cls("io.nats.client.impl.NatsJetStreamMetaData")
    val psoC: Class[_] = cls("io.nats.client.PullSubscribeOptions")
    val psoBC: Class[_] = cls("io.nats.client.PullSubscribeOptions$Builder")
    val ccC: Class[_] = cls("io.nats.client.api.ConsumerConfiguration")
    val ccBC: Class[_] = cls("io.nats.client.api.ConsumerConfiguration$Builder")
    val apC: Class[_] = cls("io.nats.client.api.AckPolicy")
    val dpC: Class[_] = cls("io.nats.client.api.DeliverPolicy")
    val siC: Class[_] = cls("io.nats.client.api.StreamInfo")
    val ssC: Class[_] = cls("io.nats.client.api.StreamState")

    val connect: MethodHandle = smh(natsC, "connect", connC, classOf[String])
    val jetStream: MethodHandle = mh(connC, "jetStream", jsC)
    val jsm: MethodHandle = mh(connC, "jetStreamManagement", jsmC)
    val closeConn: MethodHandle = mh(connC, "close", classOf[Unit])
    val getStreamInfo: MethodHandle = mh(jsmC, "getStreamInfo", siC, classOf[String])
    val getStreamState: MethodHandle = mh(siC, "getStreamState", ssC)
    val getLastSequence: MethodHandle = mh(ssC, "getLastSequence", classOf[Long])
    val subscribe: MethodHandle = mh(jsC, "subscribe", subC, classOf[String], psoC)
    val fetch: MethodHandle =
      mh(subC, "fetch", classOf[java.util.List[_]], classOf[Int], classOf[Duration])
    val unsubscribe: MethodHandle = mh(subC, "unsubscribe", classOf[Unit])
    val msgData: MethodHandle = mh(msgC, "getData", classOf[Array[Byte]])
    val msgMeta: MethodHandle = mh(msgC, "metaData", metaC)
    val msgAck: MethodHandle = mh(msgC, "ack", classOf[Unit])
    val msgNak: MethodHandle = mh(msgC, "nak", classOf[Unit])
    val streamSeq: MethodHandle = mh(metaC, "streamSequence", classOf[Long])

    val psoBuilder: MethodHandle = smh(psoC, "builder", psoBC)
    val psoDurable: MethodHandle = mh(psoBC, "durable", psoBC, classOf[String])
    val psoConfig: MethodHandle = mh(psoBC, "configuration", psoBC, ccC)
    val psoBuild: MethodHandle = mh(psoBC, "build", psoC)
    val ccBuilder: MethodHandle = smh(ccC, "builder", ccBC)
    val ccAckPolicy: MethodHandle = mh(ccBC, "ackPolicy", ccBC, apC)
    val ccDeliverPolicy: MethodHandle = mh(ccBC, "deliverPolicy", ccBC, dpC)
    val ccStartSeq: MethodHandle = mh(ccBC, "startSequence", ccBC, classOf[Long])
    val ccBuild: MethodHandle = mh(ccBC, "build", ccC)
    def enumVal(c: Class[_], name: String): AnyRef =
      c.getMethod("valueOf", classOf[String]).invoke(null, name)
  }

  /** Bind a [[JetStreamConsumer]] to a live server. Fails fast (clear
    * IllegalStateException) when the jnats jar is absent; after that,
    * every call is plain SDK usage. `close()` the returned handle's
    * connection via [[Bound.close]]. */
  final class Bound private[JetStreamSdk] (api: Api, conn: AnyRef, stream: String,
                                           subject: String, durable: String,
                                           fetchWaitMs: Long) extends JetStreamConsumer
      with AutoCloseable {
    private val js = api.jetStream.invoke(conn)
    private val mgmt = api.jsm.invoke(conn)
    // Durable AckAll consumer: the ack floor lives on the BROKER, so a
    // restarted engine resumes from it (jetstream.rs semantics).
    private val durableSub = {
      val cc = api.ccBuild.invoke(
        api.ccAckPolicy.invoke(api.ccBuilder.invoke(), api.enumVal(api.apC, "All")))
      val pso = api.psoBuild.invoke(
        api.psoConfig.invoke(api.psoDurable.invoke(api.psoBuilder.invoke(), durable), cc))
      api.subscribe.invoke(js, subject, pso)
    }

    def lastSequence: Long =
      api.getLastSequence.invoke(
        api.getStreamState.invoke(api.getStreamInfo.invoke(mgmt, stream)))
        .asInstanceOf[Long]

    def fetch(from: Long, until: Long): Seq[(Long, Array[Byte])] = {
      if (until <= from) return Seq.empty
      // Transient replay subscription from `from`: the stream serves the
      // range; nothing is buffered engine-side.
      val cc = api.ccBuild.invoke(
        api.ccStartSeq.invoke(
          api.ccDeliverPolicy.invoke(api.ccBuilder.invoke(),
            api.enumVal(api.dpC, "ByStartSequence")),
          math.max(from, 1L)))
      val pso = api.psoBuild.invoke(api.psoConfig.invoke(api.psoBuilder.invoke(), cc))
      val sub = api.subscribe.invoke(js, subject, pso)
      try {
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]
        var exhausted = false
        while (!exhausted) {
          val batch = api.fetch.invoke(sub, 256, Duration.ofMillis(fetchWaitMs))
            .asInstanceOf[java.util.List[AnyRef]]
          if (batch.isEmpty) exhausted = true
          else {
            val it = batch.iterator()
            while (it.hasNext && !exhausted) {
              val m = it.next()
              val seq = api.streamSeq.invoke(api.msgMeta.invoke(m)).asInstanceOf[Long]
              if (seq >= until) exhausted = true
              else if (seq >= from) out += ((seq, api.msgData.invoke(m).asInstanceOf[Array[Byte]]))
            }
          }
        }
        out.toSeq
      } finally api.unsubscribe.invoke(sub)
    }

    def ackUpTo(seq: Long): Unit = {
      // AckAll: acking the highest delivered message <= seq acks the
      // whole prefix. Drain the durable sub up to seq and ack the last.
      // Messages the fetch over-delivered (seq' > seq) are NAK'd so the
      // broker redelivers them immediately — abandoning them unacked
      // would stall the ack floor behind ack_wait on every commit and
      // make the NEXT ackUpTo see an empty fetch for the outstanding
      // range.
      var last: AnyRef = null
      var exhausted = false
      while (!exhausted) {
        val batch = api.fetch.invoke(durableSub, 256, Duration.ofMillis(fetchWaitMs))
          .asInstanceOf[java.util.List[AnyRef]]
        if (batch.isEmpty) exhausted = true
        else {
          val it = batch.iterator()
          while (it.hasNext) {
            val m = it.next()
            if (api.streamSeq.invoke(api.msgMeta.invoke(m)).asInstanceOf[Long] <= seq) last = m
            else { exhausted = true; api.msgNak.invoke(m) }
          }
        }
      }
      if (last != null) { api.msgAck.invoke(last); () }
    }

    def close(): Unit = { api.closeConn.invoke(conn); () }
  }

  /** Resolve the SDK and connect. One IllegalStateException path for a
    * missing/mismatched SDK (bind time), normal SDK exceptions after. */
  def bind(url: String, stream: String, subject: String, durable: String,
           fetchWaitMs: Long = 1000L): Bound = {
    val api = new Api
    val conn = api.connect.invoke(url)
    new Bound(api, conn, stream, subject, durable, fetchWaitMs)
  }
}

/** Real-SDK binding for CORE NATS (S4, at-most-once, no broker ack —
  * `rust/extns/numaflow-nats/src/nats.rs`): a plain subject subscription
  * drained non-blockingly. Same jar and gate as [[JetStreamSdk]]
  * (`io.nats:jnats`); implements the engine's injected
  * [[Connectors.NatsSubscription]] transport. */
object NatsCoreSdk {

  def isAvailable: Boolean = JetStreamSdk.isAvailable

  final class Bound private[NatsCoreSdk] (conn: AnyRef, sub: AnyRef,
                                          next: MethodHandle, data: MethodHandle,
                                          closeConn: MethodHandle, pollWaitMs: Long)
      extends Connectors.NatsSubscription with AutoCloseable {
    def drain(): Seq[Array[Byte]] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var more = true
      while (more) {
        val m = next.invoke(sub, Duration.ofMillis(pollWaitMs))
        if (m == null) more = false
        else out += data.invoke(m).asInstanceOf[Array[Byte]]
      }
      out.toSeq
    }
    def close(): Unit = { closeConn.invoke(conn); () }
  }

  def bind(url: String, subject: String, pollWaitMs: Long = 50L): Bound = {
    val lookup = MethodHandles.publicLookup()
    def cls(n: String): Class[_] =
      try Class.forName(n)
      catch { case e: ClassNotFoundException =>
        throw new IllegalStateException(
          s"NATS core binding requires io.nats:jnats on the runtime " +
          s"classpath (class $n not found) — add the client jar, or use " +
          s"the injected-transport NatsSource for tests", e)
      }
    def mh(c: Class[_], name: String, ret: Class[_], args: Class[_]*): MethodHandle =
      try lookup.findVirtual(c, name, MethodType.methodType(ret, args.toArray))
      catch { case e: ReflectiveOperationException =>
        throw new IllegalStateException(s"jnats API mismatch: ${c.getName}.$name", e)
      }
    def smh(c: Class[_], name: String, ret: Class[_], args: Class[_]*): MethodHandle =
      try lookup.findStatic(c, name, MethodType.methodType(ret, args.toArray))
      catch { case e: ReflectiveOperationException =>
        throw new IllegalStateException(s"jnats API mismatch: ${c.getName}.$name (static)", e)
      }
    val natsC = cls("io.nats.client.Nats")
    val connC = cls("io.nats.client.Connection")
    val subC = cls("io.nats.client.Subscription")
    val msgC = cls("io.nats.client.Message")
    val connect = smh(natsC, "connect", connC, classOf[String])
    val subscribe = mh(connC, "subscribe", subC, classOf[String])
    val next = mh(subC, "nextMessage", msgC, classOf[Duration])
    val data = mh(msgC, "getData", classOf[Array[Byte]])
    val closeConn = mh(connC, "close", classOf[Unit])
    val conn = connect.invoke(url).asInstanceOf[AnyRef]
    new Bound(conn, subscribe.invoke(conn, subject).asInstanceOf[AnyRef],
      next, data, closeConn, pollWaitMs)
  }
}
