package graft.streaming

import java.lang.invoke.{MethodHandle, MethodHandles, MethodType}
import java.util.concurrent.TimeUnit

import graft.streaming.Connectors.PulsarConsumer

/** Real-SDK binding for the Pulsar source/sink (S6/K4) — reference
  * `rust/extns/numaflow-pulsar/src/source.rs`. Classpath-gated like
  * [[JetStreamSdk]]: with the official `org.apache.pulsar:pulsar-client`
  * on the runtime classpath, [[bind]] returns a [[PulsarConsumer]]
  * backed by it; without it, [[isAvailable]] is false and [[bind]] fails
  * at bind time with a clear message. All API surface is resolved once
  * via MethodHandles (public client API names pinned below).
  *
  * Adapter-id mapping: the engine contract speaks monotone Long ids
  * ([[PulsarConsumer]]); Pulsar's `MessageId` is opaque — the binding
  * assigns local ids in arrival order and keeps the id→MessageId map
  * until the cumulative ack releases the prefix (exactly the bookkeeping
  * `PulsarSource` itself layers on the injected transport, kept here so
  * real and fake transports expose the identical surface). */
object PulsarSdk {

  private val EntryClass = "org.apache.pulsar.client.api.PulsarClient"

  def isAvailable: Boolean =
    try { Class.forName(EntryClass); true }
    catch { case _: ClassNotFoundException => false }

  private final class Api {
    private val lookup = MethodHandles.publicLookup()
    private def cls(n: String): Class[_] =
      try Class.forName(n)
      catch { case e: ClassNotFoundException =>
        throw new IllegalStateException(
          s"Pulsar binding requires org.apache.pulsar:pulsar-client on the " +
          s"runtime classpath (class $n not found) — add the client jar, or " +
          s"use the injected-transport PulsarSource for tests", e)
      }
    private def mh(c: Class[_], name: String, ret: Class[_], args: Class[_]*): MethodHandle =
      try lookup.findVirtual(c, name, MethodType.methodType(ret, args.toArray))
      catch { case e: ReflectiveOperationException =>
        throw new IllegalStateException(s"pulsar-client API mismatch: ${c.getName}.$name", e)
      }
    private def smh(c: Class[_], name: String, ret: Class[_], args: Class[_]*): MethodHandle =
      try lookup.findStatic(c, name, MethodType.methodType(ret, args.toArray))
      catch { case e: ReflectiveOperationException =>
        throw new IllegalStateException(s"pulsar-client API mismatch: ${c.getName}.$name (static)", e)
      }

    val clientC: Class[_] = cls(EntryClass)
    val clientBC: Class[_] = cls("org.apache.pulsar.client.api.ClientBuilder")
    val consBC: Class[_] = cls("org.apache.pulsar.client.api.ConsumerBuilder")
    val consC: Class[_] = cls("org.apache.pulsar.client.api.Consumer")
    val msgC: Class[_] = cls("org.apache.pulsar.client.api.Message")
    val midC: Class[_] = cls("org.apache.pulsar.client.api.MessageId")

    val builder: MethodHandle = smh(clientC, "builder", clientBC)
    val serviceUrl: MethodHandle = mh(clientBC, "serviceUrl", clientBC, classOf[String])
    val buildClient: MethodHandle = mh(clientBC, "build", clientC)
    val newConsumer: MethodHandle = mh(clientC, "newConsumer", consBC)
    val topic: MethodHandle = mh(consBC, "topic", consBC, classOf[Array[String]])
    val subName: MethodHandle = mh(consBC, "subscriptionName", consBC, classOf[String])
    val subscribe: MethodHandle = mh(consBC, "subscribe", consC)
    val receive: MethodHandle =
      mh(consC, "receive", msgC, classOf[Int], classOf[TimeUnit])
    val msgData: MethodHandle = mh(msgC, "getData", classOf[Array[Byte]])
    val msgKey: MethodHandle = mh(msgC, "getKey", classOf[String])
    val msgId: MethodHandle = mh(msgC, "getMessageId", midC)
    val ackCumulative: MethodHandle =
      mh(consC, "acknowledgeCumulative", classOf[Unit], midC)
    val closeClient: MethodHandle = mh(clientC, "close", classOf[Unit])
  }

  final class Bound private[PulsarSdk] (api: Api, client: AnyRef, consumer: AnyRef,
                                        pollWaitMs: Int) extends PulsarConsumer
      with AutoCloseable {
    private var nextId = 0L
    private val inFlight = scala.collection.mutable.TreeMap.empty[Long, AnyRef]

    def poll(): Seq[(Long, String, Array[Byte])] = synchronized {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Array[Byte])]
      var more = true
      while (more) {
        val m = api.receive.invoke(consumer, pollWaitMs, TimeUnit.MILLISECONDS)
        if (m == null) more = false
        else {
          val id = nextId; nextId += 1
          inFlight(id) = api.msgId.invoke(m).asInstanceOf[AnyRef]
          out += ((id, api.msgKey.invoke(m).asInstanceOf[String],
            api.msgData.invoke(m).asInstanceOf[Array[Byte]]))
        }
      }
      out.toSeq
    }

    def ackCumulative(messageId: Long): Unit = synchronized {
      inFlight.get(messageId).foreach { mid =>
        api.ackCumulative.invoke(consumer, mid)
        // cumulative: everything <= messageId is acked broker-side
        inFlight.rangeTo(messageId).keys.toSeq.foreach(inFlight.remove)
      }
    }

    def close(): Unit = { api.closeClient.invoke(client); () }
  }

  /** Resolve the SDK and subscribe. IllegalStateException = missing or
    * mismatched client jar (bind time); SDK exceptions after. */
  def bind(serviceUrl: String, topic: String, subscription: String,
           pollWaitMs: Int = 100): Bound = {
    val api = new Api
    val client = api.buildClient.invoke(
      api.serviceUrl.invoke(api.builder.invoke(), serviceUrl))
    val consumer = api.subscribe.invoke(
      api.subName.invoke(
        api.topic.invoke(api.newConsumer.invoke(client), Array(topic)),
        subscription))
    new Bound(api, client, consumer, pollWaitMs)
  }
}
