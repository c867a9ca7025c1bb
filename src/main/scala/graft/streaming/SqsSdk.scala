package graft.streaming

import java.lang.invoke.{MethodHandle, MethodHandles, MethodType}
import java.nio.charset.StandardCharsets.UTF_8

import graft.streaming.Connectors.SqsClient

/** Real-SDK binding for the SQS source/sink (S7/K5) — reference
  * `rust/extns/numaflow-sqs/src/source.rs`. Classpath-gated like
  * [[JetStreamSdk]]/[[PulsarSdk]]: with the official AWS SDK v2 sqs
  * client (`software.amazon.awssdk:sqs`) on the runtime classpath,
  * [[bind]] returns the engine's [[SqsClient]] transport backed by it;
  * without it, [[isAvailable]] is false and [[bind]] fails at bind time
  * with a clear message. API surface resolved once via MethodHandles.
  *
  * Payloads: SQS message bodies are strings; the engine's byte contract
  * round-trips UTF-8 (the reference sources string bodies the same way).
  * Delete/send use the 10-entry batch APIs — the caller
  * ([[Connectors.sqsSink]]) already groups to the documented cap. */
object SqsSdk {

  private val EntryClass = "software.amazon.awssdk.services.sqs.SqsClient"
  private val Model = "software.amazon.awssdk.services.sqs.model"

  def isAvailable: Boolean =
    try { Class.forName(EntryClass); true }
    catch { case _: ClassNotFoundException => false }

  private final class Api {
    private val lookup = MethodHandles.publicLookup()
    private def cls(n: String): Class[_] =
      try Class.forName(n)
      catch { case e: ClassNotFoundException =>
        throw new IllegalStateException(
          s"SQS binding requires software.amazon.awssdk:sqs on the runtime " +
          s"classpath (class $n not found) — add the SDK jars, or use the " +
          s"injected-transport SqsSource for tests", e)
      }
    private def mh(c: Class[_], name: String, ret: Class[_], args: Class[_]*): MethodHandle =
      try lookup.findVirtual(c, name, MethodType.methodType(ret, args.toArray))
      catch { case e: ReflectiveOperationException =>
        throw new IllegalStateException(s"awssdk-sqs API mismatch: ${c.getName}.$name", e)
      }
    private def smh(c: Class[_], name: String, ret: Class[_], args: Class[_]*): MethodHandle =
      try lookup.findStatic(c, name, MethodType.methodType(ret, args.toArray))
      catch { case e: ReflectiveOperationException =>
        throw new IllegalStateException(s"awssdk-sqs API mismatch: ${c.getName}.$name (static)", e)
      }

    val clientC: Class[_] = cls(EntryClass)
    val clientBC: Class[_] = cls("software.amazon.awssdk.services.sqs.SqsClientBuilder")
    val recvReqC: Class[_] = cls(s"$Model.ReceiveMessageRequest")
    val recvReqBC: Class[_] = cls(s"$Model.ReceiveMessageRequest$$Builder")
    val recvRespC: Class[_] = cls(s"$Model.ReceiveMessageResponse")
    val msgC: Class[_] = cls(s"$Model.Message")
    val delReqC: Class[_] = cls(s"$Model.DeleteMessageBatchRequest")
    val delReqBC: Class[_] = cls(s"$Model.DeleteMessageBatchRequest$$Builder")
    val delEntC: Class[_] = cls(s"$Model.DeleteMessageBatchRequestEntry")
    val delEntBC: Class[_] = cls(s"$Model.DeleteMessageBatchRequestEntry$$Builder")
    val sendReqC: Class[_] = cls(s"$Model.SendMessageBatchRequest")
    val sendReqBC: Class[_] = cls(s"$Model.SendMessageBatchRequest$$Builder")
    val sendEntC: Class[_] = cls(s"$Model.SendMessageBatchRequestEntry")
    val sendEntBC: Class[_] = cls(s"$Model.SendMessageBatchRequestEntry$$Builder")

    val clientBuilder: MethodHandle = smh(clientC, "builder", clientBC)
    val clientBuild: MethodHandle = mh(clientBC, "build", classOf[Object])
    val closeClient: MethodHandle = mh(clientC, "close", classOf[Unit])

    val recvBuilder: MethodHandle = smh(recvReqC, "builder", recvReqBC)
    val recvQueueUrl: MethodHandle = mh(recvReqBC, "queueUrl", recvReqBC, classOf[String])
    val recvMax: MethodHandle = mh(recvReqBC, "maxNumberOfMessages", recvReqBC, classOf[Integer])
    val recvBuild: MethodHandle = mh(recvReqBC, "build", classOf[Object])
    val receiveMessage: MethodHandle = mh(clientC, "receiveMessage", recvRespC, recvReqC)
    val respMessages: MethodHandle = mh(recvRespC, "messages", classOf[java.util.List[_]])
    val msgBody: MethodHandle = mh(msgC, "body", classOf[String])
    val msgMessageId: MethodHandle = mh(msgC, "messageId", classOf[String])
    val msgReceipt: MethodHandle = mh(msgC, "receiptHandle", classOf[String])
    val msgAttrs: MethodHandle = mh(msgC, "attributesAsStrings", classOf[java.util.Map[_, _]])

    val delBuilder: MethodHandle = smh(delReqC, "builder", delReqBC)
    val delQueueUrl: MethodHandle = mh(delReqBC, "queueUrl", delReqBC, classOf[String])
    val delEntries: MethodHandle =
      mh(delReqBC, "entries", delReqBC, classOf[java.util.Collection[_]])
    val delBuild: MethodHandle = mh(delReqBC, "build", classOf[Object])
    val delEntBuilder: MethodHandle = smh(delEntC, "builder", delEntBC)
    val delEntId: MethodHandle = mh(delEntBC, "id", delEntBC, classOf[String])
    val delEntReceipt: MethodHandle = mh(delEntBC, "receiptHandle", delEntBC, classOf[String])
    val delEntBuild: MethodHandle = mh(delEntBC, "build", classOf[Object])
    val deleteBatch: MethodHandle = mh(clientC, "deleteMessageBatch", classOf[Object], delReqC)

    val sendBuilder: MethodHandle = smh(sendReqC, "builder", sendReqBC)
    val sendQueueUrl: MethodHandle = mh(sendReqBC, "queueUrl", sendReqBC, classOf[String])
    val sendEntries: MethodHandle =
      mh(sendReqBC, "entries", sendReqBC, classOf[java.util.Collection[_]])
    val sendBuild: MethodHandle = mh(sendReqBC, "build", classOf[Object])
    val sendEntBuilder: MethodHandle = smh(sendEntC, "builder", sendEntBC)
    val sendEntId: MethodHandle = mh(sendEntBC, "id", sendEntBC, classOf[String])
    val sendEntBody: MethodHandle = mh(sendEntBC, "messageBody", sendEntBC, classOf[String])
    val sendEntBuild: MethodHandle = mh(sendEntBC, "build", classOf[Object])
    val sendBatch: MethodHandle = mh(clientC, "sendMessageBatch", classOf[Object], sendReqC)
  }

  final class Bound private[SqsSdk] (api: Api, client: AnyRef, queueUrl: String)
      extends SqsClient with AutoCloseable {

    def receive(max: Int): Seq[(String, String, Array[Byte], Map[String, String])] = {
      val req = api.recvBuild.invoke(
        api.recvMax.invoke(
          api.recvQueueUrl.invoke(api.recvBuilder.invoke(), queueUrl),
          Integer.valueOf(math.min(max, 10)))) // API cap: 10 per receive
      val msgs = api.respMessages.invoke(api.receiveMessage.invoke(client, req))
        .asInstanceOf[java.util.List[AnyRef]]
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(String, String, Array[Byte], Map[String, String])]
      val it = msgs.iterator()
      while (it.hasNext) {
        val m = it.next()
        val attrs = api.msgAttrs.invoke(m).asInstanceOf[java.util.Map[String, String]]
        val sm = scala.collection.mutable.Map.empty[String, String]
        attrs.forEach((k, v) => { sm(k) = v; () })
        out += ((api.msgReceipt.invoke(m).asInstanceOf[String],
          api.msgMessageId.invoke(m).asInstanceOf[String],
          api.msgBody.invoke(m).asInstanceOf[String].getBytes(UTF_8),
          sm.toMap))
      }
      out.toSeq
    }

    def delete(receiptHandles: Seq[String]): Unit =
      receiptHandles.grouped(10).foreach { g => // batch API cap
        val entries = new java.util.ArrayList[AnyRef]()
        g.zipWithIndex.foreach { case (rh, i) =>
          entries.add(api.delEntBuild.invoke(
            api.delEntReceipt.invoke(
              api.delEntId.invoke(api.delEntBuilder.invoke(), s"d$i"), rh))
            .asInstanceOf[AnyRef])
        }
        val req = api.delBuild.invoke(
          api.delEntries.invoke(
            api.delQueueUrl.invoke(api.delBuilder.invoke(), queueUrl), entries))
        api.deleteBatch.invoke(client, req); ()
      }

    def send(bodies: Seq[Array[Byte]]): Unit =
      bodies.grouped(10).foreach { g =>
        val entries = new java.util.ArrayList[AnyRef]()
        g.zipWithIndex.foreach { case (b, i) =>
          entries.add(api.sendEntBuild.invoke(
            api.sendEntBody.invoke(
              api.sendEntId.invoke(api.sendEntBuilder.invoke(), s"s$i"),
              new String(b, UTF_8)))
            .asInstanceOf[AnyRef])
        }
        val req = api.sendBuild.invoke(
          api.sendEntries.invoke(
            api.sendQueueUrl.invoke(api.sendBuilder.invoke(), queueUrl), entries))
        api.sendBatch.invoke(client, req); ()
      }

    def close(): Unit = { api.closeClient.invoke(client); () }
  }

  /** Resolve the SDK and build a client for `queueUrl` (region and
    * credentials from the standard AWS provider chain, as any SDK v2
    * client). IllegalStateException = missing/mismatched SDK at bind
    * time; SDK exceptions after. */
  def bind(queueUrl: String): Bound = {
    val api = new Api
    val client = api.clientBuild.invoke(api.clientBuilder.invoke()).asInstanceOf[AnyRef]
    new Bound(api, client, queueUrl)
  }
}
