package graft.streaming

import java.net.InetSocketAddress
import java.sql.Timestamp
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import scala.jdk.CollectionConverters._

import graft.streaming.UdSource.{GraftSource, MemoryGraftSource, SourceRecord}

/** HTTP source (SURVEY S2): POST ingestion with the reference's header
  * contract — `X-Numaflow-Id` (dedup id), `X-Numaflow-Event-Time` (epoch
  * millis), `X-Numaflow-Keys` (comma-separated message keys) — numaflow
  * `rust/extns/numaflow-http/src/lib.rs:39-45,647-676`, endpoint
  * `POST /vertices/{vertexName}`.
  *
  * Implemented as a thin adapter over the UD-source SPI: the embedded JDK
  * HTTP server appends each request body to a [[MemoryGraftSource]] buffer
  * and the DSv2 machinery (offsets, checkpoint replay, commit→ack) does
  * the rest — ~60 lines of connector, everything else inherited, which is
  * exactly the adapter economics the SPI exists for.
  *
  * Duplicate `X-Numaflow-Id`s are accepted (202) but not re-buffered,
  * mirroring the reference's id-based dedup on ingest.
  */
final class HttpSource(port: Int, vertexName: String = "in") extends GraftSource with AutoCloseable {

  private val buffer = new MemoryGraftSource(1)
  private val seenIds = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    s.createContext(s"/vertices/$vertexName", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        try {
          if (ex.getRequestMethod != "POST") { respond(ex, 405, "POST only") }
          else {
            val body = ex.getRequestBody.readAllBytes()
            val hs = ex.getRequestHeaders
            val id = Option(hs.getFirst("X-Numaflow-Id"))
            if (id.exists(!seenIds.add(_))) respond(ex, 202, "duplicate")
            else {
              val eventTime = Option(hs.getFirst("X-Numaflow-Event-Time"))
                .map(ms => new Timestamp(ms.toLong))
                .getOrElse(new Timestamp(System.currentTimeMillis()))
              val keys = Option(hs.getFirst("X-Numaflow-Keys"))
                .map(_.split(",").toSeq).getOrElse(Seq.empty)
              val headers = hs.entrySet().asScala
                .map(e => e.getKey -> e.getValue.asScala.mkString(","))
                .toMap
              buffer.append(keys, body, eventTime, headers = headers)
              respond(ex, 200, "ok")
            }
          }
        } catch { case e: Exception => respond(ex, 400, s"bad request: ${e.getMessage}") }
      }
    })
    s.start()
    s
  }

  private def respond(ex: HttpExchange, code: Int, msg: String): Unit = {
    val b = msg.getBytes("UTF-8")
    ex.sendResponseHeaders(code, b.length)
    ex.getResponseBody.write(b)
    ex.close()
  }

  /** Local endpoint URL (for tests / clients). */
  def url: String = s"http://127.0.0.1:${server.getAddress.getPort}/vertices/$vertexName"

  // ---- GraftSource: delegate to the buffer -------------------------------
  def partitions: Seq[Int] = buffer.partitions
  def latestOffset(p: Int): Long = buffer.latestOffset(p)
  def read(p: Int, from: Long, until: Long): Iterator[SourceRecord] = buffer.read(p, from, until)
  def ack(p: Int, upTo: Long): Unit = buffer.ack(p, upTo)
  def pending: Long = buffer.pending

  override def close(): Unit = server.stop(0)
}
