package graft.streaming

import java.net.InetSocketAddress
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.streaming.StreamingQuery

/** Daemon status API (SURVEY X9): the reference runs a daemon deployment
  * answering ListBuffers / GetVertexMetrics / GetPipelineWatermarks /
  * GetPipelineStatus over gRPC (numaflow
  * `pkg/apis/proto/daemon/daemon.proto:138-165`). The engine's equivalents
  * already exist on `StreamingQuery.lastProgress` (rates, watermark, state
  * rows, per-source offsets); this endpoint serves them as JSON.
  *
  * Routes: `GET /status` → one entry per registered query (name, id,
  * active, full lastProgress); `GET /watermarks` → name → event-time
  * watermark; `GET /pending` → name → registered GraftSource backlog
  * (the reference's pending/lag metric, S10).
  */
final class StatusApi(port: Int) extends AutoCloseable {

  private val queries = new java.util.concurrent.ConcurrentHashMap[String, StreamingQuery]()
  private val sources = new java.util.concurrent.ConcurrentHashMap[String, UdSource.GraftSource]()

  def track(name: String, q: StreamingQuery): StreamingQuery = { queries.put(name, q); q }
  def trackSource(name: String, s: UdSource.GraftSource): Unit = sources.put(name, s)

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""

  private def statusJson: String = {
    import scala.jdk.CollectionConverters._
    queries.asScala.toSeq.sortBy(_._1).map { case (name, q) =>
      val progress = Option(q.lastProgress).map(_.json).getOrElse("null")
      s"""{"name":${jstr(name)},"id":${jstr(q.id.toString)},"active":${q.isActive},"lastProgress":$progress}"""
    }.mkString("[", ",", "]")
  }

  private def watermarksJson: String = {
    import scala.jdk.CollectionConverters._
    queries.asScala.toSeq.sortBy(_._1).map { case (name, q) =>
      val wm = Option(q.lastProgress)
        .flatMap(p => Option(p.eventTime.get("watermark"))).orNull
      s"${jstr(name)}:${if (wm == null) "null" else jstr(wm)}"
    }.mkString("{", ",", "}")
  }

  private def pendingJson: String = {
    import scala.jdk.CollectionConverters._
    sources.asScala.toSeq.sortBy(_._1).map { case (name, s) =>
      s"${jstr(name)}:${s.pending}"
    }.mkString("{", ",", "}")
  }

  private val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    def route(path: String)(body: () => String): Unit =
      s.createContext(path, new HttpHandler {
        override def handle(ex: HttpExchange): Unit = {
          val b = body().getBytes("UTF-8")
          ex.getResponseHeaders.set("Content-Type", "application/json")
          ex.sendResponseHeaders(200, b.length)
          ex.getResponseBody.write(b)
          ex.close()
        }
      })
    route("/status")(() => statusJson)
    route("/watermarks")(() => watermarksJson)
    route("/pending")(() => pendingJson)
    s.start()
    s
  }

  def url: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  override def close(): Unit = server.stop(0)
}
