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
  * (the reference's pending/lag metric, S10); `GET /buffers` → per-source
  * BufferInfo (pendingCount, bufferLength, bufferUsage, isFull —
  * daemon.proto ListBuffers); `GET /errors` → per-vertex error records
  * (tracked queries' terminal exceptions + reported errors —
  * daemon.proto GetVertexErrors / ContainerError).
  */
final class StatusApi(port: Int) extends AutoCloseable {

  private val queries = new java.util.concurrent.ConcurrentHashMap[String, StreamingQuery]()
  private val sources = new java.util.concurrent.ConcurrentHashMap[String, UdSource.GraftSource]()
  /** (vertex, epochMs, code, message) — reported processing errors. */
  private val errors =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, String, String)]()

  def track(name: String, q: StreamingQuery): StreamingQuery = { queries.put(name, q); q }
  def trackSource(name: String, s: UdSource.GraftSource): Unit = sources.put(name, s)
  /** Report a vertex error (the reference persists ContainerErrors from
    * runtime crash files; here operators/sinks report directly). */
  def reportError(vertex: String, code: String, message: String): Unit =
    errors.add((vertex, System.currentTimeMillis(), code, message))

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

  private def buffersJson: String = {
    import scala.jdk.CollectionConverters._
    sources.asScala.toSeq.sortBy(_._1).map { case (name, s) =>
      val cap = s.capacity
      val unbounded = cap == Long.MaxValue
      val usage =
        if (unbounded || cap == 0) 0.0 else s.pending.toDouble / cap
      s"""{"bufferName":${jstr(name)},"pendingCount":${s.pending},""" +
        s""""bufferLength":${if (unbounded) "null" else cap.toString},""" +
        s""""bufferUsage":$usage,"isFull":${!unbounded && s.pending >= cap}}"""
    }.mkString("[", ",", "]")
  }

  /** Per-vertex processing rates over trailing lookback windows — the
    * daemon rater (reference `pkg/daemon/server/service/rater/rater.go`:
    * timestamped count store, rate = Σ counts in window / window seconds).
    * Here the count store is the engine's own retained
    * StreamingQueryProgress history (`recentProgress`, ~100 batches), so
    * no extra bookkeeping thread is needed. */
  private def ratesJson: String = {
    import scala.jdk.CollectionConverters._
    val nowMs = System.currentTimeMillis()
    def rate(q: StreamingQuery, windowMs: Long): Double = {
      val stamped = q.recentProgress.toSeq.flatMap { p =>
        try Some((java.time.Instant.parse(p.timestamp).toEpochMilli, p.numInputRows))
        catch { case scala.util.control.NonFatal(_) => None }
      }
      if (stamped.isEmpty) 0.0
      else {
        val cutoff = nowMs - windowMs
        val rows = stamped.collect { case (t, n) if t >= cutoff => n }.sum
        // Denominator clamped to the span the retained history actually
        // covers: a query younger than the window — or whose
        // ~numRecentProgressUpdates-capped history no longer reaches back
        // that far — would otherwise understate its rate (rows / full
        // window instead of rows / lifetime). Floor at 1s so a single
        // fresh progress entry can't divide by ~0.
        val oldest = stamped.iterator.map(_._1).min
        val coveredMs = math.max(1000L, math.min(windowMs, nowMs - oldest))
        rows.toDouble / (coveredMs / 1000.0)
      }
    }
    val perQuery = queries.asScala.toSeq.sortBy(_._1).map { case (name, q) =>
      s"""${jstr(name)}:{"1m":${rate(q, 60000L)},"5m":${rate(q, 300000L)}}"""
    }.mkString("{", ",", "}")
    // History cap surfaced in the payload: rates are computed from the
    // engine's retained progress ring (spark.sql.streaming.
    // numRecentProgressUpdates, ~100 entries), so long windows with fast
    // triggers are effectively bounded by that retention.
    s"""{"historyCap":"spark.sql.streaming.numRecentProgressUpdates (~100 retained progress entries); window denominators clamped to the covered span","rates":$perQuery}"""
  }

  private def errorsJson: String = {
    import scala.jdk.CollectionConverters._
    // terminal query failures (StreamingQuery.exception) + reported errors
    val fromQueries = queries.asScala.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      q.exception.map(e =>
        (name, System.currentTimeMillis(), "StreamingQueryException",
          Option(e.getMessage).getOrElse("")))
    }
    (fromQueries ++ errors.asScala.toSeq).map { case (vertex, ts, code, msg) =>
      s"""{"vertex":${jstr(vertex)},"timestampMs":$ts,""" +
        s""""code":${jstr(code)},"message":${jstr(msg)}}"""
    }.mkString("[", ",", "]")
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
    route("/buffers")(() => buffersJson)
    route("/rates")(() => ratesJson)
    route("/errors")(() => errorsJson)
    s.start()
    s
  }

  def url: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  override def close(): Unit = server.stop(0)
}
