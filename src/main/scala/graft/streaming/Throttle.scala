package graft.streaming

/** Distributed rate limiting (SURVEY X5, the pool half): N processors
  * share one global token budget, discovering each other through a
  * shared consensus store and each drawing `floor(global / poolSize)`
  * tokens per epoch (numaflow `rust/numaflow-throttling/src/lib.rs:26-66`,
  * `src/state.rs` — the reference backs the store with Redis; here the
  * store is an injected interface, tests bind an in-memory fake, exactly
  * the [[Connectors]] economics).
  *
  * Semantics mirrored from the reference:
  *  - processors REGISTER and heartbeat; members that stop heartbeating
  *    age out after a TTL and the survivors' shares rebalance upward
  *    (the reference's pool-size consensus loop, state.rs:77-119);
  *  - the GLOBAL allowance ramps min→max linearly over `rampUpEpochs`
  *    (fractional slope supported — `max_ever_filled` is float there,
  *    double here), refilled once per epoch;
  *  - [[RateLimit.Mode]] governs the climb: Relaxed/Scheduled climb every
  *    epoch, OnlyIfUsed climbs only when the previous epoch's grant was
  *    fully drawn, GoBackN re-ramps from the floor after [[PooledRateLimiter.onFailure]];
  *  - unused tokens may be deposited back within the epoch
  *    (`deposit_unused`), capping what a stalled partition strands.
  *
  * Epochs are logical (caller-supplied clock), so specs are deterministic
  * and a driver can tie epochs to micro-batch triggers — the admission
  * point [[UdSource]] already consults per trigger.
  */
object Throttle {

  /** Shared processor-pool store: the consensus surface of the
    * reference's Redis-backed `state::store::Store`. */
  trait SharedStore {
    /** Announce membership (idempotent); starts the member's TTL clock. */
    def register(id: String, nowMs: Long): Unit
    /** Keep-alive; a member whose last beat is older than the store TTL
      * drops out of [[activeProcessors]]. */
    def heartbeat(id: String, nowMs: Long): Unit
    /** Graceful exit — immediate removal (reference `shutdown()`). */
    def deregister(id: String): Unit
    /** Members whose heartbeat is within TTL, sorted for determinism. */
    def activeProcessors(nowMs: Long): Seq[String]
  }

  /** File-backed shared store: the DURABLE out-of-process analog of the
    * reference's Redis store (`rust/numaflow-throttling/src/state.rs`)
    * for environments with a shared filesystem (NFS/EFS/object-store
    * mount — the standard shared surface a Spark cluster already has for
    * checkpoints). One file per member under `dir`, content = last
    * heartbeat millis. Writes go through temp-file + ATOMIC_MOVE, so
    * concurrent members in different JVMs never observe torn state;
    * reads that race a deregister are treated as dead members. Membership
    * survives process restart — a rejoining member overwrites its own
    * file and resumes, exactly the Redis-key-with-TTL lifecycle. */
  final class FileStore(dir: java.nio.file.Path, ttlMs: Long = 5000) extends SharedStore {
    import java.nio.file.{Files, StandardCopyOption}
    Files.createDirectories(dir)
    // member id -> filename, filesystem-safe
    private def f(id: String) =
      dir.resolve(java.net.URLEncoder.encode(id, "UTF-8") + ".beat")
    private def write(id: String, nowMs: Long): Unit = {
      val tmp = Files.createTempFile(dir, ".w", ".tmp")
      Files.writeString(tmp, nowMs.toString)
      Files.move(tmp, f(id), StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
    }
    def register(id: String, nowMs: Long): Unit = write(id, nowMs)
    def heartbeat(id: String, nowMs: Long): Unit = write(id, nowMs)
    def deregister(id: String): Unit = Files.deleteIfExists(f(id))
    def activeProcessors(nowMs: Long): Seq[String] = {
      import scala.jdk.CollectionConverters._
      val s = Files.list(dir)
      try s.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".beat"))
        .flatMap { p =>
          try {
            val beat = Files.readString(p).trim.toLong
            if (nowMs - beat <= ttlMs)
              Some(java.net.URLDecoder.decode(
                p.getFileName.toString.stripSuffix(".beat"), "UTF-8"))
            else None
          } catch { case scala.util.control.NonFatal(_) => None } // raced a deregister
        }.toSeq.sorted
      finally s.close()
    }
  }

  /** Network-shared store server: the Redis analog for pools WITHOUT a
    * shared filesystem (reference
    * `rust/numaflow-throttling/src/state/store/redis_store` — one store
    * process, members on any host reach it over the wire). One JVM (the
    * driver or a sidecar) hosts this tiny HTTP KV; members talk to it
    * through [[NetworkStore]] clients. State is the same
    * membership-with-TTL keyspace as every other [[SharedStore]].
    *
    * Protocol (query-string params, URL-encoded ids):
    * `POST /register?id&now` · `POST /heartbeat?id&now` ·
    * `POST /deregister?id` · `GET /active?now` → newline-separated ids. */
  final class NetworkStoreServer(port: Int, ttlMs: Long = 5000) extends AutoCloseable {
    private val inner = new InMemoryStore(ttlMs)
    private val server = com.sun.net.httpserver.HttpServer
      .create(new java.net.InetSocketAddress("127.0.0.1", port), 0)

    private def params(ex: com.sun.net.httpserver.HttpExchange): Map[String, String] =
      Option(ex.getRequestURI.getQuery).getOrElse("").split("&").toSeq
        .filter(_.contains("=")).map { kv =>
          val Array(k, v) = kv.split("=", 2)
          k -> java.net.URLDecoder.decode(v, "UTF-8")
        }.toMap
    private def route(path: String)(body: Map[String, String] => String): Unit =
      server.createContext(path, (ex: com.sun.net.httpserver.HttpExchange) => {
        val resp = (try body(params(ex)) catch {
          case scala.util.control.NonFatal(e) => s"err:${e.getMessage}"
        }).getBytes("UTF-8")
        ex.sendResponseHeaders(200, resp.length)
        ex.getResponseBody.write(resp)
        ex.close()
      })
    route("/register") { p => inner.register(p("id"), p("now").toLong); "ok" }
    route("/heartbeat") { p => inner.heartbeat(p("id"), p("now").toLong); "ok" }
    route("/deregister") { p => inner.deregister(p("id")); "ok" }
    route("/active") { p => inner.activeProcessors(p("now").toLong).mkString("\n") }
    server.start()

    def url: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    override def close(): Unit = server.stop(0)
  }

  /** Client half of the network store: a [[SharedStore]] whose state
    * lives behind a socket in the [[NetworkStoreServer]] process — pool
    * members in DIFFERENT JVMs/hosts share membership through it. No
    * Spark dependency: usable from executors and sidecar processes. */
  final class NetworkStore(serverUrl: String) extends SharedStore {
    private val client = java.net.http.HttpClient.newHttpClient()
    private def call(path: String, post: Boolean): String = {
      val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(serverUrl + path))
      val req = (if (post) b.POST(java.net.http.HttpRequest.BodyPublishers.noBody()) else b.GET()).build()
      val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString()).body()
      if (resp.startsWith("err:")) throw new java.io.IOException(resp)
      resp
    }
    private def enc(id: String) = java.net.URLEncoder.encode(id, "UTF-8")
    def register(id: String, nowMs: Long): Unit =
      call(s"/register?id=${enc(id)}&now=$nowMs", post = true)
    def heartbeat(id: String, nowMs: Long): Unit =
      call(s"/heartbeat?id=${enc(id)}&now=$nowMs", post = true)
    def deregister(id: String): Unit =
      call(s"/deregister?id=${enc(id)}", post = true)
    def activeProcessors(nowMs: Long): Seq[String] = {
      val body = call(s"/active?now=$nowMs", post = false)
      if (body.isEmpty) Seq.empty else body.split("\n").toSeq
    }
  }

  /** In-memory store fake: single-JVM stand-in for the Redis store, with
    * real TTL aging so partition/death rebalancing is testable. */
  final class InMemoryStore(ttlMs: Long = 5000) extends SharedStore {
    private val beats = scala.collection.mutable.Map.empty[String, Long]
    def register(id: String, nowMs: Long): Unit = synchronized { beats(id) = nowMs }
    def heartbeat(id: String, nowMs: Long): Unit = synchronized { beats(id) = nowMs }
    def deregister(id: String): Unit = synchronized { beats -= id }
    def activeProcessors(nowMs: Long): Seq[String] = synchronized {
      beats.toSeq.collect { case (id, t) if nowMs - t <= ttlMs => id }.sorted
    }
  }

  /** One pool member's view of the distributed limiter.
    *
    * @param store        shared membership store
    * @param processorId  this member's id
    * @param min          global allowance at cold start (tokens/epoch)
    * @param max          global steady-state allowance
    * @param rampUpEpochs epochs to climb min→max (0 = start at max)
    * @param mode         climb behavior on success/failure
    * @param epochMs      epoch length (token refill period)
    * @param joinedAtMs   logical join time (starts this member's TTL)
    */
  final class PooledRateLimiter(store: SharedStore, processorId: String,
                                min: Long, max: Long, rampUpEpochs: Int,
                                mode: RateLimit.Mode = RateLimit.Relaxed,
                                epochMs: Long = 1000L,
                                joinedAtMs: Long = 0L) {
    require(min <= max && rampUpEpochs >= 0 && epochMs > 0)

    // Global allowance the pool has ramped to (max_ever_filled), derived
    // from the CLIMB COUNT — multiply-then-divide, so N fractional climbs
    // of (max-min)/rampUpEpochs never drift below the exact value the way
    // an accumulating sum does (six additions of 1/6 ≠ 1.0 in doubles).
    private var climbs = 0
    private def filled: Double =
      if (rampUpEpochs == 0) max.toDouble
      else min + (max - min).toDouble * math.min(climbs, rampUpEpochs) / rampUpEpochs
    private var epoch = Long.MinValue // current epoch index
    private var grantedThisEpoch = 0L // this member's draws in the epoch
    private var share = 0L            // this member's cap for the epoch

    store.register(processorId, joinedAtMs)

    private def rollover(nowMs: Long): Unit = {
      val e = nowMs / epochMs
      if (e != epoch) {
        if (epoch != Long.MinValue) {
          val climb = mode match {
            case RateLimit.OnlyIfUsed => grantedThisEpoch >= share
            case _                    => true // Relaxed/Scheduled/GoBackN climb per epoch
          }
          if (climb) climbs = math.min(climbs + 1, rampUpEpochs)
        }
        epoch = e
        grantedThisEpoch = 0
        val pool = math.max(store.activeProcessors(nowMs).size, 1)
        // floor division: the indivisible remainder is the reference's
        // floor_normalization — it stays undistributed this epoch.
        share = (filled / pool).toLong
      }
    }

    /** Draw up to `n` tokens for this epoch; returns the granted count
      * (0 when the member's share is exhausted — the caller skips or
      * shrinks the trigger, it never blocks a Spark task). */
    def acquire(n: Long, nowMs: Long): Long = synchronized {
      store.heartbeat(processorId, nowMs)
      rollover(nowMs)
      val grant = math.max(0L, math.min(n, share - grantedThisEpoch))
      grantedThisEpoch += grant
      grant
    }

    /** Return tokens drawn but not used (reference `deposit_unused`):
      * they become available to this member again within the epoch. */
    def depositUnused(n: Long): Unit = synchronized {
      grantedThisEpoch = math.max(0L, grantedThisEpoch - n)
    }

    /** Processing failed: GoBackN re-ramps the GLOBAL allowance from the
      * floor; other modes hold (Relaxed) or keep climbing (Scheduled). */
    def onFailure(): Unit = synchronized {
      if (mode == RateLimit.GoBackN && rampUpEpochs > 0) climbs = 0
    }

    /** Current global allowance (diagnostics / specs). */
    def globalAllowance: Double = synchronized(filled)

    /** Deregister from the pool (reference `shutdown()`). */
    def shutdown(): Unit = store.deregister(processorId)
  }
}
