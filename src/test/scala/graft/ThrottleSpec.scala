package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{RateLimit, Throttle}
import graft.streaming.Throttle.{InMemoryStore, PooledRateLimiter}

/** Distributed rate-limiter pool (X5): share division, ramp-up slope,
  * GoBackN re-ramp, OnlyIfUsed gating, TTL rebalancing, deposit-back —
  * per numaflow rust/numaflow-throttling/src/{lib.rs,state.rs}. */
class ThrottleSpec extends AnyFunSuite {

  test("pool members split the global allowance; a graceful exit rebalances") {
    val store = new InMemoryStore()
    val a = new PooledRateLimiter(store, "a", min = 100, max = 100, rampUpEpochs = 0)
    val b = new PooledRateLimiter(store, "b", min = 100, max = 100, rampUpEpochs = 0)
    // epoch 0: two members -> 50 each; the pool never over-grants.
    assert(a.acquire(1000, nowMs = 0) === 50)
    assert(b.acquire(1000, nowMs = 0) === 50)
    assert(a.acquire(1, nowMs = 500) === 0) // share exhausted within epoch
    b.shutdown()
    // next epoch: survivor takes the full allowance.
    assert(a.acquire(1000, nowMs = 1000) === 100)
  }

  test("global allowance ramps min->max linearly over rampUpEpochs") {
    val store = new InMemoryStore()
    val l = new PooledRateLimiter(store, "p", min = 10, max = 20, rampUpEpochs = 5)
    // slope = 2/epoch: 10, 12, 14, 16, 18, 20, then clamps at max.
    assert((0 to 6).map(e => l.acquire(1000, e * 1000L)) ===
      Seq(10, 12, 14, 16, 18, 20, 20))
  }

  test("fractional slope accumulates (ramp 10->20 over 60 epochs)") {
    val store = new InMemoryStore()
    val l = new PooledRateLimiter(store, "p", min = 10, max = 20, rampUpEpochs = 60)
    // slope = 1/6 token/epoch: the integer floor first moves at epoch 6
    // (10 + 6·(1/6) = 11) — fractional climb never strands whole tokens.
    assert((0 to 6).map(e => l.acquire(1000, e * 1000L)) ===
      Seq(10, 10, 10, 10, 10, 10, 11))
  }

  test("GoBackN re-ramps from the floor on failure; Relaxed holds") {
    val store = new InMemoryStore()
    val g = new PooledRateLimiter(store, "g", min = 10, max = 20, rampUpEpochs = 5,
      mode = RateLimit.GoBackN)
    (0 to 3).foreach(e => g.acquire(1000, e * 1000L))
    assert(g.globalAllowance === 16.0)
    g.onFailure()
    assert(g.acquire(1000, 4000) === 12) // re-ramped: floor 10 + one climb

    val r = new PooledRateLimiter(store, "r", min = 10, max = 20, rampUpEpochs = 5,
      mode = RateLimit.Relaxed, joinedAtMs = 99000)
    (99 to 102).foreach(e => r.acquire(1000, e * 1000L))
    val before = r.globalAllowance
    r.onFailure() // Relaxed: failure holds, no reset
    assert(r.globalAllowance === before)
  }

  test("OnlyIfUsed climbs only when the previous grant was fully drawn") {
    val store = new InMemoryStore()
    val l = new PooledRateLimiter(store, "p", min = 10, max = 20, rampUpEpochs = 5,
      mode = RateLimit.OnlyIfUsed)
    assert(l.acquire(3, 0) === 3)        // leaves 7 of the 10 undrawn
    assert(l.acquire(1000, 1000) === 10) // no climb: last epoch under-used
    assert(l.acquire(1000, 2000) === 12) // climb: full share was drawn
  }

  test("a member that stops heartbeating ages out; survivor's share grows") {
    val store = new InMemoryStore(ttlMs = 3000)
    val a = new PooledRateLimiter(store, "a", min = 100, max = 100, rampUpEpochs = 0)
    new PooledRateLimiter(store, "dead", min = 100, max = 100, rampUpEpochs = 0)
    assert(a.acquire(1000, 0) === 50)      // both alive
    assert(a.acquire(1000, 2000) === 50)   // dead still within TTL
    assert(a.acquire(1000, 4000) === 100)  // dead aged out -> full share
  }

  test("deposited tokens return to the member within the epoch") {
    val store = new InMemoryStore()
    val l = new PooledRateLimiter(store, "p", min = 10, max = 10, rampUpEpochs = 0)
    assert(l.acquire(10, 0) === 10)
    assert(l.acquire(1, 10) === 0)
    l.depositUnused(4)
    assert(l.acquire(10, 20) === 4) // only the returned tokens re-issue
  }

  // ---- durable FileStore: same consensus semantics, out-of-process ------

  private def tmpStoreDir() =
    java.nio.file.Files.createTempDirectory("throttle-store")

  test("FileStore: two members with SEPARATE store instances reach consensus") {
    // each member binds its OWN FileStore over the shared directory —
    // the two-process shape (no shared JVM state, only the filesystem).
    val dir = tmpStoreDir()
    val a = new PooledRateLimiter(new Throttle.FileStore(dir), "a",
      min = 100, max = 100, rampUpEpochs = 0)
    val b = new PooledRateLimiter(new Throttle.FileStore(dir), "b",
      min = 100, max = 100, rampUpEpochs = 0)
    assert(a.acquire(1000, 0) === 50)
    assert(b.acquire(1000, 0) === 50)
    assert(a.acquire(1, 500) === 0) // share exhausted within epoch
    b.shutdown()
    assert(a.acquire(1000, 1000) === 100) // survivor takes the whole pool
  }

  test("FileStore: GoBackN re-ramp with a two-member pool across instances") {
    val dir = tmpStoreDir()
    val g = new PooledRateLimiter(new Throttle.FileStore(dir), "g",
      min = 10, max = 20, rampUpEpochs = 5, mode = RateLimit.GoBackN)
    val h = new PooledRateLimiter(new Throttle.FileStore(dir), "h",
      min = 10, max = 20, rampUpEpochs = 5, mode = RateLimit.GoBackN)
    (0 to 3).foreach { e => g.acquire(1000, e * 1000L); h.acquire(1000, e * 1000L) }
    assert(g.globalAllowance === 16.0)
    g.onFailure() // g re-ramps ITS view from the floor
    assert(g.acquire(1000, 4000) === 6)  // (10 + one climb of 2) / 2 members
    assert(h.acquire(1000, 4000) === 9)  // h unaffected: 18 / 2
  }

  // ---- network store: the Redis analog, members in SEPARATE JVMs -------

  /** A throttle member running in its own child JVM, driven over stdin
    * (see [[graft.streaming.ThrottleMemberMain]]). Shares NOTHING with
    * this JVM but the network store's socket. */
  private final class RemoteMember(url: String, id: String) extends AutoCloseable {
    // Child classpath derived from THIS JVM, not image paths: the compiled
    // classes dir comes from where ThrottleMemberMain itself was loaded,
    // the scala-library jar from where Predef lives — portable across
    // build layouts and jar directories.
    private def locationOf(c: Class[_]): String =
      new java.io.File(c.getProtectionDomain.getCodeSource.getLocation.toURI)
        .getAbsolutePath
    private val childCp = Seq(
      locationOf(graft.streaming.ThrottleMemberMain.getClass),
      locationOf(scala.Predef.getClass)
    ).distinct.mkString(java.io.File.pathSeparator)
    private val proc = new ProcessBuilder(
      "java", "-cp", childCp,
      "graft.streaming.ThrottleMemberMain", url, id)
      .redirectErrorStream(false)
      .redirectError(ProcessBuilder.Redirect.INHERIT)
      .start()
    private val toChild = new java.io.PrintWriter(proc.getOutputStream, true)
    private val fromChild = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))

    def cmd(line: String): String = {
      toChild.println(line)
      val resp = fromChild.readLine()
      assert(resp != null, s"child died answering: $line")
      assert(!resp.startsWith("err:"), s"child error for '$line': $resp")
      resp
    }
    override def close(): Unit = {
      try { toChild.println("exit"); toChild.flush() } finally {
        if (!proc.waitFor(5, java.util.concurrent.TimeUnit.SECONDS))
          proc.destroyForcibly()
      }
    }
  }

  test("NetworkStore: consensus between two JVM-separate members") {
    val server = new Throttle.NetworkStoreServer(port = 0)
    try {
      val remote = new RemoteMember(server.url, "b")
      try {
        // remote member joins the pool from its own process first
        assert(remote.cmd("limiter 100 100 0 relaxed 1000 0") === "ok")
        // local member sees it through the socket: 100 splits 50/50
        val a = new PooledRateLimiter(new Throttle.NetworkStore(server.url), "a",
          min = 100, max = 100, rampUpEpochs = 0)
        assert(a.acquire(1000, 0) === 50)
        assert(remote.cmd("acquire 1000 0") === "50")
        assert(a.acquire(1, 500) === 0) // pool never over-grants across JVMs
        // graceful remote exit rebalances the survivor to the full pool
        assert(remote.cmd("shutdown") === "ok")
        assert(a.acquire(1000, 1000) === 100)
      } finally remote.close()
    } finally server.close()
  }

  test("NetworkStore: GoBackN re-ramp with members in separate JVMs") {
    val server = new Throttle.NetworkStoreServer(port = 0)
    try {
      val remote = new RemoteMember(server.url, "h")
      try {
        assert(remote.cmd("limiter 10 20 5 gobackn 1000 0") === "ok")
        val g = new PooledRateLimiter(new Throttle.NetworkStore(server.url), "g",
          min = 10, max = 20, rampUpEpochs = 5, mode = RateLimit.GoBackN)
        (0 to 3).foreach { e =>
          g.acquire(1000, e * 1000L)
          remote.cmd(s"acquire 1000 ${e * 1000L}")
        }
        assert(g.globalAllowance === 16.0)
        g.onFailure() // local member re-ramps ITS view from the floor
        assert(g.acquire(1000, 4000) === 6)  // (10 + one climb of 2) / 2
        assert(remote.cmd("acquire 1000 4000") === "9") // remote holds: 18/2
      } finally remote.close()
    } finally server.close()
  }

  test("FileStore: TTL aging and restart survival") {
    val dir = tmpStoreDir()
    val a = new PooledRateLimiter(new Throttle.FileStore(dir, ttlMs = 3000), "a",
      min = 100, max = 100, rampUpEpochs = 0)
    new PooledRateLimiter(new Throttle.FileStore(dir, ttlMs = 3000), "dead",
      min = 100, max = 100, rampUpEpochs = 0)
    assert(a.acquire(1000, 0) === 50)     // both alive
    assert(a.acquire(1000, 4000) === 100) // dead aged out

    // restart: a NEW store instance over the same directory still sees
    // the membership a's heartbeats persisted (Redis-key durability).
    val restarted = new Throttle.FileStore(dir, ttlMs = 3000)
    assert(restarted.activeProcessors(4000) === Seq("a"))
    // ids needing filename-escaping round-trip unscathed
    restarted.register("weird/id:1", 4000)
    assert(restarted.activeProcessors(4000) === Seq("a", "weird/id:1"))
  }
}
