package graft.streaming

/** Stdin-driven throttle pool member: runs a [[Throttle.PooledRateLimiter]]
  * against a [[Throttle.NetworkStore]] in its OWN JVM, so specs can prove
  * pool consensus between genuinely separate processes that share nothing
  * but the store's socket — the reference's Redis-backed multi-node shape
  * (`rust/numaflow-throttling/src/state/store/redis_store`, used across
  * pods). Deliberately Spark-free: only graft.streaming + the Scala
  * stdlib, so the child process classpath is `classes` + scala-library.
  *
  * Protocol (one command per line on stdin, one reply line on stdout):
  * `limiter <min> <max> <ramp> <mode> <epochMs> <joinedAtMs>` → `ok` ·
  * `acquire <n> <nowMs>` → granted count · `fail` → `ok` ·
  * `allowance` → double · `shutdown` → `ok` · `exit` → `bye`.
  */
object ThrottleMemberMain {
  def main(args: Array[String]): Unit = {
    val url = args(0)
    val id = args(1)
    val store = new Throttle.NetworkStore(url)
    var limiter: Throttle.PooledRateLimiter = null
    val out = System.out
    for (line <- scala.io.Source.stdin.getLines()) {
      val t = line.trim.split("\\s+")
      try t(0) match {
        case "limiter" =>
          val mode = t(4) match {
            case "gobackn"    => RateLimit.GoBackN
            case "scheduled"  => RateLimit.Scheduled
            case "onlyifused" => RateLimit.OnlyIfUsed
            case _            => RateLimit.Relaxed
          }
          limiter = new Throttle.PooledRateLimiter(store, id,
            min = t(1).toLong, max = t(2).toLong, rampUpEpochs = t(3).toInt,
            mode = mode, epochMs = t(5).toLong, joinedAtMs = t(6).toLong)
          out.println("ok")
        case "acquire"   => out.println(limiter.acquire(t(1).toLong, t(2).toLong))
        case "fail"      => limiter.onFailure(); out.println("ok")
        case "allowance" => out.println(limiter.globalAllowance)
        case "shutdown"  => limiter.shutdown(); out.println("ok")
        case "exit"      => out.println("bye"); out.flush(); return
        case other       => out.println(s"err:unknown command $other")
      } catch {
        case scala.util.control.NonFatal(e) => out.println(s"err:${e.getMessage}")
      }
      out.flush()
    }
  }
}
