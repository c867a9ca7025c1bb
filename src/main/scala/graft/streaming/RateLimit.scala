package graft.streaming

/** Rate limiting with ramp-up (SURVEY X5): the reference's token-bucket
  * config `{max, min, rampUpDuration}` with lookback modes, including
  * GoBackN — on processing failure the allowance drops back and re-ramps
  * (numaflow `pkg/apis/numaflow/v1alpha1/rate_limiter.go`,
  * `rust/numaflow-throttling/src/lib.rs:26-66`).
  *
  * Spark's static caps (`maxOffsetsPerTrigger` / `rowsPerSecond`) cover
  * the constant case; this limiter supplies the DYNAMIC per-trigger cap.
  * [[UdSource]] consults it through the `limiter` option via
  * admission control (latestOffset bounded by the cap), so ramp-up applies
  * at the true admission point, not by dropping already-read rows.
  */
object RateLimit {

  /** Per-trigger admission allowance.
    *
    * @param min           allowance at cold start (units: rows/trigger)
    * @param max           steady-state allowance
    * @param rampUpBatches triggers to climb min→max linearly
    * @param goBackN       on failure, fall back (N = full re-ramp from min;
    *                      false = stay at current allowance — "Relaxed")
    */
  final class RampUpLimiter(min: Long, max: Long, rampUpBatches: Int,
                            goBackN: Boolean = true) extends Serializable {
    require(min <= max && rampUpBatches >= 0)
    @volatile private var step = 0

    /** Current per-trigger cap. */
    def cap: Long =
      if (rampUpBatches == 0) max
      else min + ((max - min) * math.min(step, rampUpBatches)) / rampUpBatches

    /** A trigger completed cleanly: climb. */
    def onSuccess(): Unit = synchronized { step = math.min(step + 1, rampUpBatches) }

    /** A trigger failed: GoBackN re-ramps from the floor. */
    def onFailure(): Unit = synchronized { if (goBackN) step = 0 }
  }

  /** Registry so DSv2 options (strings) can reference live limiters. */
  private val limiters = new java.util.concurrent.ConcurrentHashMap[String, RampUpLimiter]()
  def register(name: String, l: RampUpLimiter): RampUpLimiter = { limiters.put(name, l); l }
  def get(name: String): Option[RampUpLimiter] = Option(limiters.get(name))
  def unregister(name: String): Unit = limiters.remove(name)
}
