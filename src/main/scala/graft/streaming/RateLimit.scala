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

  /** Ramp lookback modes, mirroring the reference's rate_limiter.go set. */
  sealed trait Mode extends Serializable
  /** Climb on success, hold on failure. */
  case object Relaxed extends Mode
  /** Climb on success, full re-ramp from the floor on failure. */
  case object GoBackN extends Mode
  /** Climb with every trigger (wall-schedule), failures included. */
  case object Scheduled extends Mode
  /** Climb only when the granted allowance was actually consumed —
    * an idle source never earns headroom it has not demonstrated. */
  case object OnlyIfUsed extends Mode

  /** Per-trigger admission allowance.
    *
    * @param min           allowance at cold start (units: rows/trigger)
    * @param max           steady-state allowance
    * @param rampUpBatches triggers to climb min→max linearly
    * @param mode          lookback behavior (default GoBackN)
    */
  final class RampUpLimiter(min: Long, max: Long, rampUpBatches: Int,
                            mode: Mode = GoBackN) extends Serializable {
    require(min <= max && rampUpBatches >= 0)
    @volatile private var step = 0

    def this(min: Long, max: Long, rampUpBatches: Int, goBackN: Boolean) =
      this(min, max, rampUpBatches, if (goBackN) GoBackN else Relaxed)

    /** Current per-trigger cap. */
    def cap: Long =
      if (rampUpBatches == 0) max
      else min + ((max - min) * math.min(step, rampUpBatches)) / rampUpBatches

    /** A trigger completed cleanly; `used` = rows actually admitted. */
    def onSuccess(used: Long = Long.MaxValue): Unit = synchronized {
      val climb = mode match {
        case OnlyIfUsed => used >= cap
        case _          => true
      }
      if (climb) step = math.min(step + 1, rampUpBatches)
    }

    /** A trigger failed. */
    def onFailure(): Unit = synchronized {
      mode match {
        case GoBackN   => step = 0
        case Scheduled => step = math.min(step + 1, rampUpBatches)
        case _         => ()
      }
    }
  }

  /** Registry so DSv2 options (strings) can reference live limiters. */
  private val limiters = new java.util.concurrent.ConcurrentHashMap[String, RampUpLimiter]()
  def register(name: String, l: RampUpLimiter): RampUpLimiter = { limiters.put(name, l); l }
  def get(name: String): Option[RampUpLimiter] = Option(limiters.get(name))
  def unregister(name: String): Unit = limiters.remove(name)
}
