package graft.streaming

import scala.collection.mutable.ArrayDeque

/** Autoscale ACTUATION (X6): the decision loop that turns the formulas in
  * [[Autoscale]] into executor-count requests, matching the reference
  * reconciler's cadence/lookback/cooldown shape
  * (`pkg/reconciler/vertex/scaling/scaling.go:160-173`: average pending
  * over a lookback window → desired replicas → bounded step → patch;
  * cadence and cooldowns from `const.go:189-195`). The reference actuates
  * by patching pod replicas; on Spark the same decision feeds
  * `SparkContext.requestTotalExecutors` — a real request on any
  * cluster-manager deployment, an OBSERVABLE no-op on local[n] (the
  * method returns false), which is exactly what the sandbox can verify:
  * the decision stream is deterministic from recorded pending/rate
  * traces, the transport is one line.
  *
  * Clock and actuator are injected so specs drive recorded traces through
  * real cooldown/lookback arithmetic without sleeping. */
final class AutoscaleController(
    conf: AutoscaleController.Conf,
    actuate: Int => Unit,
    clock: () => Long = System.currentTimeMillis _) {

  import AutoscaleController.Decision

  private val samples = ArrayDeque.empty[(Long, Long, Double)] // ts, pending, rate/replica
  @volatile private var current: Int = conf.initialReplicas
  // MinValue/2, not MinValue: the cooldown check subtracts this from the
  // clock, and `now - Long.MinValue` overflows negative — which would
  // gate the FIRST scale decision forever.
  @volatile private var lastScaleUpMs: Long = Long.MinValue / 2
  @volatile private var lastScaleDownMs: Long = Long.MinValue / 2
  private val log = ArrayDeque.empty[Decision]

  /** Requested replica count as of the last decision. */
  def replicas: Int = current

  /** Decision history (bounded; ops/spec introspection). */
  def decisions: Seq[Decision] = synchronized(log.toSeq)

  /** Record one (pending, ratePerReplica) sample, e.g. per micro-batch
    * from `GraftSource.pending` + `processedRowsPerSecond / replicas`. */
  def observe(pending: Long, ratePerReplica: Double): Unit = synchronized {
    val now = clock()
    samples += ((now, pending, ratePerReplica))
    val floor = now - conf.lookbackSeconds * 1000L
    while (samples.nonEmpty && samples.head._1 < floor) samples.removeHead()
  }

  /** One reconciler tick: average the lookback window, compute desired,
    * gate on the direction's cooldown, actuate on change. Returns the
    * replica count in force after the tick. */
  def decide(): Int = synchronized {
    val now = clock()
    // Prune HERE too, not only in observe(): if micro-batches stall (no
    // observe() calls) the tick must not keep acting on pre-stall samples
    // forever — an empty window means "no recent signal, hold".
    val floor = now - conf.lookbackSeconds * 1000L
    while (samples.nonEmpty && samples.head._1 < floor) samples.removeHead()
    if (samples.isEmpty) return current
    val avgPending = math.round(samples.map(_._2.toDouble).sum / samples.size)
    val avgRate = samples.map(_._3).sum / samples.size
    val desired = Autoscale.desiredSourceReplicas(
      math.max(current, 1), avgPending, avgRate,
      conf.targetProcessingSeconds, conf.min, conf.max, conf.maxStep)
    val granted =
      if (desired > current && now - lastScaleUpMs < conf.scaleUpCooldownSeconds * 1000L)
        current // still cooling from the last scale-up
      else if (desired < current && now - lastScaleDownMs < conf.scaleDownCooldownSeconds * 1000L)
        current
      else desired
    if (granted != current) {
      if (granted > current) lastScaleUpMs = now else lastScaleDownMs = now
      current = granted
      actuate(granted)
    }
    log += Decision(now, avgPending, avgRate, desired, granted)
    while (log.size > 256) log.removeHead()
    current
  }

  /** Run `decide()` on the reference cadence against live readers until
    * the returned handle is closed. Daemon thread; exceptions from the
    * readers/actuator are contained per tick. */
  def start(poll: () => (Long, Double)): AutoCloseable = {
    val exec = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      (r: Runnable) => { val t = new Thread(r, "graft-autoscale"); t.setDaemon(true); t })
    exec.scheduleAtFixedRate(new Runnable {
      def run(): Unit =
        try { val (p, r) = poll(); observe(p, r); decide(); () }
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[autoscale] tick failed: ${e.getMessage}") }
    }, conf.cadenceSeconds, conf.cadenceSeconds, java.util.concurrent.TimeUnit.SECONDS)
    () => { exec.shutdownNow(); () }
  }
}

object AutoscaleController {

  /** Reference defaults: target drain 20 s (`scale.go`), lookback 120 s,
    * scale-up cooldown 90 s / scale-down 120 s, tick every 30 s
    * (`const.go:189-195` family). */
  final case class Conf(
      initialReplicas: Int = 1,
      targetProcessingSeconds: Int = 20,
      min: Int = 0, max: Int = 50, maxStep: Int = 2,
      lookbackSeconds: Int = 120,
      scaleUpCooldownSeconds: Int = 90,
      scaleDownCooldownSeconds: Int = 120,
      cadenceSeconds: Int = 30)

  /** One reconciler tick's record: window averages, the formula's ask,
    * and what the cooldown gate let through. */
  final case class Decision(atMs: Long, avgPending: Long, avgRate: Double,
                            desired: Int, granted: Int)

  /** The Spark transport: ask the cluster manager for `n` executors.
    * Returns false (no-op) on local[n] — decisions remain observable
    * through [[AutoscaleController.decisions]]. */
  def sparkActuator(sc: org.apache.spark.SparkContext): Int => Unit =
    n => { sc.requestTotalExecutors(math.max(n, 0), 0, Map.empty); () }
}
