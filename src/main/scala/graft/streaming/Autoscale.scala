package graft.streaming

/** Autoscaling formulas (SURVEY X6): the reference's reconciler computes
  * desired replicas from pending count and processing rate for sources,
  * and from buffer availability for UDF/sink vertices (numaflow
  * `pkg/reconciler/vertex/scaling/scaling.go:160-173`; spec
  * `scale.go:48-90`; defaults `const.go:189-195`). Pod lifecycle is a
  * k8s-operator concern, but the FORMULAS are engine logic: on Spark the
  * same numbers drive dynamic-allocation hints / requested executor
  * counts, fed by `GraftSource.pending` (S10) and
  * `StreamingQueryProgress.processedRowsPerSecond`.
  */
object Autoscale {

  /** Source-vertex desired replicas: enough to drain `pending` within
    * `targetProcessingSeconds` at the observed per-replica rate —
    * `desired = replicas * (pending / (target * rate))`, clamped to
    * [min, max], change bounded by `maxStep` per decision (the
    * reference's ≤2-replicas-per-step), and scale-to-zero only when both
    * pending and rate are zero. */
  def desiredSourceReplicas(replicas: Int, pending: Long, ratePerReplica: Double,
                            targetProcessingSeconds: Int = 20,
                            min: Int = 0, max: Int = 50, maxStep: Int = 2): Int = {
    val desired =
      if (pending == 0 && ratePerReplica == 0) 0
      else if (ratePerReplica <= 0) replicas + maxStep // backlogged, no throughput
      else math.ceil(
        replicas * (pending.toDouble / (targetProcessingSeconds * ratePerReplica * replicas)))
        .toInt
    val stepped = math.max(replicas - maxStep, math.min(replicas + maxStep, desired))
    math.max(min, math.min(max, stepped))
  }

  /** Non-source desired replicas: keep input-buffer availability at
    * `targetAvailability` — scale up as the buffer fills
    * (`desired = replicas * usage / (1 - targetAvailability)` shape). */
  def desiredVertexReplicas(replicas: Int, bufferUsage: Double,
                            targetAvailability: Double = 0.5,
                            min: Int = 1, max: Int = 50, maxStep: Int = 2): Int = {
    require(bufferUsage >= 0 && bufferUsage <= 1)
    val desired = math.ceil(replicas * bufferUsage / (1 - targetAvailability)).toInt
    val stepped = math.max(replicas - maxStep, math.min(replicas + maxStep, desired))
    math.max(min, math.min(max, stepped))
  }
}
