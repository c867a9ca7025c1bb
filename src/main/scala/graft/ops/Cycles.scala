package graft.ops

import org.apache.spark.sql.DataFrame

/** Cycles (SURVEY R4): the reference allows an edge back to self or an
  * ancestor for retry-loop topologies, with the explicit caveat that a
  * message may loop forever (numaflow `test/diamond-e2e/diamond_test.go:
  * 110,136` TestCycleToSelf/TestCycleBackward, `examples/10-cycle-to-self
  * .yaml`).
  *
  * Spark plans are DAGs, so a cycle becomes BOUNDED ITERATION — the same
  * shape every Spark iterative workload uses (GraphX/ML): drive the loop
  * from the driver, each pass a new plan over the previous pass's retry
  * set. In streaming the identical effect is a foreachBatch writer that
  * appends retry rows back into the source buffer (cycle-to-self via
  * [[graft.streaming.UdSource.MemoryGraftSource]] loopback); the bounded
  * batch form below is the oracle-checkable core.
  *
  * Scale notes: each iteration localizes to the (shrinking) retry subset;
  * results accumulate by lazy union. `maxIterations` caps plan depth —
  * beyond ~30 unions checkpoint/persist the accumulator to cut lineage.
  */
object Cycles {

  /** Run `step` until the retry set empties or `maxIterations` passes.
    *
    * @param init  rows entering the cycle vertex
    * @param step  one pass: returns (done, retry) — rows leaving the cycle
    *              and rows routed back over the cycle edge
    * @return (all done rows, rows still unresolved when the bound hit)
    */
  def boundedLoop(init: DataFrame, step: DataFrame => (DataFrame, DataFrame),
                  maxIterations: Int): (DataFrame, DataFrame) = {
    require(maxIterations >= 1)
    var pending = init
    var done: Option[DataFrame] = None
    var i = 0
    // isEmpty per round is the loop condition the reference lacks (it
    // loops on live traffic); each check is a cheap LIMIT-1 job.
    while (i < maxIterations && !pending.isEmpty) {
      val (d, retry) = step(pending)
      done = Some(done.fold(d)(_.unionByName(d)))
      pending = retry
      i += 1
    }
    (done.getOrElse(init.limit(0)), pending)
  }
}
