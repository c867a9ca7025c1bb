package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.AutoscaleController
import graft.streaming.AutoscaleController.Conf

/** Actuation loop (X6): recorded pending/rate traces → deterministic
  * decision stream with the reference reconciler's lookback averaging,
  * bounded steps, direction-specific cooldowns, and scale-to-zero.
  * Clock is injected — no sleeping. */
class AutoscaleControllerSpec extends SparkSpec {

  private def controller(conf: Conf) = {
    var now = 0L
    val acts = scala.collection.mutable.ArrayBuffer.empty[Int]
    val c = new AutoscaleController(conf, acts += _, () => now)
    (c, acts, (ms: Long) => { now += ms })
  }

  test("backlog growth scales up by at most maxStep per cooldown window") {
    val (c, acts, tick) = controller(Conf(initialReplicas = 1,
      targetProcessingSeconds = 10, maxStep = 2, scaleUpCooldownSeconds = 90))
    // 10k pending at 100 rows/s/replica: formula wants far more than 3.
    c.observe(10000, 100.0); tick(1000)
    assert(c.decide() === 3, "first tick: one bounded step up (1 -> 3)")
    // next tick inside the 90s cooldown: the ask persists, the gate holds
    c.observe(10000, 100.0); tick(1000)
    assert(c.decide() === 3, "cooldown must suppress consecutive ups")
    assert(c.decisions.last.desired === 5, "the formula still asks for more")
    // past the cooldown: the next bounded step lands
    tick(95_000); c.observe(10000, 100.0)
    assert(c.decide() === 5)
    assert(acts.toSeq === Seq(3, 5), "one actuation per granted change")
  }

  test("drained backlog scales down (its own cooldown), idle scales to zero") {
    val (c, acts, tick) = controller(Conf(initialReplicas = 4,
      lookbackSeconds = 10, scaleDownCooldownSeconds = 120, min = 0))
    // lookback trims old backlogged samples; the window sees a drain
    c.observe(0, 100.0); tick(1000)
    assert(c.decide() === 2, "drained: bounded step down (4 -> 2)")
    c.observe(0, 100.0); tick(1000)
    assert(c.decide() === 2, "scale-down cooldown holds")
    tick(125_000)
    // fully idle: pending 0 AND rate 0 -> scale to zero (reference's
    // scale-to-zero gate needs both)
    c.observe(0, 0.0); c.observe(0, 0.0)
    assert(c.decide() === 0)
    assert(acts.toSeq === Seq(2, 0))
  }

  test("lookback averages the window, not the last sample") {
    val (c, _, tick) = controller(Conf(initialReplicas = 2,
      targetProcessingSeconds = 10, lookbackSeconds = 60,
      scaleUpCooldownSeconds = 0, maxStep = 10, max = 50))
    // one spike in an otherwise-flat window must not drive the decision
    for (_ <- 1 to 9) { c.observe(0, 100.0); tick(1000) }
    c.observe(90000, 100.0); tick(1000) // spike sample
    // window avg pending = 9000 -> desired = ceil(9000/(10*100*2))*2... the
    // point is it is far below the spike-only answer
    val spikeOnly = graft.streaming.Autoscale.desiredSourceReplicas(
      2, 90000, 100.0, 10, 0, 50, 10)
    assert(c.decide() < spikeOnly,
      "averaging must damp a single-sample spike")
  }

  test("decision log records window averages and the gate's verdict") {
    val (c, _, tick) = controller(Conf(initialReplicas = 1,
      scaleUpCooldownSeconds = 0))
    c.observe(100, 10.0); tick(1000); c.observe(300, 30.0)
    c.decide()
    val d = c.decisions.last
    assert(d.avgPending === 200)
    assert(d.avgRate === 20.0)
    assert(d.granted === c.replicas)
  }

  test("spark actuator is an observable no-op on local[n]") {
    val act = AutoscaleController.sparkActuator(spark.sparkContext)
    act(5) // local scheduler backend: request returns false, nothing dies
    val (c, _, tick) = controller(Conf(initialReplicas = 1,
      scaleUpCooldownSeconds = 0))
    c.observe(10000, 10.0); tick(1000)
    c.decide()
    assert(c.decisions.nonEmpty) // the decision stream is the product
  }
}
