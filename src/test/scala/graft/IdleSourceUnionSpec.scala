package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.IdleSource

/** Idle-watermark for BUILT-IN sources via the heartbeat union (SURVEY
  * §7.2, reference `pipeline_types.go:626-665`): Spark's combined
  * watermark over a fan-in is the MIN across the input streams, so one
  * wholly idle branch (an idle Kafka topic, a quiet HTTP source) stalls
  * every windowed reduce downstream — the exact failure the reference's
  * idle-source config exists for. The union mechanism rides tick rows
  * through the idle branch's `withWatermark` and filters them after.
  *
  * These specs drive the tick stream from a MemoryStream (deterministic;
  * production uses the rate-source wrapper `IdleSource.withHeartbeats` /
  * `Kafka.sourceWithIdleWm`, same code path via `withHeartbeatStream`).
  */
class IdleSourceUnionSpec extends SparkSpec {
  import spark.implicits._

  private def aggregated(unioned: org.apache.spark.sql.DataFrame) =
    unioned
      .groupBy(window(col("ts"), "60 seconds"), col("key"))
      .agg(sum("value").as("total"))
      .select(col("window.start").as("w_start"), col("key"), col("total"))

  test("NEGATIVE CONTROL: a silent fan-in branch stalls window close") {
    implicit val ctx = spark.sqlContext
    val active = MemoryStream[(Timestamp, String, Long)]
    val silent = MemoryStream[(Timestamp, String, Long)]
    val unioned = active.toDF().toDF("ts", "key", "value")
      .withWatermark("ts", "0 seconds")
      .unionByName(silent.toDF().toDF("ts", "key", "value")
        .withWatermark("ts", "0 seconds"))

    val q = aggregated(unioned).writeStream.format("memory")
      .queryName("idle_stall").outputMode("append").start()
    try {
      active.addData((ts("2024-01-01 00:00:10"), "k", 5L))
      q.processAllAvailable()
      // far-ahead row would close [00:00,01:00) if this branch were alone
      active.addData((ts("2024-01-01 00:10:00"), "k", 1L))
      q.processAllAvailable()
      q.processAllAvailable()
      // min(active_wm=00:10, silent_wm=epoch) = epoch -> nothing closes
      assert(spark.table("idle_stall").count() === 0,
        "silent branch must stall the min watermark (if this fails, " +
          "Spark's fan-in policy changed and the heartbeat union is moot)")
    } finally q.stop()
  }

  test("heartbeat union on the idle branch closes the window; ticks never pollute") {
    implicit val ctx = spark.sqlContext
    val active = MemoryStream[(Timestamp, String, Long)]
    val silent = MemoryStream[(Timestamp, String, Long)]
    val ticks = MemoryStream[Timestamp]

    val idleBranch = IdleSource.dropHeartbeats(
      IdleSource.withHeartbeatStream(
        silent.toDF().toDF("ts", "key", "value"),
        ticks.toDF().toDF("ts"), "ts")
        .withWatermark("ts", "0 seconds"),
      "ts")
    val unioned = active.toDF().toDF("ts", "key", "value")
      .withWatermark("ts", "0 seconds")
      .unionByName(idleBranch)

    val q = aggregated(unioned).writeStream.format("memory")
      .queryName("idle_hb").outputMode("append").start()
    try {
      active.addData(
        (ts("2024-01-01 00:00:10"), "k", 5L),
        (ts("2024-01-01 00:00:20"), "k", 7L))
      ticks.addData(ts("2024-01-01 00:00:30"))
      q.processAllAvailable()
      // both branches advance past the window end: active via data,
      // the SILENT branch via a tick row alone
      active.addData((ts("2024-01-01 00:10:00"), "k", 1L))
      ticks.addData(ts("2024-01-01 00:10:00"))
      q.processAllAvailable()
      q.processAllAvailable()

      val rows = spark.table("idle_hb")
        .as[(Timestamp, String, Long)].collect()
      val byWin = rows.map { case (w, k, v) => (w, k) -> v }.toMap
      assert(byWin.get((ts("2024-01-01 00:00:00"), "k")).contains(12L),
        s"window must close via the tick-advanced idle branch: ${rows.toSeq}")
      // tick rows carry null keys/values — none may reach the aggregate
      assert(rows.forall(_._2 != null), s"heartbeat row leaked: ${rows.toSeq}")
    } finally q.stop()
  }

  test("PUSHDOWN GUARD: the drop filter stays above the watermark node") {
    // The whole mechanism dies silently if `dropHeartbeats`'s predicate
    // gets pushed below EventTimeWatermark (ticks filtered before their
    // event times feed the watermark stats). Assert the optimized plan
    // order on the STREAMING plan (batch plans drop the watermark node
    // entirely — EliminateEventTimeWatermark — so a batch analog can't
    // witness the ordering).
    implicit val ctx = spark.sqlContext
    val data = MemoryStream[(Timestamp, String, Long)]
    val ticksIn = MemoryStream[Timestamp]
    val analyzed = IdleSource.dropHeartbeats(
      IdleSource.withHeartbeatStream(
        data.toDF().toDF("ts", "key", "value"),
        ticksIn.toDF().toDF("ts"), "ts")
        .withWatermark("ts", "0 seconds"),
      "ts").queryExecution.analyzed
    // `optimizedPlan` runs the batch-unsupported check on streaming
    // plans; run the optimizer directly — it applies the same
    // PushPredicateThroughNonJoin this guard is about.
    val plan = spark.sessionState.optimizer.execute(analyzed)

    import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
    def hasHbFilterAbove(p: LogicalPlan): Boolean = p match {
      case f: Filter if f.condition.references.exists(_.name == IdleSource.HeartbeatCol) =>
        // found the drop filter: the watermark node must be BELOW it
        f.child.collectFirst {
          case w if w.nodeName.contains("EventTimeWatermark") => w
        }.nonEmpty
      case _ => p.children.exists(hasHbFilterAbove)
    }
    assert(hasHbFilterAbove(plan),
      s"__hb filter must sit above EventTimeWatermark:\n$plan")
  }
}
