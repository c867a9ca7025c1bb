package graft

import java.sql.Timestamp

import graft.streaming.IdleSource.IdleHeartbeatSource
import graft.streaming.UdSource
import graft.streaming.UdSource.MemoryGraftSource

/** WM5/WM6 at the source: data-derived idle heartbeats (replay-safe —
  * event time advances from the max OBSERVED data time, never wall
  * clock). Driven with a fake clock, no timing sleeps. */
class IdleHeartbeatSpec extends SparkSpec {

  private def rec(src: MemoryGraftSource, t: String): Unit =
    src.append(Seq("k"), "v".getBytes, ts(t))

  private def drain(s: UdSource.GraftSource, p: Int, from: Long): Seq[UdSource.SourceRecord] = {
    val until = s.latestOffset(p)
    s.read(p, from, until).toSeq
  }

  test("idle partition emits heartbeats from max data event time + increment") {
    var now = 0L
    val inner = new MemoryGraftSource()
    val idle = new IdleHeartbeatSource(inner, thresholdMs = 1000,
      stepIntervalMs = 500, incrementByMs = 250, clock = () => now)

    rec(inner, "2020-01-01 00:00:10")
    rec(inner, "2020-01-01 00:00:05") // out of order; max stays at :10
    val batch1 = drain(idle, 0, 0)
    assert(batch1.map(_.offset) === Seq(0L, 1L))
    assert(batch1.forall(r => !r.headers.contains("__hb")))

    // not idle long enough: no heartbeat yet.
    now = 900
    assert(idle.latestOffset(0) === 2L)

    // idle past threshold: one heartbeat, event time = :10 + 250 ms.
    now = 1100
    val hb1 = drain(idle, 0, 2)
    assert(hb1.map(_.offset) === Seq(2L))
    assert(hb1.head.headers.get("__hb").contains("true"))
    assert(hb1.head.eventTime === new Timestamp(ts("2020-01-01 00:00:10").getTime + 250))
    assert(hb1.head.value.isEmpty)

    // within stepInterval: no second heartbeat.
    now = 1400
    assert(idle.latestOffset(0) === 3L)
    // past stepInterval: next heartbeat advances by another increment.
    now = 1700
    val hb2 = drain(idle, 0, 3)
    assert(hb2.head.eventTime === new Timestamp(ts("2020-01-01 00:00:10").getTime + 500))

    // new data ends the idle stretch and keeps the outer offset mapping.
    rec(inner, "2020-01-01 00:00:20")
    now = 1800
    val batch2 = drain(idle, 0, 4)
    assert(batch2.map(_.offset) === Seq(4L))
    assert(batch2.head.eventTime === ts("2020-01-01 00:00:20"))
    // heartbeat resumes from the NEW max.
    now = 3000
    val hb3 = drain(idle, 0, 5)
    assert(hb3.head.eventTime === new Timestamp(ts("2020-01-01 00:00:20").getTime + 250))
  }

  test("no heartbeats before the first data (nothing to advance from)") {
    var now = 0L
    val inner = new MemoryGraftSource()
    val idle = new IdleHeartbeatSource(inner, 100, 100, 100, () => now)
    now = 100000
    assert(idle.latestOffset(0) === 0L)
  }

  test("ack maps outer offsets to inner data only; heartbeats never ack inner") {
    var now = 0L
    val inner = new MemoryGraftSource()
    val idle = new IdleHeartbeatSource(inner, 1000, 500, 250, () => now)
    rec(inner, "2020-01-01 00:00:10")
    drain(idle, 0, 0)                    // data seg [0,1)
    now = 1100; drain(idle, 0, 1)        // hb at outer 1
    rec(inner, "2020-01-01 00:00:20")
    now = 1200; drain(idle, 0, 2)        // data seg -> outer 2

    idle.ack(0, 2)                       // covers data(1) + hb(1)
    assert(inner.ackedUpTo(0) === 1L)    // only the first data record
    idle.ack(0, 3)
    assert(inner.ackedUpTo(0) === 2L)    // both data records, hb skipped
    assert(idle.pending === 0L)          // heartbeats are not backlog
  }

  test("e2e: heartbeats alone close an event-time window (no new data)") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._

    val inner = new MemoryGraftSource()
    // idle immediately, one heartbeat per 50ms poll, +30s event time each.
    val idle = new IdleHeartbeatSource(inner, thresholdMs = 0,
      stepIntervalMs = 50, incrementByMs = 30000)
    UdSource.register("idle-e2e", idle)
    inner.append(Seq("k"), "a".getBytes, ts("2024-01-01 00:00:10"))
    inner.append(Seq("k"), "b".getBytes, ts("2024-01-01 00:00:20"))

    val stream = UdSource.readStream(spark, "idle-e2e")
      .withWatermark("eventTime", "0 seconds")
    val agg = graft.streaming.IdleSource.dropHeartbeatRecords(stream)
      .groupBy(window(col("eventTime"), "1 minute")).count()
    val q = agg.writeStream.format("memory").queryName("idle_win")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("idlee2e").toString)
      .trigger(Trigger.ProcessingTime(50))
      .start()
    try {
      // append mode emits [00:00, 00:01) only once the watermark passes
      // 00:01:00 — which, with no further data, only heartbeats can do.
      val deadline = System.currentTimeMillis() + 30000
      var rows = Seq.empty[(java.sql.Timestamp, Long)]
      while (rows.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        rows = spark.table("idle_win")
          .select(col("window.start"), col("count"))
          .as[(java.sql.Timestamp, Long)].collect().toSeq
      }
      assert(rows === Seq((ts("2024-01-01 00:00:00"), 2L)),
        "window must close from heartbeat watermark advancement alone")
    } finally { q.stop(); UdSource.unregister("idle-e2e") }
  }

  test("re-read of a committed range replays the identical interleaving") {
    var now = 0L
    val inner = new MemoryGraftSource()
    val idle = new IdleHeartbeatSource(inner, 1000, 500, 250, () => now)
    rec(inner, "2020-01-01 00:00:10")
    drain(idle, 0, 0)
    now = 1100; idle.latestOffset(0)
    rec(inner, "2020-01-01 00:00:20")
    now = 1200; idle.latestOffset(0)

    val all1 = idle.read(0, 0, 3).toSeq
    val all2 = idle.read(0, 0, 3).toSeq // recovery replay
    assert(all1.map(r => (r.offset, r.eventTime, r.headers.get("__hb"))) ===
      all2.map(r => (r.offset, r.eventTime, r.headers.get("__hb"))))
    assert(all1.map(_.offset) === Seq(0L, 1L, 2L))
  }
}
