package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.streaming.{Lifecycle, UdSource}
import graft.streaming.UdSource.MemoryGraftSource

/** Pause-WITH-DRAIN lifecycle (pipeline_types.go:444-493): intake stops
  * first, in-flight drains to the sinks, THEN the query stops; arrivals
  * during the pause buffer at the source and flow on resume; nothing
  * replays, nothing is lost. Complements the plain checkpoint
  * pause/resume spec (ConnectorsSpec X7). */
class DrainLifecycleSpec extends SparkSpec {
  import spark.implicits._

  test("pause drains exposed messages to the sink, buffers new ones, resumes cleanly") {
    val inner = new MemoryGraftSource(1)
    val gate = UdSource.register("spec-drain", new Lifecycle.GatedSource(inner))
    val ckpt = Files.createTempDirectory("drainckpt").toString
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    def startQuery() = UdSource.readStream(spark, "spec-drain")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        seen.synchronized { seen ++= b.select(col("value").cast("string")).as[String].collect() }; ()
      }
      .start()

    try {
      inner.append(Seq("k"), "d0".getBytes, ts("2024-01-01 00:00:01"))
      inner.append(Seq("k"), "d1".getBytes, ts("2024-01-01 00:00:02"))
      val q1 = startQuery()

      // Drain pause: everything exposed before the gate closed must be in
      // the sink when pauseWithDrain returns true.
      val clean = Lifecycle.pauseWithDrain(q1, gate, drainTimeoutMs = 30000)
      assert(clean, "drain must complete within the grace period")
      assert(!q1.isActive)
      assert(seen.synchronized(seen.sorted.toSeq) === Seq("d0", "d1"))

      // Paused: producers keep appending; the engine sees nothing (the
      // reference's scaled-to-zero source with the broker accumulating).
      inner.append(Seq("k"), "d2".getBytes, ts("2024-01-01 00:00:03"))
      assert(gate.latestOffset(0) === 2L, "closed gate must not expose new offsets")
      assert(inner.latestOffset(0) === 3L, "the arrival buffers at the source")

      // Resume: reopen + restart from the checkpoint.
      Lifecycle.resume(gate)
      val q2 = startQuery()
      try {
        q2.processAllAvailable()
        assert(seen.synchronized(seen.sorted.toSeq) === Seq("d0", "d1", "d2"),
          "no replay of drained messages, no loss of paused-time arrivals")
      } finally q2.stop()
    } finally UdSource.unregister("spec-drain")
  }

  test("drain deadline forces an undrained stop; checkpoint replays the remainder") {
    val inner = new MemoryGraftSource(1)
    val gate = UdSource.register("spec-drain2", new Lifecycle.GatedSource(inner))
    val ckpt = Files.createTempDirectory("drainckpt2").toString
    val gateOpenForBatch = new java.util.concurrent.atomic.AtomicBoolean(true)
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    def startQuery(stall: Boolean) = UdSource.readStream(spark, "spec-drain2")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        if (stall && !gateOpenForBatch.get) Thread.sleep(60000)
        seen.synchronized { seen ++= b.select(col("value").cast("string")).as[String].collect() }; ()
      }
      .start()

    try {
      val q1 = startQuery(stall = true)
      // ensure the query is up before making the sink stall
      q1.processAllAvailable()
      gateOpenForBatch.set(false)
      inner.append(Seq("k"), "s0".getBytes, ts("2024-01-01 00:00:01"))
      // the batch carrying s0 stalls in the sink: the drain deadline hits
      val clean = Lifecycle.pauseWithDrain(q1, gate, drainTimeoutMs = 1500)
      assert(!clean, "an in-flight batch slower than the grace period is an unclean pause")
      assert(!q1.isActive)

      // resume: the undrained message replays from the checkpoint (the
      // reference's at-least-once guarantee after a forced pause)
      Lifecycle.resume(gate)
      gateOpenForBatch.set(true)
      val q2 = startQuery(stall = false)
      try {
        q2.processAllAvailable()
        assert(seen.synchronized(seen.toSeq).contains("s0"))
      } finally q2.stop()
    } finally UdSource.unregister("spec-drain2")
  }
}
