package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.model.Pipeline.{Fixed, GroupBySpec}
import graft.ops.{Cycles, Dedup, Transform}
import graft.streaming.{Compiler, RateLimit, SideInputs, StatusApi, UdSource}
import graft.streaming.UdSource.MemoryGraftSource

/** Cross-cutting data-plane semantics (SURVEY §2.8 + W7 + T2 + R4),
  * mirroring the reference's functional e2e scenarios: streaming dedup,
  * early-firing reduce, side-input refresh, late marking, ordered mode,
  * ramp-up rate limiting, the daemon status API, and bounded cycles. */
class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  test("X2: streaming dedup by id within the watermark (replayed duplicate)") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Long)]
    val deduped = Dedup.byId(
      in.toDF().toDF("ts", "id", "value").withWatermark("ts", "10 seconds"),
      Seq("id"))

    val q = deduped.writeStream.format("memory").queryName("x2_out")
      .outputMode("append").start()
    try {
      in.addData((ts("2024-01-01 00:00:01"), "a", 1L), (ts("2024-01-01 00:00:02"), "b", 2L))
      q.processAllAvailable()
      // ISB redelivery analog: same id arrives again in a later batch
      in.addData((ts("2024-01-01 00:00:01"), "a", 1L), (ts("2024-01-01 00:00:03"), "c", 3L))
      q.processAllAvailable()
      val ids = spark.table("x2_out").select("id").as[String].collect().sorted
      assert(ids.toSeq === Seq("a", "b", "c")) // duplicate "a" suppressed
    } finally q.stop()
  }

  test("W7: streaming:true fires early partials (update mode before close)") {
    implicit val ctx = spark.sqlContext
    val gb = GroupBySpec(Fixed("60 seconds", streaming = true), Seq("key"),
      Seq(sum(col("value")).as("total")))
    assert(Compiler.outputMode(gb) === "update")
    assert(Compiler.outputMode(gb.copy(window = Fixed("60 seconds"))) === "append")

    val in = MemoryStream[(Timestamp, String, Long)]
    val agg = in.toDF().toDF("ts", "key", "value")
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "60 seconds"), col("key"))
      .agg(sum("value").as("total"))
      .select(col("window.start").as("w_start"), col("key"), col("total"))

    val q = agg.writeStream.format("memory").queryName("w7_out")
      .outputMode(Compiler.outputMode(gb)).start()
    try {
      in.addData((ts("2024-01-01 00:00:10"), "k", 1L), (ts("2024-01-01 00:00:20"), "k", 2L))
      q.processAllAvailable()
      // the window [00:00,01:00) is NOT closed (wm ~ 00:00:10) yet the
      // partial total=3 must already be emitted — the early-firing contract
      val partial = spark.table("w7_out").select("total").as[Long].collect()
      assert(partial.contains(3L))

      in.addData((ts("2024-01-01 00:00:30"), "k", 4L))
      q.processAllAvailable()
      val updated = spark.table("w7_out").select("total").as[Long].collect()
      assert(updated.contains(7L)) // second partial for the same window
    } finally q.stop()
  }

  test("X4: side input refreshes between micro-batches and reaches the batch body") {
    @volatile var lookup = Map("k" -> "v1")
    val si = new SideInputs.SideInput[Map[String, String]](() => lookup)
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]

    val writer = SideInputs.withSideInput(si) { (batch, _, value) =>
      val k = batch.select("key").as[String].collect().head
      seen += value(k)
    }
    writer(Seq("k").toDF("key"), 0L)
    lookup = Map("k" -> "v2") // the "cron" recompute
    writer(Seq("k").toDF("key"), 1L)

    assert(seen.toSeq === Seq("v1", "v2"))
    assert(si.refreshCount === 2)
  }

  test("T2: late marker flags rows below max-seen-event-time minus delay") {
    // mark → action → commit: the batch max rides the action's own pass
    // as an observation (no separate agg().collect() job).
    val marker = new Transform.LateMarker("ts", maxDelayMs = 10000)
    val b1 = Seq((ts("2024-01-01 00:01:00"), "x")).toDF("ts", "v")
    // first batch: no watermark yet, nothing late
    assert(marker.mark(b1).where(col("is_late")).count() === 0)
    marker.commit()

    // second batch: wm = 00:01:00 - 10s = 00:00:50; one row below it
    val b2 = Seq(
      (ts("2024-01-01 00:00:40"), "late"),
      (ts("2024-01-01 00:00:55"), "in-grace"),
      (ts("2024-01-01 00:02:00"), "fresh")).toDF("ts", "v")
    val flagged = marker.mark(b2).select("v", "is_late").as[(String, Boolean)].collect().toMap
    marker.commit()
    assert(flagged === Map("late" -> true, "in-grace" -> false, "fresh" -> false))

    // an empty batch commits without advancing (or hanging on) the state
    val b3 = spark.emptyDataFrame
      .withColumn("ts", lit(null).cast("timestamp")).withColumn("v", lit(""))
      .where(lit(false))
    assert(marker.mark(b3.select("ts", "v")).count() === 0)
    marker.commit()
    val b4 = Seq((ts("2024-01-01 00:00:40"), "still-late")).toDF("ts", "v")
    val f4 = marker.mark(b4).select("is_late").as[Boolean].collect()
    marker.commit()
    assert(f4 === Array(true), "watermark survived the empty batch")
  }

  test("T2: commit() is bounded when the marked frame's action never ran") {
    val marker = new Transform.LateMarker("ts", maxDelayMs = 10000, commitTimeoutMs = 300)
    val b1 = Seq((ts("2024-01-01 00:01:00"), "x")).toDF("ts", "v")
    marker.mark(b1) // mark, but skip the action (the `if (!batch.isEmpty)` trap)
    val t0 = System.nanoTime()
    assert(!marker.commit(), "no action ran, so the observation never fired")
    val waitedMs = (System.nanoTime() - t0) / 1000000L
    assert(waitedMs < 5000, s"commit() must time out promptly, waited ${waitedMs}ms")

    // state unchanged: the next batch still sees no watermark → nothing late
    val b2 = Seq((ts("2023-01-01 00:00:00"), "ancient")).toDF("ts", "v")
    assert(marker.mark(b2).where(col("is_late")).count() === 0)
    marker.commit()
  }

  test("X3: ordered mode pins keys to partitions in arrival order") {
    val df = Seq(
      ("k1", 2L, "b"), ("k2", 1L, "x"), ("k1", 1L, "a"),
      ("k2", 2L, "y"), ("k1", 3L, "c"))
      .toDF("key", "arrival", "v")
    val ordered = Transform.ordered(df, Seq(col("key")), col("arrival"), numPartitions = 4)

    // within every physical partition, arrival order must be monotonic and
    // each key must live in exactly one partition
    val perPart = ordered.select("key", "arrival")
      .as[(String, Long)]
      .mapPartitions(it => Iterator(it.toSeq)).collect().filter(_.nonEmpty)
    perPart.foreach { rows =>
      assert(rows.map(_._2) === rows.map(_._2).sorted)
    }
    val partsPerKey = perPart.zipWithIndex
      .flatMap { case (rows, i) => rows.map(r => (r._1, i)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    assert(partsPerKey.values.forall(_ == 1))
  }

  test("X5: ramp-up limiter caps admission per trigger, climbing to max") {
    val src = UdSource.register("x5-mem", new MemoryGraftSource(1))
    (0 until 12).foreach(i =>
      src.append(Seq("k"), s"m$i".getBytes, ts(s"2024-01-01 00:00:0${i % 10}")))
    val lim = RateLimit.register("x5-lim",
      new RateLimit.RampUpLimiter(min = 2, max = 8, rampUpBatches = 2))
    assert(lim.cap === 2)

    val q = UdSource.readStream(spark, "x5-mem", limiter = Some("x5-lim"))
      .writeStream.format("memory").queryName("x5_out")
      .option("checkpointLocation", Files.createTempDirectory("x5").toString)
      .start()
    try {
      q.processAllAvailable()
      // admission: batch1 <= 2 rows, then 5 (cap (2+8)/2), then 8 → all 12
      assert(spark.table("x5_out").count() === 12)
      assert(lim.cap === 8) // ramp completed
      // GoBackN: a failure re-ramps from the floor
      lim.onFailure()
      assert(lim.cap === 2)
    } finally { q.stop(); UdSource.unregister("x5-mem"); RateLimit.unregister("x5-lim") }
  }

  test("X5 modes: Scheduled climbs through failures; OnlyIfUsed needs demand") {
    import RateLimit._
    // Scheduled: wall-schedule ramp — failures advance it too.
    val sched = new RampUpLimiter(2, 8, rampUpBatches = 2, mode = Scheduled)
    sched.onFailure(); assert(sched.cap === 5)
    sched.onFailure(); assert(sched.cap === 8)
    // OnlyIfUsed: an idle trigger (nothing admitted) earns no headroom.
    val used = new RampUpLimiter(2, 8, rampUpBatches = 2, mode = OnlyIfUsed)
    used.onSuccess(used = 0); assert(used.cap === 2)   // idle: no climb
    used.onSuccess(used = 2); assert(used.cap === 5)   // full consumption
    used.onSuccess(used = 3); assert(used.cap === 5)   // partial: no climb
    used.onSuccess(used = 5); assert(used.cap === 8)
    used.onFailure(); assert(used.cap === 8)           // no fall-back in this mode
  }

  test("X9: status endpoint serves query progress, watermarks, pending") {
    implicit val ctx = spark.sqlContext
    val api = new StatusApi(port = 0)
    val in = MemoryStream[(Timestamp, Long)]
    val q = api.track("p1", in.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "60 seconds")).agg(sum("v").as("s"))
      .writeStream.format("memory").queryName("x9_out").outputMode("update").start())
    val src = new MemoryGraftSource(1)
    src.append(Seq("k"), "m".getBytes, ts("2024-01-01 00:00:00"))
    api.trackSource("src1", src)
    try {
      in.addData((ts("2024-01-01 00:01:00"), 5L))
      q.processAllAvailable()
      val client = HttpClient.newHttpClient()
      def getJson(path: String): String =
        client.send(HttpRequest.newBuilder(URI.create(s"${api.url}$path")).GET().build(),
          HttpResponse.BodyHandlers.ofString()).body()

      val status = getJson("/status")
      assert(status.contains("\"name\":\"p1\"") && status.contains("\"active\":true"))
      assert(status.contains("numInputRows")) // full lastProgress embedded
      // watermark propagates on the no-data follow-up batch — poll briefly
      val deadline = System.currentTimeMillis() + 10000
      var wms = getJson("/watermarks")
      while (!wms.contains("2024-01-01T00:00:50") &&
             System.currentTimeMillis() < deadline) {
        Thread.sleep(100); wms = getJson("/watermarks")
      }
      assert(wms.contains("\"p1\":\"2024-01-01T00:00:50")) // 00:01:00 - 10s
      assert(getJson("/pending") === "{\"src1\":1}")
      // daemon parity: /buffers (BufferInfo) and /errors (ContainerError)
      val bounded = new MemoryGraftSource(1, maxLength = 4)
      bounded.append(Seq("k"), "m".getBytes, ts("2024-01-01 00:00:00"))
      api.trackSource("src2", bounded)
      val bufs = getJson("/buffers")
      assert(bufs.contains("\"bufferName\":\"src1\"") &&
        bufs.contains("\"bufferLength\":null")) // unbounded source
      assert(bufs.contains("\"bufferName\":\"src2\"") &&
        bufs.contains("\"bufferLength\":4") &&
        bufs.contains("\"bufferUsage\":0.25") &&
        bufs.contains("\"isFull\":false"))
      assert(getJson("/errors") === "[]")
      api.reportError("udf-vertex", "UDF_ERROR", "boom at row 7")
      val errs = getJson("/errors")
      assert(errs.contains("\"vertex\":\"udf-vertex\"") &&
        errs.contains("\"code\":\"UDF_ERROR\"") &&
        errs.contains("\"message\":\"boom at row 7\""))
      // daemon rater parity: /rates computes 1m/5m rates from the
      // retained progress history; the row just processed is in-window.
      // This query is seconds old, so BOTH window denominators clamp to
      // the covered history span: the 5m rate must equal the 1m rate, not
      // be 5x smaller (the un-clamped form understates young queries).
      val rates = getJson("/rates")
      assert(rates.contains("\"historyCap\":"), rates)
      assert(rates.contains("\"p1\":{\"1m\":"), rates)
      val r1m = "\"1m\":([0-9.E-]+)".r.findFirstMatchIn(rates).get.group(1).toDouble
      val r5m = "\"5m\":([0-9.E-]+)".r.findFirstMatchIn(rates).get.group(1).toDouble
      assert(r1m > 0.0, s"1m rate must see the processed row: $rates")
      assert(math.abs(r1m - r5m) < 1e-9,
        s"query younger than both windows: clamped rates must agree: $rates")
    } finally { q.stop(); api.close() }
  }

  test("X8: header/metadata columns propagate through routing and map stages") {
    import graft.ops.Routing
    // NumaMessage-shaped frame: headers ride alongside payload columns
    val df = Seq(
      (Seq("k1"), Seq("even"), 10L, Map("src" -> "http", "x-delivery-count" -> "2")),
      (Seq("k2"), Seq("odd"), 11L, Map("src" -> "kafka")))
      .toDF("keys", "tags", "value", "headers")
    val routed = Routing.route(df, Map(
      "even" -> Some(Routing.TagCondition(Seq("even"))),
      "odd" -> Some(Routing.TagCondition(Seq("odd")))))
    // a map stage transforms the payload; metadata columns pass through
    val out = routed("even").withColumn("value", col("value") * 2)
    val row = out.select("headers", "value")
      .as[(Map[String, String], Long)].collect().head
    assert(row._2 === 20L)
    assert(row._1 === Map("src" -> "http", "x-delivery-count" -> "2"))
    // the reference's sink retry_count exposure = the delivery-count header
    assert(row._1("x-delivery-count") === "2")
  }

  test("X6: autoscaling formulas track pending/rate and buffer usage") {
    import graft.streaming.Autoscale._
    // drain 2000 pending in 20s at 10 rows/s/replica → needs 10, step-capped
    assert(desiredSourceReplicas(replicas = 8, pending = 2000, ratePerReplica = 10) === 10)
    // caught up → scale down one step at a time
    assert(desiredSourceReplicas(replicas = 8, pending = 0, ratePerReplica = 10) === 6)
    // scale-to-zero only when truly idle
    assert(desiredSourceReplicas(replicas = 1, pending = 0, ratePerReplica = 0) === 0)
    // backlogged with zero throughput → step up
    assert(desiredSourceReplicas(replicas = 2, pending = 500, ratePerReplica = 0) === 4)
    // buffer half-used at target availability 0.5 → steady state
    assert(desiredVertexReplicas(replicas = 4, bufferUsage = 0.5) === 4)
    // buffer filling → scale up (step-capped)
    assert(desiredVertexReplicas(replicas = 4, bufferUsage = 0.9) === 6)
    // buffer draining → scale down
    assert(desiredVertexReplicas(replicas = 4, bufferUsage = 0.1) === 2)
  }

  test("W9: windowed-reduce state survives a restart (no loss, no double count)") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val ckpt = Files.createTempDirectory("w9ckpt").toString
    val outDir = Files.createTempDirectory("w9out").toString
    // memory sink cannot recover from a checkpoint; the file sink can —
    // and is what a real pipeline restart uses.
    def startQuery() = in.toDF()
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "60 seconds"), col("key"))
      .agg(count(lit(1)).as("n"), sum(col("seq")).as("s"))
      .select(col("window.start").as("ws"), col("key"), col("n"), col("s"))
      .writeStream.format("parquet").option("path", outDir)
      .outputMode("append").option("checkpointLocation", ckpt).start()

    // phase 1: two rows land in window [00:00, 00:01); state buffers them.
    val q1 = startQuery()
    in.addData(Ev("k", ts("2024-01-01 00:00:10"), 1), Ev("k", ts("2024-01-01 00:00:40"), 2))
    q1.processAllAvailable()
    q1.stop() // crash point: window still open, counts only in the state store

    // phase 2: restart from the checkpoint; one more row joins the open
    // window, then a later row pushes the watermark past its end.
    val q2 = startQuery()
    in.addData(Ev("k", ts("2024-01-01 00:00:50"), 4))
    q2.processAllAvailable()
    in.addData(Ev("k", ts("2024-01-01 00:02:30"), 8))
    q2.processAllAvailable()
    in.addData(Ev("k", ts("2024-01-01 00:03:30"), 16)) // commit the wm advance
    q2.processAllAvailable()
    try {
      val out = spark.read.parquet(outDir)
        .select("ws", "key", "n", "s").as[(Timestamp, String, Long, Long)]
        .collect().toSet
      // pre-crash rows count exactly once, merged with the post-restart row.
      assert(out.contains((ts("2024-01-01 00:00:00"), "k", 3L, 7L)),
        s"restored window wrong: $out")
    } finally q2.stop()
  }

  test("R4: bounded cycle drains a retry loop and caps iterations") {
    // each pass doubles v; rows leave the cycle once v >= 10
    val init = Seq(1L, 3L, 64L).toDF("v")
    def step(df: org.apache.spark.sql.DataFrame) =
      (df.where(col("v") * 2 >= 10).withColumn("v", col("v") * 2),
        df.where(col("v") * 2 < 10).withColumn("v", col("v") * 2))

    val (done, leftover) = Cycles.boundedLoop(init, step, maxIterations = 10)
    assert(done.select("v").as[Long].collect().sorted.toSeq === Seq(12L, 16L, 128L))
    assert(leftover.isEmpty)

    // bound enforcement: 1 iteration leaves the small rows unresolved
    val (d1, l1) = Cycles.boundedLoop(init, step, maxIterations = 1)
    assert(d1.select("v").as[Long].collect().toSeq === Seq(128L))
    assert(l1.select("v").as[Long].collect().sorted.toSeq === Seq(2L, 6L))
  }
}
