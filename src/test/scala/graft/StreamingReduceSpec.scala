package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming window semantics on MemoryStream, mirroring the reference's
  * reduce-one-e2e scenarios: watermark-driven window close (append mode)
  * and late-data handling (SURVEY W1/W6, aligned/reducer.rs:609,652). */
class StreamingReduceSpec extends SparkSpec {
  import spark.implicits._

  test("fixed window closes when watermark passes; late rows dropped") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Long)]
    val agg = in.toDF().toDF("ts", "key", "value")
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "60 seconds"), col("key"))
      .agg(sum("value").as("total"))
      .select(col("window.start").as("w_start"), col("key"), col("total"))

    val q = agg.writeStream.format("memory").queryName("fixed_out")
      .outputMode("append").start()

    // batch 1: window [00:00, 01:00) gets 1+2+3
    in.addData(
      (ts("2024-01-01 00:00:10"), "k", 1L),
      (ts("2024-01-01 00:00:20"), "k", 2L),
      (ts("2024-01-01 00:00:30"), "k", 3L))
    q.processAllAvailable()
    // batch 2: event far ahead advances WM past 01:00 -> window closes
    in.addData((ts("2024-01-01 00:02:00"), "k", 100L))
    q.processAllAvailable()
    // batch 3: a LATE row for the closed window must be dropped,
    // plus another ahead event to flush
    in.addData((ts("2024-01-01 00:00:40"), "k", 999L))
    q.processAllAvailable()
    in.addData((ts("2024-01-01 00:05:00"), "k", 7L))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("fixed_out")
      .as[(Timestamp, String, Long)].collect().map { case (k, _, v) => k -> v }.toMap
    assert(rows(ts("2024-01-01 00:00:00")) === 6L) // 999 dropped, not 1005
    assert(rows(ts("2024-01-01 00:02:00")) === 100L)
  }

  test("session windows merge per key (streaming)") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Long)]
    val agg = in.toDF().toDF("ts", "key", "value")
      .withWatermark("ts", "5 seconds")
      .groupBy(session_window(col("ts"), "30 seconds"), col("key"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("s_start"), col("key"), col("n"))

    val q = agg.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()

    // burst of 3 events gaps<30s -> ONE session; then a 2nd session later
    in.addData(
      (ts("2024-01-01 00:00:00"), "k", 1L),
      (ts("2024-01-01 00:00:20"), "k", 1L),
      (ts("2024-01-01 00:00:35"), "k", 1L),
      (ts("2024-01-01 00:02:00"), "k", 1L))
    q.processAllAvailable()
    in.addData((ts("2024-01-01 00:10:00"), "k", 1L)) // advance WM, close both
    q.processAllAvailable()
    in.addData((ts("2024-01-01 00:20:00"), "k", 1L))
    q.processAllAvailable()
    q.stop()

    val sessions = spark.table("sess_out")
      .as[(Timestamp, String, Long)].collect().map { case (s, _, n) => s -> n }.toMap
    assert(sessions(ts("2024-01-01 00:00:00")) === 3L) // merged burst
    assert(sessions(ts("2024-01-01 00:02:00")) === 1L)
  }

  test("DSL session reduce compiles and merges in streaming mode") {
    import graft.model.Pipeline._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Long)]
    val spec = PipelineSpec(
      vertices = Seq(
        SourceV("in", in.toDF().toDF("ts", "key", "value"), "ts"),
        ReduceV("sess", GroupBySpec(Session("30 seconds"), Seq("key"),
          Seq(count(lit(1)).as("n")))),
        SinkV("out")),
      edges = Seq(Edge("in", "sess"), Edge("sess", "out")),
      watermark = WatermarkSpec("5 seconds"))
    val q = graft.streaming.Compiler.compile(spec)("out")
      .writeStream.format("memory").queryName("dsl_sess")
      .outputMode(graft.streaming.Compiler.outputMode(
        spec.byName("sess").asInstanceOf[ReduceV].groupBy)).start()
    try {
      in.addData(
        (ts("2024-01-01 00:00:00"), "k", 1L),
        (ts("2024-01-01 00:00:20"), "k", 1L),
        (ts("2024-01-01 00:00:35"), "k", 1L), // gaps < 30s -> one session
        (ts("2024-01-01 00:02:00"), "k", 1L))
      q.processAllAvailable()
      in.addData((ts("2024-01-01 00:10:00"), "k", 1L))
      q.processAllAvailable()
      in.addData((ts("2024-01-01 00:20:00"), "k", 1L))
      q.processAllAvailable()
      val sessions = spark.table("dsl_sess")
        .select("session_start", "n").as[(Timestamp, Long)].collect().toMap
      assert(sessions(ts("2024-01-01 00:00:00")) === 3L)
      assert(sessions(ts("2024-01-01 00:02:00")) === 1L)
    } finally q.stop()
  }

  test("DSL sliding reduce emits every overlapping window in streaming mode") {
    import graft.model.Pipeline._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Long)]
    val spec = PipelineSpec(
      vertices = Seq(
        SourceV("in", in.toDF().toDF("ts", "key", "value"), "ts"),
        ReduceV("slide", GroupBySpec(Sliding("60 seconds", "30 seconds"),
          Seq("key"), Seq(sum(col("value")).as("total")))),
        SinkV("out")),
      edges = Seq(Edge("in", "slide"), Edge("slide", "out")),
      watermark = WatermarkSpec("10 seconds"))
    val q = graft.streaming.Compiler.compile(spec)("out")
      .writeStream.format("memory").queryName("dsl_slide")
      .outputMode("append").start()
    try {
      in.addData((ts("2024-01-01 00:00:40"), "k", 5L)) // windows [23:30,00:30)? no: [00:00,01:00) and [00:30,01:30)
      q.processAllAvailable()
      in.addData((ts("2024-01-01 00:10:00"), "k", 1L)) // close both
      q.processAllAvailable()
      in.addData((ts("2024-01-01 00:20:00"), "k", 1L))
      q.processAllAvailable()
      val wins = spark.table("dsl_slide")
        .select("w_start", "total").as[(Timestamp, Long)].collect()
        .filter(_._2 == 5L).map(_._1).sorted
      assert(wins.toSeq === Seq(ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:30")))
    } finally q.stop()
  }

  test("W6: per-edge allowedLateness — two reducers off one source diverge") {
    import graft.model.Pipeline._
    implicit val ctx = spark.sqlContext
    // ONE source, TWO reduce edges with different allowedLateness: the
    // compiler must give each branch its own withWatermark (maxDelay +
    // that edge's lateness), not fold both into one shared delay — a late
    // row lands inside the lenient branch's window while the strict
    // branch has already closed it.
    val in = MemoryStream[(Timestamp, String, Long)]
    def spec(input: org.apache.spark.sql.DataFrame) = PipelineSpec(
      vertices = Seq(
        SourceV("in", input, "ts"),
        ReduceV("strict", GroupBySpec(Fixed("60 seconds"), Seq("key"),
          Seq(sum(col("value")).as("total")), allowedLateness = "0 seconds")),
        ReduceV("lenient", GroupBySpec(Fixed("60 seconds"), Seq("key"),
          Seq(sum(col("value")).as("total")), allowedLateness = "60 seconds")),
        SinkV("out_strict"), SinkV("out_lenient")),
      edges = Seq(Edge("in", "strict"), Edge("in", "lenient"),
        Edge("strict", "out_strict"), Edge("lenient", "out_lenient")),
      watermark = WatermarkSpec("10 seconds"))

    val sinks = graft.streaming.Compiler.compile(spec(in.toDF().toDF("ts", "key", "value")))
    val qs = sinks("out_strict").writeStream.format("memory")
      .queryName("lat_strict").outputMode("append").start()
    val ql = sinks("out_lenient").writeStream.format("memory")
      .queryName("lat_lenient").outputMode("append").start()
    try {
      def sync(): Unit = { qs.processAllAvailable(); ql.processAllAvailable() }
      in.addData((ts("2024-01-01 00:00:10"), "k", 1L),
                 (ts("2024-01-01 00:00:20"), "k", 2L))
      sync()
      // WM(strict) = 01:50 -> [00:00,01:00) CLOSED; WM(lenient) = 00:50 -> open
      in.addData((ts("2024-01-01 00:02:00"), "k", 100L))
      sync()
      // late row for [00:00,01:00): dropped by strict, absorbed by lenient
      in.addData((ts("2024-01-01 00:00:40"), "k", 4L))
      sync()
      in.addData((ts("2024-01-01 00:10:00"), "k", 5L)) // flush everything
      sync()
      def totals(t: String) = spark.table(t).select("w_start", "total")
        .as[(Timestamp, Long)].collect().toMap
      val strict = totals("lat_strict"); val lenient = totals("lat_lenient")
      assert(strict(ts("2024-01-01 00:00:00")) === 3L)  // late row dropped
      assert(lenient(ts("2024-01-01 00:00:00")) === 7L) // late row within lateness
      // the lenient branch matches its batch twin (batch sees every row)
      val batch = graft.streaming.Compiler.compile(
        spec(Seq((ts("2024-01-01 00:00:10"), "k", 1L),
                 (ts("2024-01-01 00:00:20"), "k", 2L),
                 (ts("2024-01-01 00:02:00"), "k", 100L),
                 (ts("2024-01-01 00:00:40"), "k", 4L),
                 (ts("2024-01-01 00:10:00"), "k", 5L)).toDF("ts", "key", "value")),
        streaming = false)("out_lenient")
        .select("w_start", "total").as[(Timestamp, Long)].collect().toMap
      assert(batch(ts("2024-01-01 00:00:00")) === 7L)
      // every window the stream closed matches its batch value (the final
      // [00:10) flush window only exists in batch — nothing advanced the
      // stream's watermark past it)
      assert(lenient === batch.view.filterKeys(lenient.contains).toMap)
    } finally { qs.stop(); ql.stop() }
  }

  test("windowed approximate distinct on a stream: chained HLL aggs match batch") {
    // registers → estimate is TWO stateful aggregations chained on the
    // window column — the Spark 4 multiple-stateful-operator pattern.
    // Being expression-only, Sketches.hllMd5's math runs unchanged.
    import graft.ops.Sketches
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val (bucket, rank) = Sketches.hllRegister(col("user_id"))
    val regs = in.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "60 seconds"), bucket.as("bucket"))
      .agg(max(rank).as("mj"))
    val rawE = lit(Sketches.HllNumerator) / col("vscaled").cast("double")
    val est = regs.groupBy(col("window"))
      .agg((sum(expr("shiftleft(1L, 52 - mj)")) +
          (lit(Sketches.HllBuckets.toLong) - count(lit(1))) * lit(1L << 52)).as("vscaled"),
        (lit(Sketches.HllBuckets) - count(lit(1))).cast("int").as("n_empty"))
      .select(col("window.start").as("w_start"),
        when(col("n_empty") > 0 && rawE <= lit(2.5 * Sketches.HllBuckets),
          element_at(array(Sketches.HllLnTable.map(lit): _*), col("n_empty")))
          .otherwise(rawE).as("approx_users"))
    val q = est.writeStream.format("memory").queryName("hll_win")
      .outputMode("append").start()
    try {
      // window 1: users 1..40; window 2: users 100..129
      in.addData((1 to 40).map(u => (ts("2024-01-01 00:00:30"), u.toLong)): _*)
      in.addData((100 to 129).map(u => (ts("2024-01-01 00:01:30"), u.toLong)): _*)
      q.processAllAvailable()
      in.addData((ts("2024-01-01 00:10:00"), 999L)) // advance watermark, close both
      q.processAllAvailable()

      val got = spark.table("hll_win")
        .as[(Timestamp, Double)].collect().toMap
      assert(got.contains(ts("2024-01-01 00:00:00")) &&
        got.contains(ts("2024-01-01 00:01:00")), s"windows must close: $got")

      // the streamed estimate equals the BATCH hllMd5 on the same slices
      val batch = Sketches.hllMd5(
        ((1 to 40).map(u => ("w1", u.toLong)) ++ (100 to 129).map(u => ("w2", u.toLong)))
          .toDF("w", "user_id"), Seq("w"), col("user_id"))
        .select(col("w"), col("approx_users")).as[(String, Double)].collect().toMap
      assert(got(ts("2024-01-01 00:00:00")) === batch("w1"))
      assert(got(ts("2024-01-01 00:01:00")) === batch("w2"))
      // and it is a sane estimate of the exact cardinality
      assert(math.abs(got(ts("2024-01-01 00:00:00")) - 40) / 40.0 < 0.35)
    } finally q.stop()
  }

  test("idle-source heartbeats advance the watermark without polluting results") {
    // batch-shape check of the helper's schema handling (streaming rate
    // source behavior needs wall-clock time; here we verify the contract:
    // heartbeat rows are tagged and dropped, data rows survive).
    val data = Seq((ts("2024-01-01 00:00:10"), "k", 1L)).toDF("ts", "key", "value")
    val withHb = data.withColumn("__hb", lit(false))
    val dropped = graft.streaming.IdleSource.dropHeartbeats(withHb, "ts")
    assert(dropped.columns.toSeq === Seq("ts", "key", "value"))
    assert(dropped.count() === 1)
  }

  test("WM5 stateful heartbeats: window closes with ZERO live rows in the batch") {
    // the built-in-source idle path (Kafka.sourceWithReplaySafeIdleWm's
    // mechanism): after the last live row, the persisted per-key max
    // steps forward on processing-time timeouts alone — empty batches,
    // no data anywhere — until the watermark passes the window end and
    // the reduce emits. Heartbeat times derive from DATA (00:00:30 +
    // k*10min), never wall-clock: replay-safe by construction.
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Int, Timestamp, Long)]
    val hb = graft.streaming.IdleSource.withStatefulHeartbeats(
      in.toDF().toDF("part", "ts", "value"), "ts", Seq("part"),
      thresholdMs = 200L, stepIntervalMs = 50L, incrementByMs = 600000L)
    val agg = graft.streaming.IdleSource.dropHeartbeats(
        hb.withWatermark("ts", "1 second"), "ts")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(sum("value").as("total"))
      .select(col("window.start").as("w_start"), col("total"))
    val q = agg.writeStream.format("memory").queryName("hb_state_out")
      .outputMode("append").start()
    try {
      in.addData((0, ts("2024-01-01 00:00:10"), 1L),
        (0, ts("2024-01-01 00:00:30"), 2L))
      // CANNOT processAllAvailable here: processing-time timeouts keep
      // the engine scheduling batches forever (shouldRunAnotherBatch),
      // so the no-new-data signal never fires — poll the sink instead.
      // NO further data, ever: only timeouts fire after batch 0. The
      // max (00:00:30) steps +10min per ~50ms; ~7 steps cross 01:00:01.
      val deadline = System.currentTimeMillis() + 60000
      var rows = Array.empty[(Timestamp, Long)]
      while (rows.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        rows = spark.table("hb_state_out")
          .as[(Timestamp, Long)].collect()
      }
      assert(rows.toSeq === Seq((ts("2024-01-01 00:00:00"), 3L)),
        s"window must close on heartbeats alone, got ${rows.toSeq}")
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS hb_state_out")
    }
  }

  test("stateful heartbeats derive from data times — a replay cannot jump to wall-clock") {
    // same operator, replayed 'historical' data: every heartbeat ts must
    // be maxSeen + k*incrementBy, bounded by the steps taken — NOT now()
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Int, Timestamp, Long)]
    val hb = graft.streaming.IdleSource.withStatefulHeartbeats(
      in.toDF().toDF("part", "ts", "value"), "ts", Seq("part"),
      thresholdMs = 100L, stepIntervalMs = 50L, incrementByMs = 1000L)
    val q = hb.writeStream.format("memory").queryName("hb_replay_out")
      .outputMode("append").start()
    try {
      in.addData((0, ts("2020-06-01 00:00:00"), 1L))
      // poll, never processAllAvailable (see previous test)
      val deadline = System.currentTimeMillis() + 60000
      var hbs = Seq.empty[Timestamp]
      while (hbs.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        hbs = spark.table("hb_replay_out")
          .where(col("__hb")).select(col("ts"))
          .as[Timestamp].collect().toSeq
      }
      assert(hbs.nonEmpty, "idle key must emit heartbeats")
      val base = ts("2020-06-01 00:00:00").getTime
      hbs.foreach { t =>
        val steps = (t.getTime - base) / 1000.0
        // wall-clock leakage would put the heartbeat ~1.9e8 s past the
        // 2020 base; honest stepping stays within the poll window's
        // step budget (60 s / 50 ms = 1200, wide margin below)
        assert(steps > 0 && steps == steps.floor && steps < 10000,
          s"heartbeat $t is not base + k*incrementBy from the 2020 data")
      }
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS hb_replay_out")
    }
  }
}
