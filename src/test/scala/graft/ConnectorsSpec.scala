package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.streaming.{HttpSource, Kafka, ServingEndpoint, UdSource}
import graft.streaming.UdSource.MemoryGraftSource

/** Connector ring (SURVEY §2.1/§2.7): Kafka spec→option mapping and
  * frame decode/encode (no broker in the sandbox — the format("kafka")
  * wiring is one line; everything else is exercised here on Kafka-shaped
  * rows), the UD-source SPI end-to-end through DSv2 (read/ack/pending/
  * partitions), and the HTTP source's header contract over a real local
  * server — mirroring the reference's udsource-e2e / kafka-e2e suites. */
class ConnectorsSpec extends SparkSpec {
  import spark.implicits._

  // ---- Kafka -------------------------------------------------------------

  test("kafka source conf maps to connector options") {
    val opts = Kafka.sourceOptions(Kafka.SourceConf(
      brokers = "b1:9092,b2:9092", topics = "events",
      consumerGroup = Some("graft-cg"), maxOffsetsPerTrigger = Some(500)))
    assert(opts("kafka.bootstrap.servers") === "b1:9092,b2:9092")
    assert(opts("subscribe") === "events")
    assert(opts("kafka.group.id") === "graft-cg")
    assert(opts("maxOffsetsPerTrigger") === "500")
    assert(opts("startingOffsets") === "earliest")
  }

  test("kafka frame decode/encode on kafka-shaped rows") {
    // kafka-shaped frame: headers is array<struct<key:string,value:binary>>
    val raw = Seq(
      ("k1", "v1", "t", 0, 7L, ts("2024-01-01 00:00:01"), true),
      (null.asInstanceOf[String], "v2", "t", 1, 8L, ts("2024-01-01 00:00:02"), false)
    ).toDF("key0", "value0", "topic", "partition", "offset", "timestamp", "hasH")
      .select(
        col("key0").cast("binary").as("key"),
        col("value0").cast("binary").as("value"),
        col("topic"), col("partition"), col("offset"), col("timestamp"),
        when(col("hasH"),
          array(struct(lit("h1").as("key"), lit("x").cast("binary").as("value"))))
          .as("headers"))

    val dec = Kafka.decode(raw).orderBy("offset").collect()
    assert(dec(0).getAs[Seq[String]]("keys") === Seq("k1"))
    assert(new String(dec(0).getAs[Array[Byte]]("value")) === "v1")
    assert(dec(0).getAs[Map[String, String]]("headers") === Map("h1" -> "x"))
    assert(dec(1).getAs[Seq[String]]("keys") === Seq.empty)
    assert(dec(1).getAs[Map[String, String]]("headers") === Map.empty)

    val enc = Kafka.encode(
      Seq(("rid", "payload")).toDF("rid", "body"), "rid", "body").collect().head
    assert(new String(enc.getAs[Array[Byte]]("key")) === "rid")
    assert(new String(enc.getAs[Array[Byte]]("value")) === "payload")
  }

  test("kafka wire path: provider resolution is environment-adaptive") {
    // The spark-sql-kafka connector jar is a deploy-time dependency, not a
    // compile-time one (format("kafka") resolves by name). On a classpath
    // that carries it, the full wire wiring must stand up: our generated
    // options feed the provider and the decode projection binds to the
    // connector's schema. On this sandbox (no jar, zero egress) the same
    // call must fail cleanly AT provider resolution with the standard
    // data-source hint — not earlier, not corrupting the session.
    scala.util.Try(Kafka.source(spark,
      Kafka.SourceConf("localhost:9092", "events"))) match {
      case scala.util.Success(df) =>
        // jar present: decode bound against the connector's real schema
        assert(df.schema.fieldNames.toSet ===
          Set("keys", "value", "eventTime", "headers", "topic", "partition", "offset"))
      case scala.util.Failure(e) =>
        val msg = (e.getMessage + Option(e.getCause).map(_.getMessage).mkString)
          .toLowerCase
        assert(msg.contains("kafka"), s"unexpected failure: $e")
    }
  }

  test("kafka-shaped stream drives a compiled pipeline end-to-end") {
    import graft.model.Pipeline._
    implicit val ctx = spark.sqlContext
    // MemoryStream carrying the exact Kafka frame → the SAME decode path
    // the kafka format would feed (no broker in the sandbox).
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String, java.sql.Timestamp)]
    val raw = in.toDF().toDF("key0", "value0", "ts0").select(
      col("key0").cast("binary").as("key"),
      col("value0").cast("binary").as("value"),
      lit("t").as("topic"), lit(0).as("partition"), lit(0L).as("offset"),
      col("ts0").as("timestamp"),
      lit(null).cast("array<struct<key:string,value:binary>>").as("headers"))

    val spec = PipelineSpec(
      vertices = Seq(
        SourceV("in", Kafka.decode(raw), "eventTime"),
        MapV("parse", df => df.select(col("eventTime"),
          col("keys")(0).as("key"), col("value").cast("string").cast("long").as("v"))),
        ReduceV("win", GroupBySpec(Fixed("60 seconds"), Seq("key"),
          Seq(sum(col("v")).as("total")))),
        SinkV("out")),
      edges = Seq(Edge("in", "parse"), Edge("parse", "win"), Edge("win", "out")),
      watermark = WatermarkSpec("10 seconds"))

    val q = graft.streaming.Compiler.compile(spec, streaming = true)("out")
      .writeStream.format("memory").queryName("kafka_pipe")
      .outputMode("append").start()
    try {
      in.addData(
        ("a", "1", ts("2024-01-01 00:00:10")),
        ("a", "2", ts("2024-01-01 00:00:20")))
      q.processAllAvailable()
      in.addData(("a", "9", ts("2024-01-01 00:05:00"))) // advance wm, close window
      q.processAllAvailable()
      in.addData(("a", "1", ts("2024-01-01 00:09:00")))
      q.processAllAvailable()
      val totals = spark.table("kafka_pipe")
        .select(col("key"), col("total")).as[(String, Long)].collect()
      assert(totals.contains(("a", 3L))) // window [00:00,01:00) summed 1+2
    } finally q.stop()
  }

  // ---- UD-source SPI ------------------------------------------------------

  test("udsource: read/ack/pending through DSv2 micro-batches") {
    val src = UdSource.register("spec-mem", new MemoryGraftSource(numPartitions = 2))
    src.append(Seq("a"), "m0".getBytes, ts("2024-01-01 00:00:01"), partition = 0)
    src.append(Seq("b"), "m1".getBytes, ts("2024-01-01 00:00:02"), partition = 1,
      headers = Map("h" -> "1"))
    assert(src.pending === 2)

    val q = UdSource.readStream(spark, "spec-mem")
      .writeStream.format("memory").queryName("ud_out")
      .option("checkpointLocation", Files.createTempDirectory("udsrc").toString)
      .start()
    try {
      q.processAllAvailable()
      // second wave: offsets continue from the checkpoint
      src.append(Seq("a"), "m2".getBytes, ts("2024-01-01 00:00:03"), partition = 0)
      q.processAllAvailable()
      // third wave: forces another micro-batch so the engine commits the
      // second one (source.commit fires on the NEXT batch's construction —
      // the last in-flight batch stays unacked until then: at-least-once).
      src.append(Seq("a"), "m3".getBytes, ts("2024-01-01 00:00:04"), partition = 0)
      q.processAllAvailable()

      val rows = spark.table("ud_out")
        .select(col("keys")(0).as("k"), col("value").cast("string"),
          col("partition"), col("offset"), col("headers"))
        .as[(String, String, Int, Long, Map[String, String])]
        .collect().sortBy(_._2)
      assert(rows.map(_._2).toSeq === Seq("m0", "m1", "m2", "m3"))
      assert(rows.map(r => (r._1, r._3, r._4)).toSeq ===
        Seq(("a", 0, 0L), ("b", 1, 0L), ("a", 0, 1L), ("a", 0, 2L)))
      assert(rows(1)._5 === Map("h" -> "1"))

      // every batch except (possibly) the last in-flight one is acked
      val deadline = System.currentTimeMillis() + 10000
      while (src.pending > 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(src.pending <= 1)
      assert(src.ackedUpTo(0) >= 2L && src.ackedUpTo(1) === 1L)
    } finally {
      q.stop()
      UdSource.unregister("spec-mem")
    }
  }

  test("udsource: pause/resume from checkpoint replays nothing (X7/W9)") {
    val src = UdSource.register("spec-ckpt", new MemoryGraftSource(1))
    val ckpt = Files.createTempDirectory("udckpt").toString
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    def startQuery() = UdSource.readStream(spark, "spec-ckpt")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        seen ++= b.select(col("value").cast("string")).as[String].collect(); ()
      }
      .start()

    try {
      src.append(Seq("k"), "c0".getBytes, ts("2024-01-01 00:00:01"))
      src.append(Seq("k"), "c1".getBytes, ts("2024-01-01 00:00:02"))
      val q1 = startQuery()
      q1.processAllAvailable()
      q1.stop() // pause (X7): offsets live in the checkpoint (W9 WAL role)

      src.append(Seq("k"), "c2".getBytes, ts("2024-01-01 00:00:03"))
      val q2 = startQuery() // resume: deserializeOffset restores position
      try {
        q2.processAllAvailable()
        // c0/c1 must NOT replay; c2 must arrive exactly once
        assert(seen.sorted.toSeq === Seq("c0", "c1", "c2"))
      } finally q2.stop()
    } finally UdSource.unregister("spec-ckpt")
  }

  // ---- HTTP source --------------------------------------------------------

  test("http source: header contract + id dedup, e2e through the SPI") {
    val http = new HttpSource(port = 0)
    try {
      val client = HttpClient.newHttpClient()
      def post(body: String, hs: (String, String)*): Int = {
        val b = HttpRequest.newBuilder(URI.create(http.url))
          .POST(HttpRequest.BodyPublishers.ofString(body))
        hs.foreach { case (k, v) => b.header(k, v) }
        client.send(b.build(), HttpResponse.BodyHandlers.ofString()).statusCode()
      }

      assert(post("p1", "X-Numaflow-Id" -> "id-1",
        "X-Numaflow-Event-Time" -> "1704067201000",
        "X-Numaflow-Keys" -> "k1,k2") === 200)
      assert(post("p1-dup", "X-Numaflow-Id" -> "id-1") === 202) // dedup'd
      assert(post("p2") === 200)                                // defaults
      assert(http.pending === 2)

      val name = "spec-http"
      UdSource.register(name, http)
      val q = UdSource.readStream(spark, name)
        .writeStream.format("memory").queryName("http_out")
        .option("checkpointLocation", Files.createTempDirectory("httpsrc").toString)
        .start()
      try {
        q.processAllAvailable()
        val rows = spark.table("http_out")
          .select(col("value").cast("string").as("v"), col("keys"), col("eventTime"))
          .orderBy("offset").collect()
        assert(rows.map(_.getString(0)).toSeq === Seq("p1", "p2"))
        assert(rows(0).getAs[Seq[String]]("keys") === Seq("k1", "k2"))
        assert(rows(0).getAs[java.sql.Timestamp]("eventTime").getTime === 1704067201000L)
      } finally { q.stop(); UdSource.unregister(name) }
    } finally http.close()
  }

  // ---- ServingPipeline ----------------------------------------------------

  test("serving pipeline composed through the DSL compiler") {
    import graft.model.Pipeline._
    val serving = new ServingEndpoint(port = 0, syncTimeoutMs = 30000)
    // ServingPipeline = Pipeline + serving layer: the serving source and
    // serve sink wrap an ORDINARY compiled DAG (reference §2.10 shape).
    val spec = PipelineSpec(
      vertices = Seq(
        SourceV("in", UdSource.readStream(spark, serving.sourceName), "eventTime"),
        MapV("shout", df => df.select(col("keys")(0).as("rid"),
          concat(upper(col("value").cast("string")), lit("!")).as("resp"))),
        SinkV("out")),
      edges = Seq(Edge("in", "shout"), Edge("shout", "out")))
    val q = graft.streaming.Compiler.compile(spec)("out")
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("servdsl").toString)
      .foreachBatch((b: org.apache.spark.sql.Dataset[Row], id: Long) =>
        serving.serveSink("rid", "resp")(b.toDF(), id))
      .start()
    try {
      val resp = HttpClient.newHttpClient().send(
        HttpRequest.newBuilder(URI.create(s"${serving.url}/v1/process/sync"))
          .POST(HttpRequest.BodyPublishers.ofString("via dsl")).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() === 200)
      assert(resp.body() === "VIA DSL!")
    } finally { q.stop(); serving.close() }
  }

  test("serving: SSE streams every result row for a 1->N request") {
    val serving = new ServingEndpoint(port = 0, syncTimeoutMs = 30000, sseIdleMs = 1500)
    // DAG: flat-map the payload into one result row PER WORD — SSE must
    // deliver each as its own event.
    val q = UdSource.readStream(spark, serving.sourceName)
      .select(col("keys")(0).as("rid"),
        explode(split(col("value").cast("string"), " ")).as("resp"))
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("sse").toString)
      .foreachBatch((batch: org.apache.spark.sql.Dataset[Row], id: Long) =>
        serving.serveSink("rid", "resp")(batch.toDF(), id))
      .start()
    try {
      val resp = HttpClient.newHttpClient().send(
        HttpRequest.newBuilder(URI.create(s"${serving.url}/v1/process/sse"))
          .POST(HttpRequest.BodyPublishers.ofString("alpha beta gamma")).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() === 200)
      assert(resp.headers().firstValue("Content-Type").orElse("") === "text/event-stream")
      val events = resp.body().split("\n\n").filter(_.nonEmpty)
        .map(_.stripPrefix("data: ")).toSet
      assert(events === Set("alpha", "beta", "gamma"), s"got: ${resp.body()}")
    } finally { q.stop(); serving.close() }
  }

  test("serving: tracked SSE waits for the slow DAG path (MessageGraph analog)") {
    // Paths are DERIVED from the pipeline spec (tracker.rs), not declared:
    // the slow branch answers ~5 idle windows after the fast one.
    // Close-on-idle would cut the stream after sseIdleMs of quiet; the
    // path tracker must keep it open until BOTH live branches report,
    // then close promptly (well before syncTimeout) — and must NOT await
    // the DROP-routed audit branch, which no message can ever reach.
    import graft.model.Pipeline._
    import graft.ops.Routing.TagCondition
    val serving = new ServingEndpoint(port = 0, syncTimeoutMs = 30000,
      sseIdleMs = 500) // note: no caller-declared paths
    val spec = PipelineSpec(
      vertices = Seq(
        SourceV("in", UdSource.readStream(spark, serving.sourceName), "eventTime"),
        MapV("router", df => df),
        SinkV("fast"), SinkV("slow"), SinkV("audit")),
      edges = Seq(
        Edge("in", "router"),
        Edge("router", "fast"), Edge("router", "slow"),
        // DROP-only condition: messages carrying the DROP tag are
        // discarded before forwarding, so this branch is dead.
        Edge("router", "audit", Some(TagCondition(Seq(graft.model.Tags.Drop))))))
    serving.track(spec, "in")
    assert(serving.trackedPaths === Set("fast", "slow"),
      "audit must be excluded or the SSE close would hang to the deadline")
    val fastSink = serving.pathServeSink("fast",
      b => b.select(col("keys")(0).as("rid"),
        concat(lit("fast:"), col("value").cast("string")).as("resp")),
      "rid", "resp")
    val slowSink = serving.pathServeSink("slow",
      b => {
        Thread.sleep(2500) // the slow path: answers long after fast idles
        b.select(col("keys")(0).as("rid"),
          concat(lit("slow:"), col("value").cast("string")).as("resp"))
      },
      "rid", "resp")
    val q = UdSource.readStream(spark, serving.sourceName)
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("ssetrack").toString)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], id: Long) =>
        val df = batch.toDF(); fastSink(df, id); slowSink(df, id)
      }
      .start()
    try {
      val t0 = System.currentTimeMillis()
      val resp = HttpClient.newHttpClient().send(
        HttpRequest.newBuilder(URI.create(s"${serving.url}/v1/process/sse"))
          .POST(HttpRequest.BodyPublishers.ofString("ping")).build(),
        HttpResponse.BodyHandlers.ofString())
      val elapsed = System.currentTimeMillis() - t0
      assert(resp.statusCode() === 200)
      val events = resp.body().split("\n\n").filter(_.nonEmpty)
        .map(_.stripPrefix("data: ")).toSet
      assert(events === Set("fast:ping", "slow:ping"), s"got: ${resp.body()}")
      assert(elapsed < 15000, s"stream should close on coverage, took ${elapsed}ms")
    } finally { q.stop(); serving.close() }
  }

  test("serving: in-flight cap sheds over-limit requests with 429") {
    // Reference analog: buffer-full onFull semantics at the serving edge
    // (edge_types.go:127-133) — shed BEFORE the source, so the serve
    // sink's driver-side collects stay bounded by config, not clients.
    val serving = new ServingEndpoint(port = 0, syncTimeoutMs = 30000, maxInFlight = 2)
    try {
      val client = HttpClient.newHttpClient()
      def post(route: String, id: String) = client.send(
        HttpRequest.newBuilder(URI.create(s"${serving.url}/v1/process/$route"))
          .header("X-Numaflow-Id", id)
          .POST(HttpRequest.BodyPublishers.ofString("x")).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(post("async", "a").statusCode() === 200)
      assert(post("async", "b").statusCode() === 200)
      assert(serving.inFlightCount === 2)
      val shed = post("async", "c")
      assert(shed.statusCode() === 429, shed.body())
      assert(shed.body().contains("in-flight limit"))
      assert(serving.inFlightCount === 2, "a shed request must not hold a slot")
      // sync and sse draw from the same pool: both shed while saturated
      assert(post("sync", "c2").statusCode() === 429)
      assert(post("sse", "c3").statusCode() === 429)
      // completion releases the slot; the next request is admitted
      serving.complete("a", "done".getBytes)
      val deadline = System.currentTimeMillis() + 5000
      while (serving.inFlightCount > 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(serving.inFlightCount === 1)
      assert(post("async", "d").statusCode() === 200)
    } finally serving.close()
  }

  test("serving: sync POST -> DAG -> keyed response; async fetch") {
    val serving = new ServingEndpoint(port = 0, syncTimeoutMs = 30000)
    // DAG: uppercase the payload, answer to the request id (keys[0]).
    val q = UdSource.readStream(spark, serving.sourceName)
      .select(col("keys")(0).as("rid"), upper(col("value").cast("string")).as("resp"))
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("serving").toString)
      .foreachBatch((batch: org.apache.spark.sql.Dataset[Row], id: Long) =>
        serving.serveSink("rid", "resp")(batch.toDF(), id))
      .start()
    try {
      val client = HttpClient.newHttpClient()
      val sync = client.send(
        HttpRequest.newBuilder(URI.create(s"${serving.url}/v1/process/sync"))
          .POST(HttpRequest.BodyPublishers.ofString("hello graft")).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(sync.statusCode() === 200)
      assert(sync.body() === "HELLO GRAFT")

      val async = client.send(
        HttpRequest.newBuilder(URI.create(s"${serving.url}/v1/process/async"))
          .header("X-Numaflow-Id", "req-42")
          .POST(HttpRequest.BodyPublishers.ofString("later")).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(async.statusCode() === 200 && async.body().contains("req-42"))
      val deadline = System.currentTimeMillis() + 30000
      var fetched: HttpResponse[String] = null
      while ({
        fetched = client.send(
          HttpRequest.newBuilder(URI.create(s"${serving.url}/v1/fetch?id=req-42"))
            .GET().build(), HttpResponse.BodyHandlers.ofString())
        fetched.statusCode() != 200 && System.currentTimeMillis() < deadline
      }) Thread.sleep(100)
      assert(fetched.statusCode() === 200)
      assert(fetched.body() === "LATER")
    } finally { q.stop(); serving.close() }
  }

  test("serving: evicted ids are re-admissible — 504 retry and post-TTL resubmit") {
    // Sync: the id lives one exchange. A request the DAG never answers
    // 504s, and the RETRY of the same id is admitted (not 409) and can
    // succeed — the reference's client-retry path.
    val serving = new ServingEndpoint(port = 0, syncTimeoutMs = 300, maxInFlight = 2)
    try {
      val client = HttpClient.newHttpClient()
      def syncReq = HttpRequest.newBuilder(URI.create(s"${serving.url}/v1/process/sync"))
        .header("X-Numaflow-Id", "retry-1")
        .POST(HttpRequest.BodyPublishers.ofString("x")).build()
      assert(client.send(syncReq, HttpResponse.BodyHandlers.ofString()).statusCode() === 504)
      val second = client.sendAsync(syncReq, HttpResponse.BodyHandlers.ofString())
      val deadline = System.currentTimeMillis() + 5000
      while (serving.inFlightCount < 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(10)
      serving.complete("retry-1", "ok-on-retry".getBytes)
      val resp = second.get(10, java.util.concurrent.TimeUnit.SECONDS)
      assert(resp.statusCode() === 200 && resp.body() === "ok-on-retry")
      // A late DAG answer for the 504'd FIRST exchange was dropped, not
      // stored: nothing to fetch under the evicted id once retry ends.
    } finally serving.close()

    // Async: TTL expiry evicts — the same id resubmits cleanly (200, not
    // the permanent 409 a never-evicted result map would give).
    val ttld = new ServingEndpoint(port = 0, syncTimeoutMs = 30000,
      maxInFlight = 2, resultTtlMs = 200)
    try {
      val client = HttpClient.newHttpClient()
      def post() = client.send(
        HttpRequest.newBuilder(URI.create(s"${ttld.url}/v1/process/async"))
          .header("X-Numaflow-Id", "resub-1")
          .POST(HttpRequest.BodyPublishers.ofString("x")).build(),
        HttpResponse.BodyHandlers.ofString())
      def fetch() = client.send(
        HttpRequest.newBuilder(URI.create(s"${ttld.url}/v1/fetch?id=resub-1"))
          .GET().build(), HttpResponse.BodyHandlers.ofString())
      assert(post().statusCode() === 200)
      val deadline = System.currentTimeMillis() + 5000
      while (!fetch().body().contains("expired") && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(fetch().body().contains("expired"))
      assert(post().statusCode() === 200, "post-TTL resubmit must be admitted")
      ttld.complete("resub-1", "second-life".getBytes)
      assert(fetch().statusCode() === 200 && fetch().body() === "second-life")
    } finally ttld.close()
  }

  test("serving: duplicate request ids are 409 and cannot free other slots") {
    val serving = new ServingEndpoint(port = 0, syncTimeoutMs = 30000, maxInFlight = 2)
    try {
      val client = HttpClient.newHttpClient()
      def post(id: String) = client.send(
        HttpRequest.newBuilder(URI.create(s"${serving.url}/v1/process/async"))
          .header("X-Numaflow-Id", id)
          .POST(HttpRequest.BodyPublishers.ofString("x")).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(post("a").statusCode() === 200)
      serving.complete("a", "done".getBytes)
      val deadline = System.currentTimeMillis() + 5000
      while (serving.inFlightCount > 0 && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(post("b").statusCode() === 200)
      assert(serving.inFlightCount === 1)
      // Replaying the COMPLETED id must be rejected — under a per-id-future
      // slot design its whenComplete fired synchronously and freed a slot
      // that was never taken, silently widening maxInFlight.
      assert(post("a").statusCode() === 409)
      assert(serving.inFlightCount === 1)
      // Replaying an IN-FLIGHT id is likewise rejected, not double-counted.
      assert(post("b").statusCode() === 409)
      assert(serving.inFlightCount === 1)
    } finally serving.close()
  }

  test("serving: sse slot spans the whole stream, not just the first event") {
    val serving = new ServingEndpoint(port = 0, syncTimeoutMs = 30000,
      sseIdleMs = 1500, maxInFlight = 4)
    try {
      val client = HttpClient.newHttpClient()
      val resp = client.sendAsync(
        HttpRequest.newBuilder(URI.create(s"${serving.url}/v1/process/sse"))
          .header("X-Numaflow-Id", "stream-1")
          .POST(HttpRequest.BodyPublishers.ofString("x")).build(),
        HttpResponse.BodyHandlers.ofString())
      var deadline = System.currentTimeMillis() + 5000
      while (serving.inFlightCount < 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(serving.inFlightCount === 1)
      serving.complete("stream-1", "evt".getBytes) // first (and only) event
      Thread.sleep(300)
      // Stream is still open (idle close is 1500ms away): the slot must
      // still be held — the old design released it on future completion.
      assert(serving.inFlightCount === 1,
        "sse slot must be held until the stream closes")
      assert(resp.get(30, java.util.concurrent.TimeUnit.SECONDS)
        .body().contains("evt"))
      deadline = System.currentTimeMillis() + 5000
      while (serving.inFlightCount > 0 && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(serving.inFlightCount === 0)
    } finally serving.close()
  }

  test("serving: slot backstop does not poison late async results; TTL is opt-in") {
    // Default (no TTL): a request the DAG hasn't answered ages out of its
    // SLOT after 2x syncTimeoutMs, but the result future stays usable — a
    // late answer lands and /v1/fetch serves it (async batches may run
    // far longer than any sync timeout).
    val serving = new ServingEndpoint(port = 0, syncTimeoutMs = 200, maxInFlight = 2)
    try {
      val client = HttpClient.newHttpClient()
      def post(id: String) = client.send(
        HttpRequest.newBuilder(URI.create(s"${serving.url}/v1/process/async"))
          .header("X-Numaflow-Id", id)
          .POST(HttpRequest.BodyPublishers.ofString("x")).build(),
        HttpResponse.BodyHandlers.ofString())
      def fetch(id: String) = client.send(
        HttpRequest.newBuilder(URI.create(s"${serving.url}/v1/fetch?id=$id"))
          .GET().build(), HttpResponse.BodyHandlers.ofString())
      assert(post("slow").statusCode() === 200)
      val deadline = System.currentTimeMillis() + 5000
      while (serving.inFlightCount > 0 && System.currentTimeMillis() < deadline)
        Thread.sleep(20) // backstop (400ms) frees the slot...
      assert(serving.inFlightCount === 0)
      serving.complete("slow", "late-but-fine".getBytes) // ...without poisoning
      assert(fetch("slow").statusCode() === 200)
      assert(fetch("slow").body() === "late-but-fine")
    } finally serving.close()

    // Opt-in TTL: an unanswered async result expires and fetch says so.
    val ttld = new ServingEndpoint(port = 0, syncTimeoutMs = 30000,
      maxInFlight = 2, resultTtlMs = 300)
    try {
      val client = HttpClient.newHttpClient()
      assert(client.send(
        HttpRequest.newBuilder(URI.create(s"${ttld.url}/v1/process/async"))
          .header("X-Numaflow-Id", "gone")
          .POST(HttpRequest.BodyPublishers.ofString("x")).build(),
        HttpResponse.BodyHandlers.ofString()).statusCode() === 200)
      val deadline = System.currentTimeMillis() + 5000
      var resp: HttpResponse[String] = null
      while ({
        resp = client.send(
          HttpRequest.newBuilder(URI.create(s"${ttld.url}/v1/fetch?id=gone"))
            .GET().build(), HttpResponse.BodyHandlers.ofString())
        !resp.body().contains("expired") && System.currentTimeMillis() < deadline
      }) Thread.sleep(50)
      assert(resp.statusCode() === 404)
      assert(resp.body().contains("expired"))
    } finally ttld.close()
  }
}
