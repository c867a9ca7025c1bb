package graft

import org.apache.spark.sql.functions._
import graft.model.Pipeline._
import graft.ops.Routing.TagCondition
import graft.streaming.Compiler

/** The reference's minimum end-to-end slice (SURVEY §7.1 step 3): even-odd
  * router → keyed fixed-window sum, as a compiled pipeline DAG — the batch
  * twin of examples/2-even-odd-pipeline.yaml + reduce-one-e2e. */
class PipelineCompilerSpec extends SparkSpec {
  import spark.implicits._

  private def eventsDf = Seq(
    // key, ts, value — two 60s windows, both parities
    ("k", ts("2024-01-01 00:00:10"), 1L),
    ("k", ts("2024-01-01 00:00:20"), 2L),
    ("k", ts("2024-01-01 00:00:30"), 3L),
    ("k", ts("2024-01-01 00:01:10"), 4L),
    ("k", ts("2024-01-01 00:01:20"), 5L)
  ).toDF("key", "ts", "value")

  private val spec = PipelineSpec(
    vertices = Seq(
      SourceV("in", eventsDf, "ts"),
      MapV("tagger", df => df.withColumn("tags",
        array(when(col("value") % 2 === 0, "even").otherwise("odd")))),
      ReduceV("sum_even", GroupBySpec(Fixed("60 seconds"), Seq("key"),
        Seq(sum(col("value")).as("total")))),
      ReduceV("sum_odd", GroupBySpec(Fixed("60 seconds"), Seq("key"),
        Seq(sum(col("value")).as("total")))),
      SinkV("out_even"), SinkV("out_odd")),
    edges = Seq(
      Edge("in", "tagger"),
      Edge("tagger", "sum_even", Some(TagCondition(Seq("even")))),
      Edge("tagger", "sum_odd", Some(TagCondition(Seq("odd")))),
      Edge("sum_even", "out_even"),
      Edge("sum_odd", "out_odd")))

  test("even-odd router -> fixed window sum (batch compile)") {
    val sinks = Compiler.compile(spec, streaming = false)
    val even = sinks("out_even").select("w_start", "total").as[(java.sql.Timestamp, Long)].collect().toMap
    val odd = sinks("out_odd").select("w_start", "total").as[(java.sql.Timestamp, Long)].collect().toMap
    assert(even === Map(ts("2024-01-01 00:00:00") -> 2L, ts("2024-01-01 00:01:00") -> 4L))
    assert(odd === Map(ts("2024-01-01 00:00:00") -> 4L, ts("2024-01-01 00:01:00") -> 5L))
  }

  test("fan-in union (diamond) takes both branches") {
    val diamond = PipelineSpec(
      vertices = Seq(
        SourceV("in", eventsDf, "ts"),
        MapV("a", df => df.withColumn("value", col("value") * 10)),
        MapV("b", df => df.withColumn("value", col("value") * 100)),
        ReduceV("sum", GroupBySpec(Fixed("1 hour"), Seq("key"),
          Seq(sum(col("value")).as("total")))),
        SinkV("out")),
      edges = Seq(
        Edge("in", "a"), Edge("in", "b"),
        Edge("a", "sum"), Edge("b", "sum"), Edge("sum", "out")))
    val total = Compiler.compile(diamond, streaming = false)("out")
      .select("total").as[Long].collect().head
    assert(total === 15 * 10 + 15 * 100)
  }

  test("duration folding: maxDelay + allowedLateness") {
    assert(Compiler.addDurations("30 seconds", "10 seconds") === "40000 milliseconds")
    assert(Compiler.addDurations("1 minute", "0 seconds") === "60000 milliseconds")
  }

  test("DROP-tagged messages never forward, even on unconditional edges") {
    import graft.model.Tags
    // a map vertex tags even values DROP; the unconditional edge to the
    // sink must not leak them (forward.rs discards before forwarding).
    val g = PipelineSpec(
      vertices = Seq(
        SourceV("in", eventsDf, "ts"),
        MapV("tagger", df => df.withColumn("tags",
          when(col("value") % 2 === 0, array(lit(Tags.Drop)))
            .otherwise(array().cast("array<string>")))),
        SinkV("out")),
      edges = Seq(Edge("in", "tagger"), Edge("tagger", "out")))
    val vals = Compiler.compile(g, streaming = false)("out")
      .select("value").as[Long].collect().sorted
    assert(vals === Array(1L, 3L, 5L), s"even values must be dropped: ${vals.toSeq}")
  }

  test("servingPaths derives reachable sinks, excluding DROP-only branches") {
    import graft.model.Tags
    // in -> router -> {fast, slow via hop, audit (DROP-only: dead),
    //                  maybe (or(DROP, x): live), inverted (not(DROP): live)}
    // plus an orphan sink with no path from the source.
    val g = PipelineSpec(
      vertices = Seq(
        SourceV("in", eventsDf, "ts"),
        MapV("router", df => df), MapV("hop", df => df),
        SinkV("fast"), SinkV("slow"), SinkV("audit"), SinkV("maybe"),
        SinkV("inverted"), SinkV("orphan")),
      edges = Seq(
        Edge("in", "router"),
        Edge("router", "fast"),
        Edge("router", "hop"), Edge("hop", "slow"),
        Edge("router", "audit", Some(TagCondition(Seq(Tags.Drop)))), // or(DROP): dead
        Edge("router", "maybe", Some(TagCondition(Seq(Tags.Drop, "x")))), // or(DROP,x): live
        Edge("router", "inverted", Some(TagCondition(Seq(Tags.Drop), "not"))))) // live
    assert(Compiler.servingPaths(g, "in") ===
      Set("fast", "slow", "maybe", "inverted"))
    // and(DROP, x) requires the discarded tag -> dead.
    val andDead = g.copy(edges = g.edges.map(e =>
      if (e.to == "maybe") e.copy(condition = Some(TagCondition(Seq(Tags.Drop, "x"), "and")))
      else e))
    assert(Compiler.servingPaths(andDead, "in") === Set("fast", "slow", "inverted"))
  }

  test("per-pipeline compression field maps to engine codecs (compression.rs analog)") {
    // builder-time map covers shuffle AND state store
    val zspec = spec.copy(compression = Zstd)
    assert(zspec.compression.conf === Map(
      "spark.io.compression.codec" -> "zstd",
      "spark.sql.streaming.stateStore.compression.codec" -> "zstd"))
    assert(Default.conf.isEmpty, "Default leaves engine codecs alone")
    // runtime application: the SQL conf takes effect on the live session
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.compression.codec")
    try {
      val applied = Compiler.applyCompression(spark, zspec)
      assert(spark.conf.get("spark.sql.streaming.stateStore.compression.codec") === "zstd")
      assert(applied.contains("spark.io.compression.codec"))
      // the compiled plans are unaffected by the codec choice
      val sinks = Compiler.compile(zspec, streaming = false)
      assert(sinks("out_even").count() > 0)
      // Default is a no-op application
      assert(Compiler.applyCompression(spark, spec).isEmpty)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.compression.codec", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.compression.codec")
      }
    }
  }
}
