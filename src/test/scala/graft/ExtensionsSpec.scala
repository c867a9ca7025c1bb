package graft

import org.apache.spark.sql.functions._
import graft.model.Pipeline._
import graft.ops.Routing.TagCondition
import graft.streaming.{Compiler, Sinks}

/** SQL-function registration for native expressions, and the streaming
  * end-to-end of the compiled even-odd pipeline through the single-pass
  * router sink (the streaming twin of PipelineCompilerSpec). */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine_similarity registers as a SQL function") {
    val (id, info, builder) = GraftExtensions.cosineSimilarity
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    val sim = spark.sql(
      """SELECT cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS s"""
    ).as[Double].collect().head
    assert(sim === 1.0)
    // analysis error surface: wrong arity is rejected
    intercept[Exception] {
      spark.sql("SELECT cosine_similarity(array(1.0d))").collect()
    }
  }

  test("multiset_intersect and sorted_array_contains register for SQL") {
    Seq(GraftExtensions.multisetIntersect,
        GraftExtensions.sortedArrayContains).foreach {
      case (id, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    val row = spark.sql(
      """SELECT multiset_intersect(array(1L, 1L, 2L), array(1L, 1L, 3L)) AS m,
        |  sorted_array_contains(array('a', 'b', 'c'), 'b') AS hit,
        |  sorted_array_contains(array('a', 'b', 'c'), 'z') AS miss"""
        .stripMargin).collect().head
    assert(row.getLong(0) === 2L)
    assert(row.getBoolean(1) && !row.getBoolean(2))
  }

  test("round-12 native kernels register for SQL") {
    Seq(GraftExtensions.wordShingles, GraftExtensions.ngramClip,
        GraftExtensions.charBigramClip, GraftExtensions.hilbertIndex).foreach {
      case (id, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    val row = spark.sql(
      """SELECT word_shingles('a b c', 2) AS sh,
        |  ngram_clip(array('a', 'b', 'a'), array('a', 'a', 'c'), 1) AS nc,
        |  char_bigram_clip('banana', 'ananas') AS cb,
        |  hilbert_index(0L, 1L, 8) AS h""".stripMargin).collect().head
    assert(row.getSeq[String](0) === Seq("a b", "b c"))
    assert(row.getLong(1) === 2L)   // 'a' clips at min(2,2)
    assert(row.getLong(2) === 4L)   // an,na,an,na vs an,na,an,as
    assert(row.getLong(3) ===
      graft.functions.HilbertIndex.compute(0L, 1L, 8)) // SQL ≡ kernel
    // non-literal width is rejected at registration-builder level
    intercept[Exception] {
      spark.sql("SELECT word_shingles('a b', CAST(2 AS INT) + 0)").collect()
    }
  }

  test("scalar training functions register for pure-SQL users") {
    GraftExtensions.composites.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    val row = spark.sql(
      """SELECT lang_id('the cat and the dog of a house') AS lang,
        |  token_count('a b c') AS n,
        |  redact_pii('mail me at x@y.com now') AS clean,
        |  repetition_score('a a a b') AS rep,
        |  unit_hash('42') AS u,
        |  rolling_hash('ab') AS rh,
        |  quality_score('some plain words here') AS q""".stripMargin).collect().head
    assert(row.getString(0) === "en")
    assert(row.getLong(1) === 3L)
    assert(row.getString(2) === "mail me at <EMAIL> now")
    assert(row.getDouble(3) === 0.5)
    assert(row.getDouble(4) >= 0.0 && row.getDouble(4) < 1.0)
    assert(row.getLong(5) === (97L * 31 + 98) % 1000000007)
    assert(row.getDouble(6) > 0.0 && row.getDouble(6) < 1.0)
  }

  test("r14 native kernels register for SQL: gopher, poisson draws, " +
      "squared distances, and the KMV aggregate") {
    Seq(GraftExtensions.gopherRepetition, GraftExtensions.poissonDrawWeights,
        GraftExtensions.squaredDistances, GraftExtensions.kmvDistinct).foreach {
      case (id, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    val row = spark.sql(
      """SELECT gopher_repetition('a b a b a b', 2) AS g,
        |  poisson_draw_weights('seed', 4) AS pw,
        |  squared_distances(array(1.0d, 0.0d),
        |    array(array(0.0d, 0.0d), array(1.0d, 0.0d))) AS sq"""
        .stripMargin).collect().head
    // SQL results ≡ the Column-level kernels the DataFrame queries use
    import org.apache.spark.sql.graftcompat.ColumnCompat
    val colRow = spark.range(1).select(ColumnCompat.column(
        graft.functions.GopherRepetition(ColumnCompat.resolvedExpression(
          org.apache.spark.sql.functions.lit("a b a b a b")), 2)).as("g"))
      .collect().head
    assert(row.getStruct(0).toSeq.nonEmpty)
    assert(row.getStruct(0).toSeq === colRow.getStruct(0).toSeq)
    assert(row.getSeq[Int](1).length === 4)
    assert(row.getSeq[Double](2) === Seq(1.0, 0.0))
    // the aggregate: exact below k, registered through the analyzer's
    // AggregateFunction wrapping
    val est = spark.sql(
      """SELECT kmv_distinct(CAST(conv(substring(md5(CAST(id AS STRING)), 1, 8),
        |  16, 10) AS BIGINT), 128) AS d
        |FROM range(0, 100)""".stripMargin).collect().head.getLong(0)
    assert(est === 100L)
    // the natural SQL spelling parses as DECIMAL literals — the builder
    // must cast, not die in toDoubleArray with a ClassCastException
    val dec = spark.sql(
      "SELECT squared_distances(array(1.0d, 0.0d), array(array(0.5, 0.0)))")
      .collect().head.getSeq[Double](0)
    assert(dec === Seq(0.25))
    // non-foldable centroid matrix is rejected loudly
    intercept[Exception] {
      spark.sql("""SELECT squared_distances(array(1.0d),
        array(array(CAST(rand() AS DOUBLE))))""").collect()
    }
  }

  test("streaming even-odd pipeline routes through the foreachBatch router") {
    implicit val ctx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, String, Long)]
    val spec = PipelineSpec(
      vertices = Seq(
        SourceV("in", in.toDF().toDF("ts", "key", "value"), "ts"),
        MapV("tagger", df => df.withColumn("tags",
          array(when(col("value") % 2 === 0, "even").otherwise("odd")))),
        SinkV("out")),
      edges = Seq(Edge("in", "tagger"), Edge("tagger", "out")))

    val evens = scala.collection.mutable.ArrayBuffer.empty[Long]
    val odds = scala.collection.mutable.ArrayBuffer.empty[Long]
    val router = Sinks.routerForeachBatch(Seq(
      Some(TagCondition(Seq("even"))) ->
        ((df, _: Long) => evens ++= df.select("value").as[Long].collect()),
      Some(TagCondition(Seq("odd"))) ->
        ((df, _: Long) => odds ++= df.select("value").as[Long].collect())))

    val q = Compiler.compile(spec)("out")
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("router").toString)
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                     id: Long) => router(b.toDF(), id))
      .start()
    try {
      in.addData(
        (ts("2024-01-01 00:00:01"), "k", 1L),
        (ts("2024-01-01 00:00:02"), "k", 2L),
        (ts("2024-01-01 00:00:03"), "k", 3L),
        (ts("2024-01-01 00:00:04"), "k", 4L))
      q.processAllAvailable()
      assert(evens.sorted.toSeq === Seq(2L, 4L))
      assert(odds.sorted.toSeq === Seq(1L, 3L))
    } finally q.stop()
  }
}
