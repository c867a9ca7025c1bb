package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.Scale
import graft.streaming.Sinks

/** Scale tooling: co-located bucketed joins (no exchange), skew salting
  * (same result, spread keys), stream-stream interval joins (SURVEY §2.9
  * streaming analog), and batchId-idempotent file output. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join plans with no shuffle exchange on either side") {
    // default warehouse dir (spark-warehouse/, gitignored); fresh tables —
    // drop catalog entries AND stale locations from previous JVMs
    Seq("b_orders", "b_items").foreach(dropLocalTable)
    val orders = (1L to 100L).map(i => (i, s"o$i")).toDF("id", "o")
    val items = (1L to 300L).map(i => (i % 100 + 1, s"i$i")).toDF("id", "i")
    Scale.writeBucketed(orders, "b_orders", buckets = 4, keyCols = Seq("id"),
      sortCols = Seq("id"))
    Scale.writeBucketed(items, "b_items", buckets = 4, keyCols = Seq("id"),
      sortCols = Seq("id"))

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Scale.bucketedJoin(spark, "b_orders", "b_items", Seq("id"))
      assert(joined.count() === 300)
      val physical = joined.queryExecution.executedPlan.toString
      assert(physical.contains("SortMergeJoin"))
      assert(!physical.contains("ShuffleExchange") &&
        !physical.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$physical")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("incremental dedup against a bucketed signature table: settled side never shuffles") {
    import graft.ops.Dedup
    dropLocalTable("b_sigs")

    // settled corpus: clusters of identical docs so increments collide
    val existing = (1 to 60)
      .map(i => (i.toLong, s"alpha beta gamma delta epsilon zeta ${i % 7}"))
      .toDF("doc_id", "text")
    Dedup.writeSignatureTable(existing, "doc_id", "text", "b_sigs", buckets = 4)

    val incoming = (1 to 3)
      .map(i => (1000L + i, s"alpha beta gamma delta epsilon zeta $i"))
      .toDF("doc_id", "text")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val fromTable = Dedup.incrementalDupPairsFromTable(
        spark, "b_sigs", incoming, "doc_id", "text")
      // semantics identical to the recompute-both-sides form
      val direct = Dedup.incrementalDupPairs(existing, incoming, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = fromTable.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === direct)
      assert(got.nonEmpty) // the colliding clusters actually matched
      // plan shape: recomputing both sides shuffles twice before the join
      // (+1 for distinct); the bucketed settled side eliminates exactly
      // one of those exchanges — only the increment and distinct move.
      def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
        df.count()
        "Exchange hashpartitioning".r
          .findAllIn(df.queryExecution.executedPlan.toString).length
      }
      val bucketed = exchanges(Dedup.incrementalDupPairsFromTable(
        spark, "b_sigs", incoming, "doc_id", "text"))
      val recompute = exchanges(
        Dedup.incrementalDupPairs(existing, incoming, "doc_id", "text"))
      assert(bucketed === recompute - 1,
        s"settled side must read co-located: bucketed=$bucketed recompute=$recompute")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("contamination against a bucketed fingerprint table: settled side never shuffles") {
    import graft.ops.TextAnalysis
    dropLocalTable("b_fps")

    // settled benchmark corpus; incoming docs quote 4-token runs of it
    val bench = (1 to 30)
      .map(i => (i.toLong, s"alpha$i beta$i gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    TextAnalysis.writeFingerprintTable(bench, "doc_id", "text", "b_fps",
      buckets = 4)

    // detection is guaranteed for shared runs >= k + w - 1 = 7 tokens,
    // so the quoting doc embeds a full 8-token bench doc.
    val incoming = Seq(
      (1001L, "intro alpha5 beta5 gamma delta epsilon zeta eta theta outro"),
      (1002L, "entirely novel content nothing shared with anything"))
      .toDF("doc_id", "text")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val fromTable = TextAnalysis.contaminatedFromTable(
        spark, "b_fps", incoming, "doc_id", "text")
      // semantics identical to recomputing both sides
      val direct = TextAnalysis.winnow(incoming, "doc_id", "text")
        .select(col("doc_id").as("new_id"), col("fp"))
        .join(TextAnalysis.winnow(bench, "doc_id", "text")
          .select(col("doc_id").as("bench_id"), col("fp")), Seq("fp"))
        .select("new_id", "bench_id").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = fromTable.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === direct)
      assert(got.nonEmpty && got.forall(_._1 == 1001L),
        s"quoting doc flags, novel doc clean: $got")
      def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
        df.count()
        "Exchange hashpartitioning".r
          .findAllIn(df.queryExecution.executedPlan.toString).length
      }
      val bucketed = exchanges(TextAnalysis.contaminatedFromTable(
        spark, "b_fps", incoming, "doc_id", "text"))
      val recompute = exchanges(
        TextAnalysis.winnow(incoming, "doc_id", "text")
          .select(col("doc_id").as("new_id"), col("fp"))
          .join(TextAnalysis.winnow(bench, "doc_id", "text")
            .select(col("doc_id").as("bench_id"), col("fp")), Seq("fp"))
          .select("new_id", "bench_id").distinct())
      assert(bucketed === recompute - 1,
        s"settled side must read co-located: bucketed=$bucketed recompute=$recompute")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bloom incremental against a bucketed span table + sidecar: settled side never shuffles") {
    import graft.ops.Dedup
    dropLocalTable("b_spans")
    val bloomPath = java.nio.file.Files
      .createTempFile("b_spans_bloom", ".bin").toString

    val mk = (tag: String) => (1 to 15).map(i => s"w$i$tag").mkString(" ")
    val existing = (1 to 40)
      .map(i => (i.toLong, mk(s"c${i % 5}") + s" tail$i"))
      .toDF("doc_id", "text")
    Dedup.writeSpanTable(existing, "doc_id", "text", "b_spans",
      buckets = 4, bloomPath = bloomPath)

    val incoming = Seq(
      (1001L, mk("c1") + " novel continuation"), // collides with cluster 1
      (1002L, mk("zz"))                          // clean
    ).toDF("doc_id", "text")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val fromTable = Dedup.bloomIncrementalSpansFromTable(
        spark, "b_spans", bloomPath, incoming, "doc_id", "text")
      val direct = Dedup.bloomIncrementalSpans(existing, incoming, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = fromTable.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === direct)
      assert(got.nonEmpty && got.forall(_._1 == 1001L),
        s"colliding doc flags, clean doc passes: $got")
      def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
        df.count()
        "Exchange hashpartitioning".r
          .findAllIn(df.queryExecution.executedPlan.toString).length
      }
      val bucketed = exchanges(Dedup.bloomIncrementalSpansFromTable(
        spark, "b_spans", bloomPath, incoming, "doc_id", "text"))
      val recompute = exchanges(
        Dedup.bloomIncrementalSpans(existing, incoming, "doc_id", "text"))
      assert(bucketed === recompute - 1,
        s"settled side must read co-located: bucketed=$bucketed recompute=$recompute")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("crawl admission extends the settled artifacts batch over batch") {
    import graft.ops.Dedup
    dropLocalTable("a_spans")
    val bloomPath = java.nio.file.Files
      .createTempFile("a_spans_bloom", ".bin").toString

    val mk = (tag: String) => (1 to 15).map(i => s"w$i$tag").mkString(" ")
    val settled = (1 to 10)
      .map(i => (i.toLong, mk("orig") + s" tail$i")).toDF("doc_id", "text")
    Dedup.writeSpanTable(settled, "doc_id", "text", "a_spans",
      buckets = 4, bloomPath = bloomPath)

    // batch 1: one doc collides with the original corpus, one is novel,
    // and one repeats the novel doc WITHIN the batch (crawler re-emit) —
    // only the smallest novel id may settle.
    val b1 = Seq(
      (2001L, mk("novel") + " first appearance"),
      (2002L, mk("orig") + " replica"),
      (2003L, mk("novel") + " re-emitted copy")).toDF("doc_id", "text")
    val c1 = Dedup.admitCrawl(spark, "a_spans", bloomPath, b1, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(c1.exists(_._1 == 2002L), s"settled collision missing: $c1")
    assert(c1.contains((2003L, 2001L)), s"within-batch dup missing: $c1")
    assert(!c1.exists(_._1 == 2001L), s"the admitted doc must not pair: $c1")

    // batch 2: collides with the doc ADMITTED in batch 1 — the artifacts
    // grew; and the replica of the batch-1 duplicate still collides with
    // the originals only (2002 was rejected, never admitted).
    val b2 = Seq(
      (3001L, mk("novel") + " second sighting"),
      (3002L, mk("fresh"))).toDF("doc_id", "text")
    val c2 = Dedup.admitCrawl(spark, "a_spans", bloomPath, b2, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(c2 === Set((3001L, 2001L)),
      s"batch2 must collide with the batch-1 admission: $c2")
  }

  test("z-order layout: every file bounds BOTH dimensions, not one stripe axis") {
    import graft.ops.Scale
    // full 64x64 grid — a clean null model (TPC-H part/supp keys are
    // correlated, which already bounds b under an a-stripe layout)
    val li = spark.range(64L * 64L)
      .select(pmod(col("id"), lit(64L)).as("a"),
        (col("id") / 64L).cast("long").as("b"))
    def avgSpanB(path: String): Double = {
      val files = new java.io.File(path).listFiles
        .filter(f => f.getName.endsWith(".parquet")).map(_.toString)
      val spans = files.map { f =>
        val r = spark.read.parquet(f).agg(min("b"), max("b")).head
        (r.getLong(1) - r.getLong(0) + 1).toDouble
      }
      spans.sum / spans.length
    }
    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString
    val sDir = java.nio.file.Files.createTempDirectory("astripe").toString
    Scale.writeZOrdered(li, zDir, "a", "b", bits = 6, files = 8)
    li.repartitionByRange(8, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(sDir) // single-dim layout baseline
    // sorting by `a` leaves every file spanning all of b (no pruning on
    // b); the z-curve bounds both dimensions per file.
    val zB = avgSpanB(zDir); val sB = avgSpanB(sDir)
    assert(sB > 48.0, s"baseline stripe should span ~all of b, got $sB")
    assert(zB < sB / 1.5, s"z-order must bound b per file: z=$zB stripe=$sB")
  }

  test("compaction collapses a many-file directory, preserving every row") {
    import graft.ops.Scale
    val tiny = java.nio.file.Files.createTempDirectory("tinyfiles").toString
    val out = java.nio.file.Files.createTempDirectory("compacted").toString
    // simulate a fine-grained streaming sink: 64 single-row-group files
    spark.range(10000).repartition(64).write.mode("overwrite").parquet(tiny)
    val before = spark.read.parquet(tiny)
    val (nBefore, nAfter) = Scale.compact(spark, tiny, out,
      targetBytes = 512 * 1024)
    assert(nBefore === 64)
    assert(nAfter < 8, s"expected a handful of files, got $nAfter")
    val after = spark.read.parquet(out)
    assert(after.count() === 10000)
    assert(before.except(after).count() === 0 && after.except(before).count() === 0)
  }

  test("compaction edge cases: empty dir is a no-op, missing dir fails with the path") {
    import graft.ops.Scale
    val empty = java.nio.file.Files.createTempDirectory("emptydir").toString
    assert(Scale.compact(spark, empty, empty + "_out", 1024) === ((0, 0)))
    val e = intercept[IllegalArgumentException] {
      Scale.compact(spark, "/nonexistent/path/xyz", "/tmp/never", 1024)
    }
    assert(e.getMessage.contains("/nonexistent/path/xyz"))
  }

  test("salted join returns exactly the unsalted result") {
    // heavy skew: 90% of big rows share one key
    val big = (1 to 1000).map(i => (if (i % 10 == 0) s"k$i" else "HOT", i))
      .toDF("key", "v")
    val small = Seq(("HOT", "h"), ("k10", "a"), ("k20", "b")).toDF("key", "w")

    val plain = big.join(small, Seq("key")).select("key", "v", "w")
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = Scale.saltedJoin(big, small, "key", saltFactor = 8)
      .select("key", "v", "w").collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.toSeq === plain.toSeq)
    assert(plain.length === 900 + 2) // 900 HOT matches + k10 + k20

    // the salt splits the hot key across buckets (it actually de-skews)
    val saltSpread = big.withColumn("__salt",
        pmod(xxhash64(big.columns.map(col): _*), lit(8)).cast("int"))
      .where(col("key") === "HOT").select("__salt").distinct().count()
    assert(saltSpread > 4, s"hot key only reached $saltSpread of 8 salt buckets")
  }

  test("salted join tolerates map columns and a pre-existing __salt column") {
    // xxhash64 raises AnalysisException on MapType — the salt hash must
    // skip unhashable columns, and a caller-owned __salt must not collide
    // with the internal salt column.
    val big = (1 to 200)
      .map(i => (if (i % 5 == 0) s"k$i" else "HOT", i, Map("m" -> i), i % 3))
      .toDF("key", "v", "attrs", "__salt")
    val small = Seq(("HOT", "h"), ("k5", "a")).toDF("key", "w")
    val plain = big.join(small, Seq("key")).select("key", "v", "w", "__salt")
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = Scale.saltedJoin(big, small, "key", saltFactor = 8)
      .select("key", "v", "w", "__salt").collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.toSeq === plain.toSeq)
    // caller's __salt column passes through untouched
    assert(salted.map(_.last.asInstanceOf[Int]).forall(s => s >= 0 && s < 3))

    // explicit disambiguators: only the named columns feed the hash
    val byDis = Scale.saltedJoin(big, small, "key", saltFactor = 8,
      disambiguators = Seq("v"))
      .select("key", "v", "w").collect().map(_.toSeq).sortBy(_.toString)
    assert(byDis.toSeq === plain.map(_.take(3)).toSeq)
  }

  test("salted join is deterministic across different input partition layouts") {
    // rand(seed) is seeded per PARTITION: the same row salts differently
    // when the input is repartitioned, breaking resumable-run determinism.
    // The xxhash64 salt is a pure row function — layout-independent.
    val rows = (1 to 400).map(i => (if (i % 4 == 0) s"k$i" else "HOT", i))
    val small = Seq(("HOT", "h"), ("k4", "a")).toDF("key", "w")
    def saltsOf(parts: Int) = Scale
      .saltedJoin(rows.toDF("key", "v").repartition(parts), small, "key", saltFactor = 8)
      .select("key", "v", "w").collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(saltsOf(2) === saltsOf(13))
    // and the salt assignment itself is identical, not just the result set
    def saltAssignment(parts: Int) = rows.toDF("key", "v").repartition(parts)
      .withColumn("__salt", pmod(xxhash64(col("key"), col("v")), lit(8)).cast("int"))
      .select("v", "__salt").as[(Int, Int)].collect().toMap
    assert(saltAssignment(2) === saltAssignment(13))
  }

  test("stream-stream interval join matches only within the time bound") {
    implicit val ctx = spark.sqlContext
    val imp = MemoryStream[(String, Timestamp)]
    val clk = MemoryStream[(String, Timestamp)]
    val joined = imp.toDF().toDF("ad", "impTs").withWatermark("impTs", "10 seconds")
      .join(
        clk.toDF().toDF("ad2", "clkTs").withWatermark("clkTs", "10 seconds"),
        expr("ad = ad2 AND clkTs BETWEEN impTs AND impTs + interval 1 minute"))
      .select("ad", "impTs", "clkTs")

    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      imp.addData(("a", ts("2024-01-01 00:00:00")), ("b", ts("2024-01-01 00:00:05")))
      clk.addData(
        ("a", ts("2024-01-01 00:00:30")),  // within 1 min of a's impression
        ("b", ts("2024-01-01 00:02:00")))  // outside b's bound -> no match
      q.processAllAvailable()
      imp.addData(("z", ts("2024-01-01 00:10:00"))) // advance watermarks
      clk.addData(("z", ts("2024-01-01 00:12:00")))
      q.processAllAvailable()
      val got = spark.table("ssj_out").select("ad").as[String].collect()
      assert(got.toSeq === Seq("a"))
    } finally q.stop()
  }

  test("idempotent parquet sink collapses a replayed batch") {
    val base = Files.createTempDirectory("idemsink").toString
    val sink = Sinks.idempotentParquetSink(base)
    val batch = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    sink(batch, 0L)
    sink(batch, 0L) // checkpoint replay of the SAME batch id
    sink(Seq((3L, "z")).toDF("id", "v"), 1L)
    val out = spark.read.parquet(base)
    assert(out.count() === 3) // not 5: replay overwrote its own partition
    assert(out.select("batchId").distinct().as[Long].collect().sorted.toSeq === Seq(0L, 1L))
  }
}
