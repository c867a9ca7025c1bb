package graft

import org.apache.spark.sql.functions._

/** File-skipping index: a Z-ordered layout + per-file min/max manifest
  * must answer box queries from a strict subset of files, with results
  * identical to the full-scan filter. */
class FileIndexSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Scale

  private def grid = {
    // 64x64 integer grid, one row per cell
    val n = 64
    spark.range(n.toLong * n).select(
      (col("id") % n).as("a"), expr(s"id DIV $n").as("b"), col("id").as("v"))
  }

  test("z-ordered layout + index answers a box from a subset of files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fidx").toString + "/t"
    try {
      Scale.writeZOrdered(grid, dir, "a", "b", bits = 6, files = 16)
      Scale.writeFileIndex(spark, dir, Seq("a", "b"))
      val (rows, read, total) = Scale.prunedRead(spark, dir,
        Seq(("a", 4L, 11L), ("b", 4L, 11L)))
      assert(total == 16)
      assert(read < total, s"expected pruning, read $read/$total")
      val got = rows.select("a", "b", "v").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = grid.where(col("a").between(4, 11) && col("b").between(4, 11))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want && got.size == 64)
    } finally rmdirAll(new java.io.File(new java.io.File(dir).getParent))
  }

  test("streaming indexed sink keeps the manifest current; replay converges") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_isink").toString
    val dir = base + "/t"
    val in = MemoryStream[(Long, Long)]
    val sink = graft.streaming.Sinks.indexedParquetSink(dir, Seq("a"))
    val q = in.toDF().toDF("a", "v").writeStream
      .option("checkpointLocation", base + "/ck")
      .foreachBatch(sink).start()
    try {
      in.addData((1L to 50L).map(i => (i, i * 10)): _*)
      q.processAllAvailable()
      in.addData((100L to 150L).map(i => (i, i * 10)): _*)
      q.processAllAvailable()
      // the index covers both batches; a box over batch 2 only prunes
      val (rows, read, total) = Scale.prunedRead(spark, dir, Seq(("a", 100L, 150L)))
      assert(read < total, s"expected pruning, read $read/$total")
      assert(rows.count() === 51L)
      // a checkpoint replay of batch 0 rewrites its partition in place
      // (possibly with a different file split); data and index must stay
      // CONSISTENT: one index row per live data file, query results
      // unchanged, no duplicate rows
      sink((1L to 50L).map(i => (i, i * 10)).toDF("a", "v"), 0L)
      val dataFiles = new java.io.File(dir + "/batchId=0").listFiles()
        .count(_.getName.endsWith(".parquet"))
      val idxBatch0 = spark.read.parquet(dir + "_index")
        .where(col("file").contains("batchId=0")).count()
      assert(idxBatch0 === dataFiles.toLong, s"index rows $idxBatch0 vs files $dataFiles")
      assert(Scale.prunedRead(spark, dir, Seq(("a", 100L, 150L)))._1.count() === 51L)
      assert(Scale.prunedRead(spark, dir, Seq(("a", 1L, 50L)))._1.count() === 50L)
    } finally { q.stop(); rmdirAll(new java.io.File(base)) }
  }

  test("a box outside the domain reads zero files and zero rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fidx2").toString + "/t"
    try {
      Scale.writeZOrdered(grid, dir, "a", "b", bits = 6, files = 8)
      Scale.writeFileIndex(spark, dir, Seq("a", "b"))
      val (rows, read, _) = Scale.prunedRead(spark, dir, Seq(("a", 1000L, 2000L)))
      assert(read == 0 && rows.count() == 0L)
    } finally rmdirAll(new java.io.File(new java.io.File(dir).getParent))
  }

  test("pruning is sound under a single-column stripe predicate too") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fidx3").toString + "/t"
    try {
      Scale.writeZOrdered(grid, dir, "a", "b", bits = 6, files = 16)
      Scale.writeFileIndex(spark, dir, Seq("a", "b"))
      val (rows, read, total) = Scale.prunedRead(spark, dir, Seq(("b", 0L, 7L)))
      assert(read < total)
      assert(rows.count() == 64L * 8)
    } finally rmdirAll(new java.io.File(new java.io.File(dir).getParent))
  }
}
