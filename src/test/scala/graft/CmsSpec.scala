package graft

import org.apache.spark.sql.functions._

/** Count–Min sketch: one-sided error (estimate never under-counts),
  * bounded sketch size, and build determinism. */
class CmsSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Sketches

  private def items = {
    // zipfish multiset: item i appears ~ 200/i times
    val xs = (1 to 60).flatMap(i => Seq.fill(200 / i)(s"tok$i"))
    xs.toDF("item")
  }

  test("estimate >= exact for every item (one-sided error)") {
    val df = items
    val sketch = Sketches.cmsSketch(df, col("item"))
    val exact = df.groupBy("item").agg(count(lit(1)).as("exact"))
    val est = Sketches.cmsEstimate(exact.select("item"), sketch)
    val bad = est.join(exact, "item").where(col("est") < col("exact")).count()
    assert(bad == 0L)
  }

  test("sketch is bounded by depth x width cells") {
    val sketch = Sketches.cmsSketch(items, col("item"))
    assert(sketch.count() <= Sketches.CmsDepth.toLong * Sketches.CmsWidth)
    // every cell count is positive and rows/cols are in range
    val offRange = sketch.where(col("r") < 0 || col("r") >= Sketches.CmsDepth ||
      col("c") < 0 || col("c") >= Sketches.CmsWidth || col("cnt") <= 0).count()
    assert(offRange == 0L)
  }

  test("two independent builds produce identical sketches") {
    val a = Sketches.cmsSketch(items, col("item")).collect().toSet
    val b = Sketches.cmsSketch(items.repartition(7), col("item")).collect().toSet
    assert(a == b)
  }

  test("windowed sketch on a stream equals the batch sketch") {
    // expression-only cells → the sketch builds inside a streaming
    // windowed aggregation unchanged (the hllMd5-on-streams pattern).
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val cells = in.toDF().toDF("ts", "item")
      .withWatermark("ts", "0 seconds")
      .select(col("ts"), posexplode(array(
        (0 until Sketches.CmsDepth).map(r => Sketches.cmsCell(r, col("item"))): _*))
        .as(Seq("r", "c")))
      .groupBy(window(col("ts"), "60 seconds"), col("r"), col("c"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("w"), col("r"), col("c"), col("cnt"))
    val q = cells.writeStream.format("memory").queryName("cms_win")
      .outputMode("append").start()
    try {
      val toks = (1 to 20).flatMap(i => Seq.fill(40 / i)(s"tok$i"))
      in.addData(toks.map(t => (ts("2024-01-01 00:00:30"), t)): _*)
      q.processAllAvailable()
      in.addData((ts("2024-01-01 00:10:00"), "closer"))
      q.processAllAvailable()
      val got = spark.table("cms_win")
        .where(col("w") === ts("2024-01-01 00:00:00"))
        .select("r", "c", "cnt").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      val want = Sketches.cmsSketch(toks.toDF("item"), col("item")).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want && got.nonEmpty)
    } finally q.stop()
  }
}
