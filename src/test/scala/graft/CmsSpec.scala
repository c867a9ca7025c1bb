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
}
