package graft

import org.apache.spark.sql.functions._
import graft.functions.BloomProbe

/** The native bloom probe: agrees with the library filter row for row,
  * keeps null semantics, and stays inside whole-stage codegen — the
  * properties that let `Dedup.bloomIncrementalSpans` prefilter a 100 TB
  * crawl map-side without a UDF boundary. */
class BloomProbeSpec extends SparkSpec {
  import spark.implicits._

  private def buildFilter(items: Seq[Long]) = {
    val bf = org.apache.spark.util.sketch.BloomFilter.create(1000, 0.01)
    items.foreach(bf.putLong)
    spark.sparkContext.broadcast(bf)
  }

  test("probe agrees with BloomFilter.mightContainLong on hits and misses") {
    val members = (1L to 200L).map(_ * 7)
    val bc = buildFilter(members)
    val probed = spark.range(1, 2000)
      .select(col("id"), BloomProbe(col("id"), bc).as("hit"))
      .as[(Long, Boolean)].collect()
    probed.foreach { case (id, hit) =>
      assert(hit === bc.value.mightContainLong(id), s"disagreement at $id")
    }
    // no false negatives: every member probes true
    val hits = probed.toMap
    members.filter(_ < 2000).foreach(m => assert(hits(m), s"false negative $m"))
  }

  test("null input probes null, not false") {
    val bc = buildFilter(Seq(1L))
    val out = Seq(Some(1L), None).toDF("h")
      .select(BloomProbe(col("h"), bc).as("hit"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0))
    assert(out(0) === true)
    assert(out(1) === null)
  }

  test("probe filter stays inside whole-stage codegen") {
    val bc = buildFilter((1L to 50L).toSeq)
    val df = spark.range(1000)
      .where(BloomProbe(xxhash64(col("id")), bc))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Filter"), s"probe fell out of codegen:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("UDF"), plan)
    df.count() // and it executes
  }
}
