package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.ViewMaintenance

case class AggCdc(k: Long, v: Int, op: String)

/** Streaming aggregate-view maintenance: partial bucket rewrites, group
  * death clearing, replay idempotence (double-apply would DOUBLE-COUNT,
  * unlike snapshot upserts), and stream ≡ recompute end to end. */
class ViewMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private val N = 8
  private val meas = Seq("s" -> col("v").cast("decimal(18,2)"))

  private def readView(dir: String): Map[Long, (Long, Double)] =
    ViewMaintenance.read(spark, dir)
      .map(_.select(col("k"), col("n"), col("s").cast("double"))
        .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap)
      .getOrElse(Map.empty)

  test("batches accumulate; deletes shrink; dead groups leave the view") {
    val dir = Files.createTempDirectory("vm1").toString + "/view"
    ViewMaintenance.applyBatch(dir,
      Seq(AggCdc(1, 10, "I"), AggCdc(1, 20, "I"), AggCdc(2, 5, "I")).toDF(),
      Seq("k"), "op", meas, N)
    assert(readView(dir) === Map(1L -> ((2L, 30.0)), 2L -> ((1L, 5.0))))
    ViewMaintenance.applyBatch(dir,
      Seq(AggCdc(1, 10, "D"), AggCdc(2, 5, "D"), AggCdc(3, 7, "I")).toDF(),
      Seq("k"), "op", meas, N)
    // group 2 died entirely; group 1 lost one row; group 3 was born
    assert(readView(dir) === Map(1L -> ((1L, 20.0)), 3L -> ((1L, 7.0))))
  }

  test("only touched buckets rewrite") {
    val dir = Files.createTempDirectory("vm2").toString + "/view"
    ViewMaintenance.applyBatch(dir,
      (1L to 64L).map(k => AggCdc(k, 1, "I")).toDF(), Seq("k"), "op", meas, N)
    val before = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("bucket=")).map(f => f.getName -> f.lastModified).toMap
    assert(before.size === N)
    Thread.sleep(1100) // mtime granularity
    ViewMaintenance.applyBatch(dir,
      Seq(AggCdc(1, 9, "I")).toDF(), Seq("k"), "op", meas, N)
    val touchedBucket = "bucket=" + spark.range(1)
      .select(graft.streaming.SnapshotCdc.bucketOf(lit("1"), N)).as[Long].head()
    val after = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("bucket=")).map(f => f.getName -> f.lastModified).toMap
    after.foreach { case (name, m) =>
      if (name == touchedBucket) assert(m > before(name), s"$name should rewrite")
      else assert(m === before(name), s"$name should be untouched")
    }
  }

  test("foreachBatch sink is exactly-once under replay, stream equals recompute") {
    val dir = Files.createTempDirectory("vm3").toString + "/view"
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[AggCdc]
    val q = in.toDS().toDF().writeStream
      .option("checkpointLocation", Files.createTempDirectory("vm3ck").toString)
      .foreachBatch(ViewMaintenance.sink(dir, Seq("k"), "op", meas, N))
      .start()
    try {
      in.addData(AggCdc(1, 10, "I"), AggCdc(2, 3, "I"))
      q.processAllAvailable()
      in.addData(AggCdc(1, 5, "I"), AggCdc(2, 3, "D"))
      q.processAllAvailable()
      assert(readView(dir) === Map(1L -> ((2L, 15.0))))
      // simulate an at-least-once redelivery of batch 1: direct call with
      // the same batchId must be a no-op (no double count)
      ViewMaintenance.sink(dir, Seq("k"), "op", meas, N)(
        Seq(AggCdc(1, 5, "I"), AggCdc(2, 3, "D")).toDF(), 1L)
      assert(readView(dir) === Map(1L -> ((2L, 15.0))))
    } finally q.stop()
  }
}
