package graft

import java.nio.file.Files
import java.sql.Timestamp
import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.model.Tags
import graft.streaming.{Nack, Sinks, UdSource}
import graft.streaming.UdSource.MemoryGraftSource

/** Redrive e2e (reference `test/redrive-e2e`): messages a broken stage
  * NACKed into the DLQ are re-driven through the pipeline once the stage
  * is fixed, and the end state equals a run where the stage never broke.
  */
class RedriveSpec extends SparkSpec {

  /** One pipeline instance: a flaky stage NACKs payloads starting with
    * "b" while `broken` is true; exhausted rows park in the DLQ. */
  private final class Fixture(val broken: () => Boolean) {
    val name = s"redrive-${java.util.UUID.randomUUID()}"
    val source = new MemoryGraftSource(1)
    UdSource.register(name, source)
    val delivered = mutable.Buffer.empty[(String, Map[String, String])]
    val dlqRows = mutable.Buffer.empty[Row]
    @volatile var dlqSchema: org.apache.spark.sql.types.StructType = _

    private val deliver: Sinks.Writer = (b, _) => {
      val rows = b.select(col("value").cast("string"), col("headers")).collect()
      delivered.synchronized {
        delivered ++= rows.map(r => (r.getString(0),
          r.getAs[scala.collection.Map[String, String]](1).toMap))
      }
    }
    private val dlq: Sinks.Writer = (b, _) => {
      val sel = b.select(col("keys"), col("value"), col("eventTime"), col("headers"))
      dlqSchema = sel.schema
      dlqRows.synchronized { dlqRows ++= sel.collect() }
    }
    private val writer = Nack.redeliveryWriter(source,
      Nack.NackOptions(delayMs = 0, maxDeliveries = 2), deliver, dlq)

    val query = UdSource.readStream(spark, name)
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("redrive").toString)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], id: Long) =>
        val failNow = broken()
        val tagged = batch.toDF().withColumn("tags",
          when(lit(failNow) && col("value").cast("string").startsWith("b"),
            array(lit(Tags.Nack)))
            .otherwise(array().cast("array<string>")))
        writer(tagged, id)
      }.start()

    def feed(values: Seq[String]): Unit = {
      val ts = new Timestamp(1704067200000L)
      values.zipWithIndex.foreach { case (v, i) =>
        source.append(Seq(s"k$i"), v.getBytes("UTF-8"), ts)
      }
      query.processAllAvailable()
      query.processAllAvailable() // loopback redeliveries land as new batches
    }

    def dlqFrame: DataFrame = {
      val rows = dlqRows.synchronized(dlqRows.toList)
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), dlqSchema)
    }

    def close(): Unit = { query.stop(); UdSource.unregister(name) }
  }

  test("redrive e2e: DLQ'd rows re-driven after the fix match the clean run") {
    val inputs = Seq("a1", "b1", "a2", "b2", "a3")

    // oracle: the identical pipeline with the stage never broken
    val clean = new Fixture(() => false)
    // subject: stage broken during the first feed
    var brokenNow = true
    val flaky = new Fixture(() => brokenNow)
    try {
      clean.feed(inputs)
      val oracle = clean.delivered.synchronized(clean.delivered.map(_._1).sorted)
      assert(oracle === inputs.sorted)

      flaky.feed(inputs)
      assert(flaky.delivered.synchronized(flaky.delivered.map(_._1).sorted)
        === Seq("a1", "a2", "a3"), "failing rows must not be delivered")
      assert(flaky.dlqRows.synchronized(flaky.dlqRows.size) === 2,
        "both b-rows exhaust maxDeliveries=2 and park in the DLQ")

      // the fix lands; re-drive the parked rows through the same pipeline
      brokenNow = false
      assert(Nack.redrive(flaky.dlqFrame, flaky.source) === 2)
      flaky.query.processAllAvailable()

      val after = flaky.delivered.synchronized(flaky.delivered.toList)
      assert(after.map(_._1).sorted === oracle,
        "redriven end state must equal the never-failed run")
      // provenance: redriven rows are stamped and their delivery count reset
      val redriven = after.filter(_._2.contains(Nack.RedriveHeader))
      assert(redriven.map(_._1).sorted === Seq("b1", "b2"))
      assert(redriven.forall(!_._2.contains(Nack.DeliveryHeader)),
        "redrive is a fresh attempt: the old delivery count must not carry over")
    } finally { clean.close(); flaky.close() }
  }
}
