package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.CorpusOps
import graft.streaming.StreamingReservoir

/** The streaming reservoir converges to the batch sampler's exact
  * selection regardless of how arrivals split into batches, duplicate
  * deliveries are no-ops, and settled groups stop emitting. */
class StreamingReservoirSpec extends SparkSpec {
  import spark.implicits._

  private val k = 3
  private val data: Seq[(String, Long)] =
    (0L until 40L).map(i => (s"src${i % 4}", i))

  private def finalReservoirs(batches: Seq[Seq[(String, Long)]]): Map[String, Seq[Long]] = {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val q = StreamingReservoir.perGroup(in.toDF().toDF("g", "id"), "g", "id", k)
      .writeStream.format("memory").queryName("res_out")
      .outputMode("update").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      // last emission per group wins (update mode re-emits on change)
      spark.table("res_out").withColumn("seq", monotonically_increasing_id())
        .orderBy(col("seq"))
        .select("g", "sample").as[(String, Seq[String])].collect()
        .foldLeft(Map.empty[String, Seq[Long]]) { case (m, (g, s)) =>
          m + (g -> s.map(_.toLong)) }
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS res_out")
    }
  }

  test("stream converges to the batch sample under any batch split; dups are no-ops") {
    val batchSample = CorpusOps
      .samplePerGroup(data.toDF("g", "id"), "id", "g", k)
      .select("g", "id").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap

    // one big batch vs. shuffled small batches vs. replayed duplicates
    val oneShot = finalReservoirs(Seq(data))
    val shuffled = finalReservoirs(data.reverse.grouped(7).toSeq)
    val withDups = finalReservoirs(Seq(data.take(25), data, data.drop(20)))
    for (m <- Seq(oneShot, shuffled, withDups)) {
      assert(m.view.mapValues(_.sorted).toMap === batchSample)
    }
  }

  test("a settled group emits nothing on non-improving arrivals") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val q = StreamingReservoir.perGroup(in.toDF().toDF("g", "id"), "g", "id", k)
      .writeStream.format("memory").queryName("res_quiet")
      .outputMode("update").start()
    try {
      in.addData(data: _*); q.processAllAvailable()
      val n1 = spark.table("res_quiet").count()
      // replay everything: the reservoir cannot improve, so no emissions
      in.addData(data: _*); q.processAllAvailable()
      assert(spark.table("res_quiet").count() === n1)
    } finally q.stop()
  }
}
