package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.Relational
import graft.streaming.TemporalJoin

/** Composition law across the warehouse and streaming halves: the LIVE
  * temporal join emits exactly what the batch pipeline — SCD2 interval
  * build over the same change stream, then an interval probe — would
  * answer for every fact. One semantics, two execution paths: the
  * interval table is the queryable HISTORY artifact, the temporal join
  * is the same answer at ingest time, and this spec pins that they can
  * never drift apart. */
class PipelineComposeSpec extends SparkSpec {
  import spark.implicits._

  private def t(min: Int): Timestamp = ts(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  // seeded random change stream + facts over 3 keys, 4 hours
  private val rnd = new scala.util.Random(11)
  private val dims: Seq[(String, Timestamp, String)] =
    (for (k <- Seq("a", "b", "c"); v <- 1 to 4)
      yield (k, t(rnd.nextInt(240)), s"$k-v$v")).distinct
  private val facts: Seq[(String, Timestamp, Double)] =
    (1 to 40).map(i => (Seq("a", "b", "c", "d")(rnd.nextInt(4)),
      t(rnd.nextInt(240)), i.toDouble))

  test("stream temporal join ≡ SCD2 intervals + batch interval probe") {
    // batch half: change stream → type-2 intervals → interval probe
    val intervals = Relational.scd2(
      dims.toDF("k", "ts", "dv"),
      Seq("k"), "ts", Seq("dv"), Seq(col("ts"), col("dv")))
    val f = facts.toDF("k", "ts", "fv")
    val batch = f.join(intervals.withColumnRenamed("k", "dk"),
        col("k") === col("dk") && col("ts") >= col("valid_from") &&
          (col("valid_to").isNull || col("ts") < col("valid_to")),
        "left")
      .select(col("k"), col("ts"), col("fv"), col("dv"))
      .as[(String, Timestamp, Double, Option[String])].collect().toSet

    // streaming half: the same two inputs as live streams
    implicit val ctx = spark.sqlContext
    val fIn = MemoryStream[(String, Timestamp, Double)]
    val dIn = MemoryStream[(String, Timestamp, String)]
    val q = TemporalJoin.enrich(
        fIn.toDF().toDF("k", "t", "fv"), dIn.toDF().toDF("k", "t", "dv"),
        "k", "t", "fv", "dv", delay = "6 hours")
      .writeStream.format("memory").queryName("compose_out")
      .outputMode("append").start()
    try {
      dims.grouped(5).zipAll(facts.grouped(9), Nil, Nil).foreach {
        case (db, fb) =>
          if (db.nonEmpty) dIn.addData(db: _*)
          if (fb.nonEmpty) fIn.addData(fb: _*)
          q.processAllAvailable()
      }
      fIn.addData(("__flush", ts("2024-01-02 00:00:00"), 0.0))
      dIn.addData(("__flush", ts("2024-01-02 00:00:00"), "x"))
      q.processAllAvailable()
      fIn.addData(("__flush2", ts("2024-01-03 00:00:00"), 0.0))
      dIn.addData(("__flush2", ts("2024-01-03 00:00:00"), "x"))
      q.processAllAvailable()
      val live = spark.table("compose_out")
        .where(!col("k").startsWith("__flush"))
        .as[(String, Timestamp, Double, Option[String])].collect().toSet
      assert(live === batch,
        s"missingInLive=${batch -- live} extraInLive=${live -- batch}")
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS compose_out")
    }
  }
}
