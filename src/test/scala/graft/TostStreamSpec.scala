package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.TostStream

/** Windowed TOST ≡ the batch stat_tost query (shared Stats.tost kernel,
  * zero tolerance on the frozen window), plus the decision laws: a
  * planted equivalent metric certifies, a shifted metric does not, and
  * a dead (zero-variance) metric yields nulls without failing the job. */
class TostStreamSpec extends SparkSpec {
  import spark.implicits._

  test("one frozen window reproduces every batch stat_tost row exactly") {
    val dir = sf()
    val batch = SparkEntry.queries("stat_tost")(spark, dir)
      .select(col("event_type").as("metric"), col("n0"), col("n1"),
        col("mean0"), col("mean1"), col("t_low"), col("t_up"), col("equiv"))
      .collect().map(r => r.getString(0) -> r).toMap

    val rows: Seq[(Timestamp, String, Long, Double)] = spark.read
      .parquet(s"$dir/events.parquet")
      .select(col("event_type"),
        pmod(col("user_id"), lit(2)).cast("long"), col("value"))
      .collect().toSeq
      .map(r => (ts("2024-01-01 00:30:00"), r.getString(0), r.getLong(1),
        r.getDouble(2)))
    assert(rows.nonEmpty)

    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Long, Double)]
    val q = TostStream.windowedEquivalence(
        in.toDF().toDF("ts", "metric", "variant", "value"),
        "ts", "metric", "variant", "value")
      .writeStream.format("memory").queryName("tost_out")
      .outputMode("append").start()
    try {
      rows.grouped(4096).foreach(b => in.addData(b: _*))
      q.processAllAvailable()
      in.addData((ts("2024-01-01 02:30:00"), "close", 0L, 1.0))
      q.processAllAvailable()
      val got = spark.table("tost_out")
        .where(col("bucket") === ts("2024-01-01 00:00:00"))
        .select(col("metric"), col("n0"), col("n1"),
          col("mean0"), col("mean1"), col("t_low"), col("t_up"), col("equiv"))
        .collect().map(r => r.getString(0) -> r).toMap
      assert(got.keySet === batch.keySet)
      batch.foreach { case (k, b) =>
        assert(got(k) === b, s"stream row for metric $k diverged from batch")
      }
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS tost_out")
    }
  }

  test("decision laws: equivalent certifies, shifted does not, dead metric is null") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Long, Double)]
    val q = TostStream.windowedEquivalence(
        in.toDF().toDF("ts", "metric", "variant", "value"),
        "ts", "metric", "variant", "value",
        windowDur = "10 minutes", delay = "1 minute")
      .writeStream.format("memory").queryName("tost_laws")
      .outputMode("append").start()
    try {
      val t0 = ts("2024-01-01 00:01:00")
      // 'same': identical tight distributions (jitter ±0.02 around 10)
      // in both arms — well inside the 5% band, large n → certifies
      val same = (0 until 400).map(i =>
        (t0, "same", (i % 2).toLong, 10.0 + (i % 5 - 2) * 0.01))
      // 'shifted': arm 1 runs 20% higher — equivalence must NOT certify
      val shifted = (0 until 400).map { i =>
        val v = if (i % 2 == 0) 10.0 + (i % 5 - 2) * 0.01
                else 12.0 + (i % 5 - 2) * 0.01
        (t0, "shifted", (i % 2).toLong, v)
      }
      // 'dead': both arms constant — se2 = 0, nulls, job survives
      val dead = (0 until 100).map(i => (t0, "dead", (i % 2).toLong, 7.0))
      // 'neg': identical tight distributions around a NEGATIVE mean —
      // the TOST band is |pooled|·frac, so this must still certify (a
      // signed margin would make equivalence structurally impossible
      // for refund/loss metrics; regression pin for the abs() fix)
      val neg = (0 until 400).map(i =>
        (t0, "neg", (i % 2).toLong, -10.0 + (i % 5 - 2) * 0.01))
      in.addData(same ++ shifted ++ dead ++ neg: _*)
      q.processAllAvailable()
      in.addData((ts("2024-01-01 00:30:00"), "close", 0L, 1.0))
      q.processAllAvailable()
      val rows = spark.table("tost_laws")
        .where(col("bucket") === ts("2024-01-01 00:00:00"))
        .collect().map(r => r.getString(r.fieldIndex("metric")) -> r).toMap
      assert(rows("same").getInt(rows("same").fieldIndex("equiv")) === 1)
      assert(rows("shifted").getInt(rows("shifted").fieldIndex("equiv")) === 0)
      val d = rows("dead")
      assert(d.isNullAt(d.fieldIndex("equiv")))
      assert(d.isNullAt(d.fieldIndex("t_low")))
      assert(rows("neg").getInt(rows("neg").fieldIndex("equiv")) === 1,
        "a negative-mean identical metric must certify (|margin| band)")
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS tost_laws")
    }
  }
}
