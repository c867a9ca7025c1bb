package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.streaming.DriftStream

/** Streaming drift alarm ≡ the batch 2×k chi-squared audit: with the
  * reference frozen from the even-id half of the corpus and the odd-id
  * half streamed into one window, the emitted χ² equals the
  * sequentially-computed statistic over the exact cell counts. */
class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")

  private def cellsOf(cond: org.apache.spark.sql.Column): Map[Int, Long] =
    Similarity.seedCellAssign(emb.where(cond), "vec_id", "embedding")
      .groupBy("cell").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap

  test("windowed chi2 equals the batch audit; quiet under a high bar") {
    val ref = cellsOf(pmod(col("vec_id"), lit(2)) === 0)
    val cur = cellsOf(pmod(col("vec_id"), lit(2)) === 1)

    // sequential replay of the summed 2×k statistic, cells in sorted
    // order (the same left-assoc fold the plan's literal chain runs)
    val cr = ref.values.sum
    val cc = cur.values.sum
    val n = cr + cc
    val expected = ref.toSeq.sortBy(_._1).map { case (c, nRef) =>
      val o = cur.getOrElse(c, 0L)
      val r = nRef + o
      (n * nRef - r * cr).toDouble * (n * nRef - r * cr).toDouble /
        (n * r * cr).toDouble +
        (n * o - r * cc).toDouble * (n * o - r * cc).toDouble /
          (n * r * cc).toDouble
    }.reduce(_ + _)

    val vecs: Seq[(Seq[Float], Timestamp)] = emb
      .where(pmod(col("vec_id"), lit(2)) === 1)
      .select(col("embedding")).as[Seq[Float]].collect().toSeq
      .map(v => (v, ts("2024-01-01 00:30:00")))

    def run(threshold: Double, name: String): Array[(Timestamp, Long, Double)] = {
      implicit val ctx = spark.sqlContext
      val in = MemoryStream[(Seq[Float], Timestamp)]
      val q = DriftStream.windowedAlarms(
          in.toDF().toDF("embedding", "ts"), "embedding", "ts",
          ref, threshold)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        in.addData(vecs: _*); q.processAllAvailable()
        // close the window: an event past watermark+window end
        in.addData((Seq.fill(64)(0.0f), ts("2024-01-01 02:30:00")))
        q.processAllAvailable()
        spark.table(name)
          .where(col("bucket") === ts("2024-01-01 00:00:00"))
          .collect().map(r => (r.getAs[Timestamp]("bucket"),
            r.getAs[Long]("n_vectors"), r.getAs[Double]("chi2")))
      } finally {
        q.stop(); spark.sql(s"DROP TABLE IF EXISTS $name")
      }
    }

    val alarms = run(threshold = -1.0, "drift_all")
    assert(alarms.length == 1)
    assert(alarms.head._2 == cc)
    assert(alarms.head._3 == math.round(expected * 10000) / 10000.0)

    // same stream, 95%-style bar far above this statistic: no alarm
    val quiet = run(threshold = expected + 100.0, "drift_quiet")
    assert(quiet.isEmpty)
  }

  test("windowed PSI equals the smoothed closed-cell-set fold; quiet under a high bar") {
    val ref = cellsOf(pmod(col("vec_id"), lit(2)) === 0)
    val cur = cellsOf(pmod(col("vec_id"), lit(2)) === 1)
    val k = 8
    val cr = ref.values.sum
    val cc = cur.values.sum
    // sequential replay over ALL k cells (absent cells included — the
    // batch drift_psi rule), +1-smoothed shares, fold in cell order
    val expected = (0 until k).map { c =>
      val pr = (ref.getOrElse(c, 0L) + 1).toDouble / (cr + k)
      val pc = (cur.getOrElse(c, 0L) + 1).toDouble / (cc + k)
      (pc - pr) * math.log(pc / pr)
    }.reduce(_ + _)

    val vecs: Seq[(Seq[Float], Timestamp)] = emb
      .where(pmod(col("vec_id"), lit(2)) === 1)
      .select(col("embedding")).as[Seq[Float]].collect().toSeq
      .map(v => (v, ts("2024-01-01 00:30:00")))

    def run(threshold: Double, name: String): Array[(Timestamp, Long, Double)] = {
      implicit val ctx = spark.sqlContext
      val in = MemoryStream[(Seq[Float], Timestamp)]
      val q = DriftStream.windowedPsiAlarms(
          in.toDF().toDF("embedding", "ts"), "embedding", "ts",
          ref, threshold)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        in.addData(vecs: _*); q.processAllAvailable()
        in.addData((Seq.fill(64)(0.0f), ts("2024-01-01 02:30:00")))
        q.processAllAvailable()
        spark.table(name)
          .where(col("bucket") === ts("2024-01-01 00:00:00"))
          .collect().map(r => (r.getAs[Timestamp]("bucket"),
            r.getAs[Long]("n_vectors"), r.getAs[Double]("psi")))
      } finally {
        q.stop(); spark.sql(s"DROP TABLE IF EXISTS $name")
      }
    }

    val alarms = run(threshold = -1.0, "psi_all")
    assert(alarms.length == 1)
    assert(alarms.head._2 == cc)
    assert(alarms.head._3 == math.round(expected * 1000000) / 1000000.0)
    assert(run(threshold = math.abs(expected) + 1.0, "psi_quiet").isEmpty)
  }

  test("malformed vectors are dropped, not crashed on and not counted") {
    val ref = cellsOf(pmod(col("vec_id"), lit(2)) === 0)
    val good: Seq[(Seq[Float], Timestamp)] = emb
      .where(pmod(col("vec_id"), lit(2)) === 1)
      .select(col("embedding")).as[Seq[Float]].collect().toSeq
      .map(v => (v, ts("2024-01-01 00:30:00")))
    // wrong-length vectors quantize to a NULL cell; before the
    // isNotNull guard this (window, null) group reached
    // map_from_entries as a null map key and failed the query forever
    val bad: Seq[(Seq[Float], Timestamp)] = Seq(
      (Seq(1.0f, 2.0f, 3.0f), ts("2024-01-01 00:31:00")),
      (Seq.empty[Float], ts("2024-01-01 00:32:00")))

    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Seq[Float], Timestamp)]
    val q = DriftStream.windowedAlarms(
        in.toDF().toDF("embedding", "ts"), "embedding", "ts",
        ref, threshold = -1.0)
      .writeStream.format("memory").queryName("drift_malformed")
      .outputMode("append").start()
    try {
      in.addData(good ++ bad: _*); q.processAllAvailable()
      in.addData((Seq.fill(64)(0.0f), ts("2024-01-01 02:30:00")))
      q.processAllAvailable()
      val rows = spark.table("drift_malformed")
        .where(col("bucket") === ts("2024-01-01 00:00:00")).collect()
      assert(rows.length == 1)
      // cc counts ONLY well-formed vectors — the malformed two vanish
      assert(rows.head.getAs[Long]("n_vectors") == good.length.toLong)
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS drift_malformed")
    }
  }
}
