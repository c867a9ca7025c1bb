package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.IsotropyStream

/** Streaming isotropy ≡ batch: one frozen window over the sf0.001
  * embeddings reproduces the batch emb_isotropy row exactly (shared
  * fixed-point masses + dim-ordered fold), under a multi-batch split;
  * and a planted mid-stream collapse fires in its own window. */
class IsotropyStreamSpec extends SparkSpec {
  import spark.implicits._

  private val w0 = ts("2024-01-01 00:30:00")

  test("one frozen window reproduces the batch emb_isotropy row") {
    val dir = sf()
    val batch = SparkEntry.queries("emb_isotropy")(spark, dir)
      .collect().head

    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("embedding").cast("array<float>"))
      .as[Seq[Float]].collect().toSeq

    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Seq[Float])]
    val q = IsotropyStream.windowedIsotropy(
        in.toDF().toDF("t", "vec"), "t", "vec", delay = "0 seconds")
      .writeStream.format("memory").queryName("iso_out")
      .outputMode("append").start()
    try {
      vecs.map(v => (w0, v)).grouped(256).foreach(b => in.addData(b: _*))
      q.processAllAvailable()
      in.addData((ts("2024-01-01 02:00:00"), Seq(1.0f, 2.0f)))
      q.processAllAvailable()
      val got = spark.table("iso_out")
        .where(col("bucket") === ts("2024-01-01 00:00:00"))
        .select(col("n_vecs"), col("d"), col("participation_ratio"),
          col("eff_dim_frac"), col("top_dim_share"))
        .collect().head
      val want = org.apache.spark.sql.Row(batch.getAs[Long]("n_vecs"),
        batch.getAs[Long]("d"), batch.getAs[Double]("participation_ratio"),
        batch.getAs[Double]("eff_dim_frac"),
        batch.getAs[Double]("top_dim_share"))
      assert(got === want, "stream window diverged from the batch audit")
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS iso_out")
    }
  }

  test("a mid-stream collapse fires in its own window only") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Seq[Float])]
    val q = IsotropyStream.windowedIsotropy(
        in.toDF().toDF("t", "vec"), "t", "vec", delay = "0 seconds")
      .writeStream.format("memory").queryName("iso_collapse")
      .outputMode("append").start()
    try {
      // window 0: healthy 4-dim signs; window 1: one rogue dimension
      val healthy = (0 until 64).map(i => (w0,
        Seq.tabulate(4)(d => if (((i >> d) & 1) == 0) 1.0f else -1.0f)))
      val collapsed = (0 until 64).map(i => (ts("2024-01-01 01:30:00"),
        (if (i % 2 == 0) 10.0f else -10.0f) +: Seq.fill(3)(0.001f)))
      in.addData(healthy ++ collapsed: _*)
      q.processAllAvailable()
      in.addData((ts("2024-01-01 03:00:00"), Seq(0.0f)))
      q.processAllAvailable()
      val rows = spark.table("iso_collapse")
        .select(col("bucket"), col("participation_ratio"))
        .collect().map(r => r.getTimestamp(0) -> r.getDouble(1)).toMap
      assert(rows(ts("2024-01-01 00:00:00")) === 4.0)
      assert(rows(ts("2024-01-01 01:00:00")) < 1.1,
        s"collapse window PR = ${rows(ts("2024-01-01 01:00:00"))}")
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS iso_collapse")
    }
  }
}
