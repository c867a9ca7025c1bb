package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.streaming.EmbeddingGuard

/** The streaming embedding guard flags exactly the batch outlier set
  * under the same frozen profile, and wrong-dimension vectors surface
  * as unjudgeable rather than disappearing. */
class EmbeddingGuardSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 4

  // two tight clusters plus planted far points: cluster members sit at
  // distance ~0 from their centroid, the planted rows far away — with
  // near-zero MAD any real excursion flags.
  private def corpus: Seq[(Long, Seq[Float])] = {
    val a = (0L until 15L).map(i => i -> Seq(1f, 0f, 0.1f * (i % 3), 0f))
    val b = (15L until 30L).map(i => i -> Seq(0f, 1f, 0f, 0.1f * (i % 3)))
    val far = Seq(100L -> Seq(5f, 5f, 5f, 5f), 101L -> Seq(-4f, 3f, -4f, 3f))
    a ++ b ++ far
  }

  test("stream verdicts equal the batch outlier set; wrong dim is unjudgeable") {
    val df = corpus.toDF("id", "v")
      .select(col("id"), col("v").cast("array<float>").as("v"))
    val profile = Similarity.outlierProfile(df, "id", "v", k = 2, dim = dim)
      .localCheckpoint()
    val batchFlagged = Similarity
      .kmeansOutliers(df, "id", "v", k = 2, dim = dim, nMads = 3)
      .select("id").as[Long].collect().toSet
    assert(batchFlagged.nonEmpty) // the planted points must actually flag

    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Float])]
    val stream = in.toDF().toDF("id", "v")
      .select(col("id"), col("v").cast("array<float>").as("v"))
    val q = EmbeddingGuard.judged(stream, "v", profile, dim = dim, nMads = 3)
      .writeStream.format("memory").queryName("guard_out")
      .outputMode("append").start()
    try {
      in.addData(corpus :+ (999L -> Seq(1f, 2f)): _*)
      q.processAllAvailable()
      val out = spark.table("guard_out")
      val streamFlagged = out.where(col("outlier") === true)
        .select("id").as[Long].collect().toSet
      assert(streamFlagged === batchFlagged)
      // every in-dim row got a verdict; the 2-dim row surfaced as null
      assert(out.where(col("outlier").isNull).select("id")
        .as[Long].collect().toSeq === Seq(999L))
      assert(out.count() === (corpus.size + 1).toLong)
    } finally q.stop()
  }
}
