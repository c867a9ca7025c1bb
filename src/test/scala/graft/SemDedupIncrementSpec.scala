package graft

import org.apache.spark.sql.functions._
import graft.ops.{Similarity, Tables}

/** Incremental SemDeDup: the table-backed path (settled side persisted
  * cell-bucketed, only the increment assigns and shuffles) must return
  * exactly the recompute-both-sides pairs — the semantic twin of
  * ScaleSpec's incremental minhash test. */
class SemDedupIncrementSpec extends SparkSpec {

  private def rmdir(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles.foreach(rmdir)
    f.delete(); ()
  }

  test("cross pairs from the persisted assignment table ≡ recompute") {
    spark.sql("DROP TABLE IF EXISTS b_sem")
    rmdir(new java.io.File("spark-warehouse/b_sem"))

    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val settled = emb.where(col("vec_id") < 250)
    val incoming = emb.where(col("vec_id") >= 250)

    Similarity.writeIvfIndexTable(settled, "vec_id", "embedding", "b_sem",
      buckets = 4, centroids = Similarity.semCentroids(8, 64))

    val direct = Similarity.semDedupCrossPairs(settled, incoming,
      "vec_id", "embedding", threshold = 0.2)
    val fromTable = Similarity.semDedupCrossPairsFromTable(spark, "b_sem",
      incoming, "vec_id", "embedding", threshold = 0.2)

    assert(direct.count() > 0, "the split must actually produce cross pairs")
    assert(fromTable.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(fromTable).count() === 0)
    // never a settled x settled pair: old ids only on the left
    assert(fromTable.where(col("new_id") < 250).count() === 0)
  }
}
