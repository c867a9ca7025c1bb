package graft

import org.apache.spark.sql.functions._
import graft.ops.{Similarity, Tables}

/** The persisted-IVF-index story, asserted: probing a bucketed index
  * table returns results identical to the recompute-everything frozen
  * path, and at query volumes past broadcast the index side joins with
  * NO exchange — the corpus was partitioned on the cell key at build
  * time, so only queries ever move (the ANN analog of the bucketed
  * minhash signature table in ScaleSpec). */
class IvfIndexTableSpec extends SparkSpec {

  private def rmdir(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles.foreach(rmdir)
    f.delete(); ()
  }

  test("probe-from-table ≡ frozen recompute; bucketed side joins exchange-free") {
    spark.sql("DROP TABLE IF EXISTS b_ivf")
    rmdir(new java.io.File("spark-warehouse/b_ivf"))

    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val queries = emb.where(col("vec_id") < 10)
    Similarity.writeIvfIndexTable(emb, "vec_id", "embedding", "b_ivf",
      nLists = 16, buckets = 4)

    // 1) result equivalence with the recompute path (broadcast probe)
    val fromTable = Similarity.ivfTopKFromTable(spark, "b_ivf", queries,
      "vec_id", "embedding", k = 5, nLists = 16, nProbe = 4)
    val frozen = Similarity.ivfTopKFrozen(emb, queries,
      "vec_id", "embedding", k = 5, nLists = 16, nProbe = 4)
    assert(fromTable.exceptAll(frozen).count() === 0)
    assert(frozen.exceptAll(fromTable).count() === 0)
    assert(frozen.count() > 0)

    // 2) big-query-set regime: broadcast off → the cell equi-join must
    // read the bucketed index WITHOUT an exchange on the index side
    // (the only exchanges are the query side's and the top-k window's)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Similarity.ivfTopKFromTable(spark, "b_ivf", queries,
        "vec_id", "embedding", k = 5, nLists = 16, nProbe = 4,
        broadcastProbe = false)
        .queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      // the scan of the bucketed table must not sit under an Exchange:
      // Spark marks bucketed reads with the bucket count; assert the
      // FileScan of b_ivf appears and "Exchange hashpartitioning(cell"
      // appears at most once (the query side), never twice.
      val cellExchanges = "Exchange hashpartitioning\\(cell".r
        .findAllIn(plan).length
      assert(cellExchanges <= 1,
        s"index side must be pre-partitioned (found $cellExchanges cell exchanges):\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan must use buckets:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
