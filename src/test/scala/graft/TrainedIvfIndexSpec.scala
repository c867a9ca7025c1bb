package graft

import org.apache.spark.sql.functions._
import graft.ops.{Similarity, Tables}

/** The trained-quantizer artifact story: probing the persisted index +
  * centers sidecar returns results identical to the train-everything
  * in-plan path, and past broadcast volumes the bucketed index side
  * joins exchange-free (the IvfIndexTableSpec law, now with TRAINED
  * centers instead of frozen literals). */
class TrainedIvfIndexSpec extends SparkSpec {

  private def rmdir(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles.foreach(rmdir)
    f.delete(); ()
  }

  test("probe-from-trained-index ≡ in-plan trained search; index side exchange-free") {
    spark.sql("DROP TABLE IF EXISTS b_tivf")
    rmdir(new java.io.File("spark-warehouse/b_tivf"))
    val centersPath = java.nio.file.Files
      .createTempDirectory("tivf_centers").toString + "/centers"

    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val queries = emb.where(col("vec_id") < 10)
    Similarity.writeTrainedIvfIndex(emb, "vec_id", "embedding", "b_tivf",
      centersPath, nLists = 8, buckets = 4)

    val fromIndex = Similarity.ivfTopKFromTrainedIndex(spark, "b_tivf",
      centersPath, queries, "vec_id", "embedding", kTop = 5, nProbe = 2)
    val inPlan = Similarity.ivfTopKTrained(emb, queries, "vec_id",
      "embedding", kTop = 5, nLists = 8, nProbe = 2)
    assert(fromIndex.exceptAll(inPlan).count() === 0)
    assert(inPlan.exceptAll(fromIndex).count() === 0)
    assert(inPlan.count() > 0)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Similarity.ivfTopKFromTrainedIndex(spark, "b_tivf",
        centersPath, queries, "vec_id", "embedding", kTop = 5, nProbe = 2,
        broadcastProbe = false)
        .queryExecution.executedPlan.toString
      val cellExchanges = "Exchange hashpartitioning\\(cell".r
        .findAllIn(plan).length
      assert(cellExchanges <= 1,
        s"index side must be pre-partitioned (found $cellExchanges):\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan must use buckets:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
