package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * Baseline: brute-force cosine top-k — exact, one broadcast of the query
  * set, no shuffle on the corpus side; the scan parallelizes over corpus
  * partitions, so it scales linearly in corpus size (fine whenever
  * |queries| is small). Scale path: LSH sign-random-projection bucketing —
  * candidates only form within a bucket, trading recall for a join whose
  * output is bounded by bucket occupancy rather than |corpus| × |queries|.
  *
  * All arithmetic is double (floats widened first) and expression-only:
  * zip_with + aggregate run inside codegen, no UDF.
  */
object Similarity {

  /** Cosine similarity of two double-array columns (index-ordered sums, so
    * results are bit-deterministic). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (acc, x) => acc + x))
    dot / (na * nb)
  }

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Exact top-k neighbors for each query vector (brute force).
    * Returns (query_id, neighbor_id, sim, rank). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    c.crossJoin(q)
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  /** Sign-random-projection LSH bucket id (`nBits` hyperplanes). The
    * hyperplane components are md5-derived pseudo-randoms in [-0.5, 0.5] —
    * deterministic, engine-portable, no driver-side state to broadcast. */
  def srpBucket(vec: Column, nBits: Int): Column = {
    val bits = (0 until nBits).map { b =>
      // dot(vec, plane_b) where plane_b[i] = u(md5(b|i)) - 0.5
      val dot = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) =>
          x * (conv(substring(md5(to_binary(concat(lit(b.toString), lit("|"), i.cast("string")),
            lit("utf-8"))), 1, 6), 16, 10).cast("double") / lit(16777216.0) - lit(0.5))),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, shiftleft(lit(1L), b)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Approximate NN via SRP-LSH: corpus and queries bucketed by `nBits`
    * hyperplane signs; top-k computed within matching buckets only.
    * Candidate volume ~ |corpus| × |queries| / 2^nBits per bucket family. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nBits: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("bucket", srpBucket(col("cv"), nBits))
    val q = broadcast(queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("bucket", srpBucket(col("qv"), nBits)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    c.join(q, "bucket")
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  /** Embedding near-duplicate pairs: all (a < b) with cosine >= threshold,
    * bucketed by SRP-LSH so the pair space never materializes fully. */
  def embeddingNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                            threshold: Double, nBits: Int = 6): DataFrame = {
    val v = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("bucket", srpBucket(col("v"), nBits))
    val l = v.select(col("id").as("a"), col("v").as("va"), col("bucket"))
    val r = v.select(col("id").as("b"), col("v").as("vb"), col("bucket"))
    l.join(r, "bucket").where(col("a") < col("b"))
      .withColumn("sim", cosine(col("va"), col("vb")))
      .where(col("sim") >= threshold)
      .select(col("a"), col("b"), col("sim"))
  }
}
