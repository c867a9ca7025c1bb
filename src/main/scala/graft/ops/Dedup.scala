package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash-LSH,
  * SimHash, and n-gram Jaccard.
  *
  * Scale design:
  *  - exact dedup is one hash-aggregate on the fingerprint (map-side
  *    partial agg collapses duplicates before the shuffle);
  *  - MinHash-LSH is the 100 TB path for near-dup: candidate generation
  *    joins on (band, bucket) — cardinality bounded by bands × docs, never
  *    the all-pairs square;
  *  - n-gram Jaccard joins on shared shingles: exact but vulnerable to hot
  *    shingles, so it is the verifier for LSH candidates, not the primary
  *    pass at scale;
  *  - all hashing is md5-based and engine-portable (same values in any
  *    SQL engine), so results are reproducible across re-runs and clusters
  *    — no JVM-hashCode dependence.
  */
object Dedup {

  /** Distinct word w-shingles per doc: (id, shingle). */
  def shingles(docs: DataFrame, idCol: String, textCol: String, w: Int = 3): DataFrame = {
    val toks = split(col(textCol), " ")
    // shingle i = tokens[i..i+w) joined; sequence stays inside codegen.
    // Guard: sequence(0, n) with n<0 counts DOWN in Spark — docs shorter
    // than w tokens must yield no shingles, not negative indices.
    val idxs = when(size(toks) >= w, sequence(lit(0), size(toks) - w))
      .otherwise(array().cast("array<int>"))
    docs.select(col(idCol),
        explode(transform(idxs, i => concat_ws(" ", slice(toks, i + 1, lit(w))))).as("shingle"))
      .distinct()
  }

  /** Exact dedup: group identical normalized texts, keep the smallest id.
    * Returns (text_hash, keep_id, n_copies). */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), TextAnalysis.fingerprint(col(textCol)).as("text_hash"))
      .groupBy(col("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash signatures: numPerm permutations simulated as
    * min(md5(seed || shingle)) — deterministic and portable.
    * Returns (id, seed, minhash). */
  def minhash(sh: DataFrame, idCol: String, numPerm: Int): DataFrame =
    sh.select(col(idCol), explode(sequence(lit(0), lit(numPerm - 1))).as("seed"),
        col("shingle"))
      .groupBy(col(idCol), col("seed"))
      .agg(min(md5(to_binary(concat(col("seed").cast("string"), lit("|"), col("shingle")),
        lit("utf-8")))).as("minhash"))

  /** LSH banding: group numPerm minhashes into bands of `rowsPerBand`,
    * bucket = concatenated band signature; docs sharing any (band, bucket)
    * are candidate pairs. Returns distinct (a, b) with a < b. */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      numPerm: Int = 12, rowsPerBand: Int = 3, shingleW: Int = 3): DataFrame = {
    val sig = minhash(shingles(docs, idCol, textCol, shingleW), idCol, numPerm)
    val banded = sig
      .withColumn("band", (col("seed") / rowsPerBand).cast("int"))
      // sort_array over (seed, minhash) structs fixes concat order.
      .groupBy(col(idCol), col("band"))
      .agg(concat_ws("", sort_array(collect_list(struct(col("seed"), col("minhash"))))
        .getField("minhash")).as("bucket"))
    val l = banded.select(col(idCol).as("a"), col("band"), col("bucket"))
    val r = banded.select(col(idCol).as("b"), col("band"), col("bucket"))
    l.join(r, Seq("band", "bucket")).where(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
  }

  /** SimHash (32-bit, md5-derived): per doc, bit i of the hash of each
    * token votes +count/-count; simhash bit i = majority sign.
    * Returns (id, simhash). Near-dups then pair on small Hamming distance
    * — at scale via pivoted 8-bit chunks (4 exact-match probes). */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = docs.select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .groupBy(col(idCol), col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("h", conv(substring(md5(to_binary(col("word"), lit("utf-8"))), 1, 8), 16, 10)
        .cast("long"))
    words
      .select(col(idCol), explode(sequence(lit(0), lit(31))).as("bit"),
        col("cnt"), col("h"))
      .withColumn("vote",
        when(expr("shiftright(h, CAST(bit AS INT))").bitwiseAND(1) === 1, col("cnt"))
          .otherwise(-col("cnt")))
      .groupBy(col(idCol), col("bit"))
      .agg(sum(col("vote")).as("v"))
      .groupBy(col(idCol))
      .agg(sum(when(col("v") > 0,
        expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))")).otherwise(0L))
        .as("simhash"))
  }

  /** Exact n-gram Jaccard similarity for pairs sharing >=1 shingle.
    * Returns (a, b, jaccard) for jaccard >= threshold, a < b. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        threshold: Double, w: Int = 3): DataFrame = {
    val sh = shingles(docs, idCol, textCol, w).withColumnRenamed(idCol, "id")
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    val common = sh.select(col("id").as("a"), col("shingle"))
      .join(sh.select(col("id").as("b"), col("shingle")), "shingle")
      .where(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col("id").as("a"), col("n_sh").as("na")), "a")
      .join(sizes.select(col("id").as("b"), col("n_sh").as("nb")), "b")
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("na") + col("nb") - col("n_common")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }
}
