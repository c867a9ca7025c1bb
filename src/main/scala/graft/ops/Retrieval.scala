package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Full-text retrieval over the corpus: multi-query BM25 top-k search,
  * and the persisted inverted index that serves it without rescanning
  * the corpus — the "find me training docs about X" / contamination-
  * lookup surface of a data-curation stack.
  *
  * Scale shape: the token explode is filtered to the query-term set
  * MAP-SIDE (a tiny `isin` against the scan — 99%+ of tokens never
  * reach a shuffle), so the expensive path is one hash-agg over the
  * matching (doc, term) pairs. Corpus statistics travel as one
  * broadcast row of exact integers (count + token sum); the BM25 score
  * folds per (query, doc) in sorted term order, so the float sum is
  * engine-portable (the oracle replays the identical fold).
  */
object Retrieval {

  /** (qid, terms) pairs as a broadcastable DataFrame. */
  private def queryTable(spark: SparkSession,
                         queries: Seq[(String, Seq[String])]): DataFrame = {
    import spark.implicits._
    queries.flatMap { case (q, ts) => ts.distinct.map(t => (q, t)) }
      .toDF("qid", "term")
  }

  /** BM25 contribution of one (doc, term) posting given broadcast corpus
    * stats: idf(df) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)). All doubles
    * derive from exact integers, so the only engine-sensitive op is ln —
    * which libms agree on for these magnitudes (the text_bm25 precedent). */
  private def contrib(k1: Double, b: Double): Column = {
    val nDocs = col("n_docs").cast("double")
    val df = col("df").cast("double")
    val tf = col("tf").cast("double")
    val dl = col("dl").cast("double")
    val avgdl = col("sum_dl").cast("double") / nDocs
    val idf = log((nDocs - df + 0.5) / (df + 0.5) + 1.0)
    idf * (tf * (k1 + 1.0)) / (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / avgdl))
  }

  /** Sum the per-term contributions of one (query, doc) group in sorted
    * term order — a deterministic left fold (0.0 + x₀ = x₀, so DuckDB's
    * init-free list_reduce over list(… ORDER BY term) replays it). */
  private def foldScore: Column =
    aggregate(sort_array(collect_list(struct(col("term"), col("contrib")))),
      lit(0.0), (acc, x) => acc + x("contrib"))

  /** Multi-query BM25 top-k, index-free: one corpus scan builds the
    * (doc, query-term) frequencies, a second builds the two-integer
    * stats row. Ranking is per qid (WindowGroupLimit bounds it map-side);
    * ties break on doc id. */
  def searchTopK(docs: DataFrame, idCol: String, textCol: String,
                 queries: Seq[(String, Seq[String])], k: Int,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val allTerms = queries.flatMap(_._2).distinct
    val base = docs.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val stats = base.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    // The tiny post-filter aggregate is localCheckpoint'd (lazily) so the
    // df aggregate derives from it instead of re-deriving the whole
    // corpus explode: Catalyst's column pruning makes the two subtrees
    // differ, which defeats exchange reuse — without the checkpoint the
    // corpus is scanned three times (tf, df, stats), with it twice.
    val tf = tfRelation(docs, idCol, textCol, allTerms).localCheckpoint(false)
    rank(score(tf, queryTable(docs.sparkSession, queries), stats, idCol, k1, b),
      idCol, k)
  }

  /** (doc, dl, query-term) frequencies: the term `isin` prune runs on the
    * exploded tokens MAP-SIDE (before the aggregate's exchange), so
    * non-matching tokens — virtually all of them — never shuffle.
    * Package-visible so the plan guard can assert that shape (the
    * checkpoint in [[searchTopK]] hides it from the outer plan). */
  private[graft] def tfRelation(docs: DataFrame, idCol: String,
                                textCol: String, terms: Seq[String]): DataFrame =
    docs.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
      .select(col(idCol), col("dl"), explode(col("toks")).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))

  private def score(tf: DataFrame, qt: DataFrame, stats: DataFrame,
                    idCol: String, k1: Double, b: Double): DataFrame = {
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(qt), "term")
      .join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("contrib", contrib(k1, b))
      .groupBy(col("qid"), col(idCol))
      .agg(foldScore.as("s"))
      .select(col("qid"), col(idCol),
        TimeSeries.portableRound4(col("s")).as("score"))
  }

  private def rank(scored: DataFrame, idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Token-exact phrase search via POSITIONAL postings: each phrase
    * term's per-doc position list is built from one map-pruned explode
    * (only the phrase's terms survive to the shuffle — the corpus-sized
    * token stream never moves), then consecutive-position intersection
    * folds left across the phrase: positions matching the prefix, each
    * shifted +1, intersect the next term's positions. Docs missing any
    * term drop at the inner joins; `n_matches` counts occurrences.
    * At 100 TB the same fold runs against a persisted positional
    * postings table — this is the probe shape, index-free. */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.length >= 2, "phrase needs at least two tokens")
    val postings = docs
      .select(col(idCol),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "term")))
      .where(col("term").isin(phrase.distinct: _*))
      .groupBy(col(idCol), col("term"))
      .agg(sort_array(collect_list(col("pos"))).as("ps"))
      .localCheckpoint(false) // phrase terms reuse one postings build
    val slots = phrase.zipWithIndex.map { case (t, i) =>
      postings.where(col("term") === t)
        .select(col(idCol), col("ps").as(s"ps_$i"))
    }
    val joined = slots.reduceLeft((a, b) => a.join(b, idCol))
    val matched = phrase.indices.tail.foldLeft(col("ps_0")) { (acc, i) =>
      array_intersect(transform(acc, _ + 1), col(s"ps_$i"))
    }
    joined.select(col(idCol), size(matched).as("n_matches"))
      .where(col("n_matches") > 0)
  }

  /** Persist the inverted index: postings (term, doc, tf, dl) BUCKETED by
    * term — a query probes only its terms' buckets, the corpus-sized
    * table never reshuffles at search time — plus a one-row exact-integer
    * stats sidecar. Build cost is the one explode+agg pass; everything
    * the search needs (tf, dl, df-by-counting) lives in the postings. */
  def writeIndex(docs: DataFrame, idCol: String, textCol: String,
                 table: String, buckets: Int): Unit = {
    val base = docs.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    base.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .write.mode("overwrite").format("parquet").saveAsTable(s"${table}_stats")
    Scale.writeBucketed(
      base.select(col(idCol), col("dl"), explode(col("toks")).as("term"))
        .groupBy(col("term"), col(idCol), col("dl"))
        .agg(count(lit(1)).as("tf")),
      table, buckets, keyCols = Seq("term"))
  }

  /** Incremental index maintenance — the recurring-crawl shape: ONLY the
    * new batch tokenizes and shuffles into the existing bucket layout
    * (bucketed appends co-locate with the settled postings; the settled
    * corpus is never re-read), and the two-integer stats sidecar updates
    * by addition. Search needs no changes and returns exactly what a
    * full rebuild over old ∪ new would (RetrievalSpec proves it): tf/dl
    * are per-doc facts, df counts postings, and corpus stats are sums —
    * every search input is append-merge-able. */
  def appendToIndex(docs: DataFrame, idCol: String, textCol: String,
                    table: String, buckets: Int): Unit = {
    val spark = docs.sparkSession
    val base = docs.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val newStats = base.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val merged = spark.table(s"${table}_stats").unionByName(newStats)
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
      .collect()(0) // two integers — the sidecar is one row by contract
    // append-mode saveAsTable validates the existing table's bucket spec
    // (`buckets` must match write-time, the signature-table contract)
    base.select(col(idCol), col("dl"), explode(col("toks")).as("term"))
      .groupBy(col("term"), col(idCol), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .write.mode("append").bucketBy(buckets, "term")
      .format("parquet").saveAsTable(table)
    import spark.implicits._
    Seq((merged.getLong(0), merged.getLong(1))).toDF("n_docs", "sum_dl")
      .write.mode("overwrite").format("parquet").saveAsTable(s"${table}_stats")
  }

  /** Search the persisted index: read ONLY the probed terms' postings
    * (the `isin` prunes buckets and pushes to the postings scan), count
    * df from the postings themselves, then the same score+rank as the
    * index-free path — results are identical, but the corpus is never
    * touched. */
  def searchFromIndex(spark: SparkSession, table: String,
                      queries: Seq[(String, Seq[String])], k: Int,
                      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val allTerms = queries.flatMap(_._2).distinct
    val tf = spark.table(table).where(col("term").isin(allTerms: _*))
    val idCol = tf.columns.find(c => !Set("term", "dl", "tf").contains(c)).get
    rank(score(tf, queryTable(spark, queries), spark.table(s"${table}_stats"),
      idCol, k1, b), idCol, k)
  }
}
