package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Word w-shingles per doc: (id, shingle), WITH duplicates — both
    * consumers are duplicate-insensitive (min-aggregation; collect_set),
    * so no distinct here: it would cost a full (id, shingle) shuffle that
    * the downstream aggregate absorbs for free. */
  def shingles(docs: DataFrame, idCol: String, textCol: String, w: Int = 3): DataFrame =
    // native shingle build ([[shingleArray]]): the transform/slice form
    // re-ran the regex split once per shingle (see shingleArray's note)
    docs.select(col(idCol),
      explode(shingleArray(col(textCol), w)).as("shingle"))

  /** N-gram novelty of a candidate corpus against a reference corpus:
    * per candidate doc, the fraction of its DISTINCT w-grams never seen
    * anywhere in the reference — the memorization/diversity dial for
    * generated or newly-crawled data (novelty ≈ 0 means the "new" data
    * is recombined reference text; contamination is the same measure
    * pointed at an eval set, see contam_frac). Distinct-grams-per-doc,
    * not occurrences: a doc repeating one novel phrase shouldn't look
    * novel.
    *
    * Scale shape: both sides shuffle 8-byte xxhash64 gram keys (the
    * sharedShingleCounts rule — identity only, never the text; a 64-bit
    * collision shifts one count by 1 at odds ~n²/2⁶⁴), one
    * hash-join + one doc-keyed agg — everything linear in gram volume,
    * no posting lists, no pair space. */
  def noveltyVsReference(cand: DataFrame, ref: DataFrame, idCol: String,
                         textCol: String, w: Int = 3): DataFrame = {
    val cs = shingles(cand, idCol, textCol, w)
      .select(col(idCol), xxhash64(col("shingle")).as("sh")).distinct()
    val rs = shingles(ref, idCol, textCol, w)
      .select(xxhash64(col("shingle")).as("sh")).distinct()
    cs.join(rs.withColumn("__seen", lit(1L)), Seq("sh"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__seen").isNull, 1L).otherwise(0L)).as("n_novel"))
      .select(col(idCol), col("n_grams"), col("n_novel"),
        TimeSeries.portableRound6(col("n_novel").cast("double") /
          col("n_grams").cast("double")).as("novelty_frac"))
  }

  /** Exact dedup: group identical normalized texts, keep the smallest id.
    * Returns (text_hash, keep_id, n_copies). */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), TextAnalysis.fingerprint(col(textCol)).as("text_hash"))
      .groupBy(col("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Effectively-once by message id (SURVEY X2): the reference dedups ISB
    * writes by `MessageID` within a dedup window (numaflow
    * `rust/numaflow-core/src/pipeline/isb/jetstream/js_writer.rs:167-195`).
    * Streaming: `dropDuplicatesWithinWatermark` — state is bounded by the
    * watermark delay, the exact analog of JetStream's windowed dedup, so
    * it holds at 100 TB/day ingest (state ∝ ids per window, not stream).
    * Batch: plain `dropDuplicates` (the oracle-checkable twin). */
  def byId(df: DataFrame, idCols: Seq[String]): DataFrame =
    if (df.isStreaming) df.dropDuplicatesWithinWatermark(idCols)
    else df.dropDuplicates(idCols)

  /** Mersenne prime 2^31-1 and fixed odd 31-bit affine constants for the
    * minhash permutation family h_i(x) = (A(i)·x + B(i)) mod P. One md5
    * per shingle (not per shingle×perm) keeps the hash cost linear; the
    * affine mix is exact 64-bit integer math, so any SQL engine reproduces
    * it bit-for-bit (max A·x + B = (2^31-1)(2^32-1) + 2^31 < 2^63). */
  val MinhashP = 2147483647L
  val MinhashA: Array[Long] = Array(
    0x4F1BBCDCL, 0x2545F491L, 0x5851F42DL, 0x14057B7EL, 0x685215A5L, 0x5DEECE66L,
    0x0BB38435L, 0x3C6EF372L, 0x1F83D9ABL, 0x5BE0CD19L, 0x6A09E667L, 0x3243F6A8L,
    0x13198A2EL, 0x03707344L, 0x243F6A88L, 0x082EFA98L).map(a => (a % MinhashP) | 1L)
  val MinhashB: Array[Long] = Array(
    0x299F31D0L, 0x085A308DL, 0x38D01377L, 0x452821E6L, 0x243F6A89L, 0x13198A2FL,
    0x5A827999L, 0x6ED9EBA1L, 0x70E44324L, 0x359C34A5L, 0x1B873593L, 0x61C88647L,
    0x2C1B3C6DL, 0x297A2D39L, 0x9E3779B1L, 0x85EBCA6BL).map(_ % MinhashP)

  /** h_seed(base) where base = first-8-hex of md5(shingle) — one md5 per
    * shingle, shared by every permutation. */
  private def minhashBase: Column =
    conv(substring(md5(to_binary(col("shingle"), lit("utf-8"))), 1, 8), 16, 10).cast("long")

  /** Wide MinHash signature from ONE groupBy(id) over an exploded shingle
    * frame — parallel min aggregates with map-side partial aggregation.
    * Every pipeline uses [[minhashSignatureExpr]] (same values, zero
    * shuffle); this grouped form is its differential-testing twin — the
    * equivalence is asserted over random corpora in WindowPropertiesSpec. */
  def minhashSignature(sh: DataFrame, idCol: String, numPerm: Int): DataFrame = {
    require(numPerm <= MinhashA.length, s"at most ${MinhashA.length} permutations")
    val aggs = (0 until numPerm).map { i =>
      min(pmod(lit(MinhashA(i)) * minhashBase + lit(MinhashB(i)), lit(MinhashP))).as(s"h$i")
    }
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Shingle array per doc as a pure expression (no explode): the w-gram
    * windows of the token array. Empty for docs shorter than w tokens
    * (and for null text — the composable form's contract, preserved by
    * the coalesce). Native [[graft.functions.WordShingles]] under the
    * hood: the transform/slice/concat_ws formulation re-ran the regex
    * split once PER SHINGLE (HOF lambdas evaluate interpreted, no
    * cross-lambda subexpression elimination) — one pass over sf0.1's
    * documents cost 2.6 s; the native expression splits once per row. */
  def shingleArray(textCol: Column, w: Int): Column =
    coalesce(graft.functions.WordShingles(textCol, w),
      // containsNull = false, matching WordShingles' own element type: a
      // `cast("array<string>")` fallback is element-NULLABLE, which makes
      // the exploded shingle nullable, which lets joins push isnotnull
      // filters into SOME of a kernel's repeated census subtrees — they
      // stop canonicalizing equal and AQE exchange reuse dies (the
      // text_lm_interp 3-ReusedExchange guard caught exactly this)
      array().cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, containsNull = false)))

  /** EXPRESSION-ONLY MinHash signature: identical values to
    * [[minhashSignature]] (min over a multiset equals min over its set),
    * but computed as a per-row projection — array_min over the hashed
    * shingle array — so signatures cost ZERO shuffle. At 100 TB this
    * deletes the largest shuffle of the dedup pipeline; the only
    * remaining exchange in candidate generation is the (band, bucket)
    * posting aggregation, which moves one row per doc-band.
    *
    * The md5-derived base array is hoisted into its own projection: the
    * numPerm minimums each rescan it, and inlining would re-run one md5
    * PER PERMUTATION per shingle (the transform-lambda re-evaluation
    * trap). Docs with no shingles are dropped, matching the grouped
    * form (they produce no shingle rows there). Streaming-safe: a plain
    * projection works in any output mode with no state. */
  def minhashSignatureExpr(docs: DataFrame, idCol: String, textCol: String,
                           numPerm: Int, shingleW: Int): DataFrame =
    withMinhashSignature(docs.select(col(idCol), col(textCol)),
      textCol, numPerm, shingleW).drop(textCol)

  /** [[minhashSignatureExpr]] keeping every input column (h0..hN appended)
    * — the form streaming operators use to carry event time through. */
  def withMinhashSignature(docs: DataFrame, textCol: String,
                           numPerm: Int, shingleW: Int): DataFrame = {
    require(numPerm <= MinhashA.length, s"at most ${MinhashA.length} permutations")
    // ONE native compiled pass per row (graft.functions.MinhashSignature)
    // — the old transform + numPerm × array_min(transform(pmod)) chain
    // ran 1 + numPerm INTERPRETED array traversals per doc (HOFs are
    // CodegenFallback); value-identical by construction, asserted
    // against the grouped aggregate form in WindowPropertiesSpec.
    val sig = graft.functions.MinhashSignature(
      shingleArray(col(textCol), shingleW), numPerm)
    docs
      // cheap guard FIRST (token count), so the pushed-down filter never
      // re-evaluates the md5 pass just to test emptiness.
      .where(size(split(col(textCol), " ")) >= shingleW)
      .withColumn("__mh_sig", sig)
      .select(docs.columns.map(col).toIndexedSeq ++ (0 until numPerm).map { i =>
        element_at(col("__mh_sig"), i + 1).as(s"h$i")
      }: _*)
  }

  /** Candidate pairs from a wide signature frame: band buckets are a
    * map-side projection over the h_i columns (banding costs NO shuffle —
    * the signature row already holds every component), then one
    * groupBy(band, bucket) builds posting lists whose pairs expand
    * map-side. Returns distinct (a, b) with a < b.
    *
    * Bucket components are "|"-separated: variable-width decimal minhash
    * values concatenated bare would alias distinct signatures (e.g. [1,23]
    * vs [12,3]) into one bucket and fabricate candidate pairs.
    *
    * Posting lists, NOT a banded self-join: Catalyst does not reuse the
    * signature subplan across a self-join's two sides, so the join shape
    * would compute every minhash TWICE — the dominant cost at any scale. */
  /** (id, band, bucket) rows from a wide signature frame — banding is a
    * map-side projection (the signature row already holds every h_i). */
  def bandedBuckets(sig: DataFrame, idCol: String,
                    numPerm: Int, rowsPerBand: Int): DataFrame = {
    val nBands = numPerm / rowsPerBand
    val buckets = (0 until nBands).map { j =>
      concat_ws("|", (j * rowsPerBand until (j + 1) * rowsPerBand).map(i => col(s"h$i")): _*)
    }
    sig.select(col(idCol), posexplode(array(buckets: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
  }

  def bandedPairs(sig: DataFrame, idCol: String,
                  numPerm: Int, rowsPerBand: Int): DataFrame = {
    bandedBuckets(sig, idCol, numPerm, rowsPerBand)
      .groupBy(col("band"), col("bucket"))
      .agg(sort_array(collect_set(col(idCol))).as("ids"))
      .where(size(col("ids")) >= 2)
      // ids sorted ascending → every emitted pair already has a < b.
      .select(explode(flatten(transform(col("ids"), (a, i) =>
        transform(
          slice(col("ids"), i + lit(2), greatest(size(col("ids")) - i - 1, lit(0))),
          b => struct(a.as("a"), b.as("b")))))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b")).distinct()
  }

  /** Star edges per (band, bucket): (min id → each other id). For
    * CONNECTIVITY consumers (connected components) this is equivalent to
    * the full pair expansion — every bucket member reaches the bucket's
    * min, so the transitive closure is identical — but the emitted edge
    * count is LINEAR in bucket size where [[bandedPairs]] is quadratic.
    * This is the giant-cluster kill-switch at 100 TB: one million
    * near-identical docs landing in a single band bucket emit ~10^6 star
    * edges instead of ~5·10^11 pairs. NOT a substitute where actual
    * candidate PAIRS are the product (verification, pair reports) —
    * those paths genuinely enumerate pairs and use [[bandedPairs]]. */
  def bandedStarEdges(sig: DataFrame, idCol: String,
                      numPerm: Int, rowsPerBand: Int): DataFrame =
    bandedBuckets(sig, idCol, numPerm, rowsPerBand)
      .groupBy(col("band"), col("bucket"))
      .agg(sort_array(collect_set(col(idCol))).as("ids"))
      .where(size(col("ids")) >= 2)
      .select(col("ids")(0).as("a"),
        explode(slice(col("ids"), lit(2), size(col("ids")) - 1)).as("b"))
      .distinct()

  /** MinHash-LSH candidate pairs: expression-only signature (no shuffle)
    * → banded posting lists. ONE shuffle end to end (the bucket agg)
    * plus the final distinct. */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      numPerm: Int = 12, rowsPerBand: Int = 3, shingleW: Int = 3): DataFrame =
    bandedPairs(minhashSignatureExpr(docs, idCol, textCol, numPerm, shingleW),
      idCol, numPerm, rowsPerBand)

  /** SimHash (32-bit, md5-derived): per doc, bit i of the hash of each
    * token votes +count/-count; simhash bit i = majority sign.
    * Returns (id, simhash). Near-dups then pair on small Hamming distance
    * — at scale via pivoted 8-bit chunks (4 exact-match probes). */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = docs.select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .groupBy(col(idCol), col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("h", conv(substring(md5(to_binary(col("word"), lit("utf-8"))), 1, 8), 16, 10)
        .cast("long"))
    // all 32 bit-votes as parallel aggregates of one groupBy(id) — no 32×
    // bit explosion before the shuffle; the bit pack happens post-agg.
    val votes = (0 until 32).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, col("cnt"))
        .otherwise(-col("cnt"))).as(s"v$b")
    }
    words.groupBy(col(idCol))
      .agg(votes.head, votes.tail: _*)
      .select(col(idCol),
        (0 until 32).map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-duplicate pairs with Hamming distance <= maxHamming.
    *
    * Scale shape: the 32-bit simhash splits into four 8-bit chunks; by
    * pigeonhole, any pair within Hamming distance 3 agrees on at least
    * one chunk, so candidates come from FOUR exact-match probes
    * (join on (band, chunk)) — never an all-pairs scan — and the cheap
    * bit_count(xor) verification runs per candidate only. */
  def simhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                          maxHamming: Int = 3): DataFrame = {
    // The signature table is persisted so the word-explode aggregation
    // runs ONCE across the self-join's two sides (Catalyst has no
    // cross-side subplan reuse); it is tiny — two longs per doc.
    //
    // Unlike minhash, pairing stays a SELF-JOIN here: 8-bit chunks have
    // ≤256 values per band, so per-(band, chunk) posting lists are
    // collision-heavy and skewed (one bucket can hold a large corpus
    // fraction) — a measured posting-list variant was ~70% slower than
    // the codegen'd streaming join. Minhash bands are high-entropy, which
    // is why the opposite tradeoff wins there.
    val sh = simhash(docs, idCol, textCol).persist()
    val bands = sh.select(col(idCol).as("id"), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("simhash"), b * 8).bitwiseAND(255)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")
    val l = bands.select(col("id").as("a"), col("simhash").as("ha"), col("band"), col("chunk"))
    val r = bands.select(col("id").as("b"), col("simhash").as("hb"), col("band"), col("chunk"))
    l.join(r, Seq("band", "chunk")).where(col("a") < col("b"))
      .select(col("a"), col("b"),
        expr("CAST(bit_count(ha ^ hb) AS INT)").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Banded Hamming near-dup pairs over ANY precomputed bit-fingerprint
    * column (perceptual image hashes, simhashes from elsewhere): split
    * the `totalBits`-bit hash into `bands` equal chunks, self-join on
    * (band, chunk), verify exact Hamming ≤ `maxHamming`. Pigeonhole
    * exactness: bands > maxHamming guarantees every qualifying pair
    * shares at least one band — no recall loss. The hash table is
    * persisted (two longs per row) so the caller's — possibly expensive,
    * e.g. an image decode — hash computation runs once across the
    * self-join's two sides, the [[simhashNearDupPairs]] rule. */
  def hammingPairs(hashes: DataFrame, idCol: String, hashCol: String,
                   totalBits: Int, bands: Int, maxHamming: Int): DataFrame = {
    require(bands > maxHamming, "bands must exceed maxHamming for exactness")
    require(totalBits % bands == 0, "bands must divide totalBits")
    val chunkBits = totalBits / bands
    val mask = (1L << chunkBits) - 1
    val h = hashes.select(col(idCol).as("id"), col(hashCol).cast("long").as("h"))
      .persist()
    val banded = h.select(col("id"), col("h"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("h"), b * chunkBits).bitwiseAND(mask)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")
    val l = banded.select(col("id").as("a"), col("h").as("ha"),
      col("band"), col("chunk"))
    val r = banded.select(col("id").as("b"), col("h").as("hb"),
      col("band"), col("chunk"))
    l.join(r, Seq("band", "chunk")).where(col("a") < col("b"))
      .select(col("a"), col("b"),
        expr("CAST(bit_count(ha ^ hb) AS INT)").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Incremental dedup — the production recurring-crawl shape: candidate
    * collisions between an INCOMING batch and the EXISTING corpus only
    * (new×new pairs come from [[minhashLshPairs]] on the increment alone;
    * old×old was settled in previous runs). Returns distinct
    * (new_id, old_id).
    *
    * At 100 TB the existing side is a persisted signature table keyed by
    * (band, bucket) — bucketed storage makes this a co-located join with
    * NO shuffle of the corpus; only the (small) increment's buckets move.
    * Each side's signature aggregation runs once; the join output is
    * bounded by band collisions, same as the symmetric case. */
  def incrementalDupPairs(existing: DataFrame, incoming: DataFrame,
                          idCol: String, textCol: String,
                          numPerm: Int = 12, rowsPerBand: Int = 3,
                          shingleW: Int = 3): DataFrame = {
    def buckets(df: DataFrame) = bandedBuckets(
      minhashSignatureExpr(df, idCol, textCol, numPerm, shingleW),
      idCol, numPerm, rowsPerBand)
    buckets(incoming).withColumnRenamed(idCol, "new_id")
      .join(buckets(existing).withColumnRenamed(idCol, "old_id"),
        Seq("band", "bucket"))
      .select(col("new_id"), col("old_id")).distinct()
  }

  /** Persist the banded minhash signature table BUCKETED by its join key
    * (band, bucket) — the settled side of incremental dedup as a reusable
    * artifact. One write-time shuffle, amortized over every later
    * increment: subsequent [[incrementalDupPairsFromTable]] joins read the
    * settled corpus co-located, with NO exchange on that side
    * (plan-asserted in ScaleSpec). */
  def writeSignatureTable(docs: DataFrame, idCol: String, textCol: String,
                          table: String, buckets: Int,
                          numPerm: Int = 12, rowsPerBand: Int = 3,
                          shingleW: Int = 3): Unit =
    Scale.writeBucketed(
      bandedBuckets(minhashSignatureExpr(docs, idCol, textCol, numPerm, shingleW),
        idCol, numPerm, rowsPerBand),
      table, buckets, keyCols = Seq("band", "bucket"))

  /** [[incrementalDupPairs]] with the existing side served from a
    * persisted [[writeSignatureTable]] table: only the increment computes
    * signatures and shuffles into the bucket layout; the settled corpus
    * never moves. The parameters must match the table's write-time
    * values or buckets will not align. */
  def incrementalDupPairsFromTable(spark: org.apache.spark.sql.SparkSession,
                                   table: String, incoming: DataFrame,
                                   idCol: String, textCol: String,
                                   numPerm: Int = 12, rowsPerBand: Int = 3,
                                   shingleW: Int = 3): DataFrame =
    bandedBuckets(minhashSignatureExpr(incoming, idCol, textCol, numPerm, shingleW),
      idCol, numPerm, rowsPerBand)
      .withColumnRenamed(idCol, "new_id")
      .join(spark.table(table).withColumnRenamed(idCol, "old_id"),
        Seq("band", "bucket"))
      .select(col("new_id"), col("old_id")).distinct()

  /** The production two-stage near-dup pipeline: MinHash-LSH generates
    * candidates (bounded by band collisions), exact shingle-set Jaccard
    * verifies ONLY those candidates — the per-pair cost never touches the
    * corpus-wide pair space. This is the shape to run at 100 TB;
    * [[ngramJaccardPairs]] is the exhaustive (capped) reference. */
  def lshVerifiedPairs(docs: DataFrame, idCol: String, textCol: String,
                       threshold: Double, numPerm: Int = 12, rowsPerBand: Int = 3,
                       shingleW: Int = 3): DataFrame = {
    // Candidate generation and verification are both expression-first:
    // signatures cost no shuffle, and the per-doc shingle SET is a plain
    // projection (no explode + collect_set aggregation) of sorted distinct
    // xxhash64 values — set identity, not text. The verify joins
    // hash-shuffle on the candidate ids; candidate volume is bounded by
    // band collisions, so AQE broadcasts that side and the corpus never
    // reshuffles. Per-pair scoring is the native fused two-pointer merge
    // ([[graft.functions.SortedJaccard]]) — one codegen pass, no
    // intermediate arrays, vs array_intersect + array_union's two.
    val cands = minhashLshPairs(docs, idCol, textCol, numPerm, rowsPerBand, shingleW)
    val sets = docs.select(col(idCol),
      sort_array(array_distinct(
        transform(shingleArray(col(textCol), shingleW), s => xxhash64(s)))).as("sh"))
    cands
      .join(sets.select(col(idCol).as("a"), col("sh").as("sa")), "a")
      .join(sets.select(col(idCol).as("b"), col("sh").as("sb")), "b")
      .withColumn("jaccard", graft.functions.SortedJaccard(col("sa"), col("sb")))
      .where(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** ORDER-SENSITIVE verification of the LSH candidates: the same banded
    * candidate generation as [[lshVerifiedPairs]], but scored by
    * token-level LCS similarity 2·LCS/(|a|+|b|) (the ROUGE-L F form,
    * one native [[graft.functions.LcsLength]] call per pair) instead of
    * shingle-set Jaccard. The two verifiers disagree exactly on
    * REORDERED near-dups — a doc whose sentences were shuffled keeps
    * most of its shingle set (Jaccard passes) but loses its long common
    * subsequence (LCS fails), so this is the verifier to use when the
    * dedup policy should keep reordered remixes as distinct documents.
    * Candidate volume bounds every join (the lshVerifiedPairs scale
    * argument); per-pair cost is O(|a|·|b|) on token counts, row-local. */
  def lcsVerifiedPairs(docs: DataFrame, idCol: String, textCol: String,
                       threshold: Double, numPerm: Int = 12, rowsPerBand: Int = 3,
                       shingleW: Int = 3): DataFrame = {
    val cands = minhashLshPairs(docs, idCol, textCol, numPerm, rowsPerBand, shingleW)
    val toks = docs.select(col(idCol), split(col(textCol), " ").as("tk"))
    cands
      .join(toks.select(col(idCol).as("a"), col("tk").as("ta")), "a")
      .join(toks.select(col(idCol).as("b"), col("tk").as("tb")), "b")
      .withColumn("lcs", graft.functions.LcsLength(col("ta"), col("tb")))
      .withColumn("sim_raw", lit(2.0) * col("lcs").cast("double") /
        (size(col("ta")) + size(col("tb"))).cast("long").cast("double"))
      .where(col("sim_raw") >= threshold)
      .select(col("a"), col("b"), col("lcs"),
        graft.ops.TimeSeries.portableRound4(col("sim_raw")).as("lcs_sim"))
  }

  /** Estimator calibration for MinHash: for every LSH candidate pair,
    * the signature-agreement ESTIMATE (matching components / numPerm —
    * an unbiased Jaccard estimator, Broder 1997) next to the EXACT
    * shingle-set Jaccard — the table that tells an operator how much
    * the banding geometry under/over-shoots on their corpus before they
    * trust a threshold. Signatures and sets are both zero-shuffle
    * projections; candidates bound every join. */
  def minhashCalibration(docs: DataFrame, idCol: String, textCol: String,
                         numPerm: Int = 12, rowsPerBand: Int = 3,
                         shingleW: Int = 3): DataFrame = {
    val cands = minhashLshPairs(docs, idCol, textCol, numPerm, rowsPerBand, shingleW)
    val sig = minhashSignatureExpr(docs, idCol, textCol, numPerm, shingleW)
    val sets = docs.select(col(idCol),
      sort_array(array_distinct(
        transform(shingleArray(col(textCol), shingleW), s => xxhash64(s)))).as("sh"))
    val sigA = sig.select(col(idCol).as("a") +:
      (0 until numPerm).map(i => col(s"h$i").as(s"ha$i")): _*)
    val sigB = sig.select(col(idCol).as("b") +:
      (0 until numPerm).map(i => col(s"h$i").as(s"hb$i")): _*)
    val matches = (0 until numPerm)
      .map(i => when(col(s"ha$i") === col(s"hb$i"), 1).otherwise(0))
      .reduce(_ + _)
    cands.join(sigA, "a").join(sigB, "b")
      .join(sets.select(col(idCol).as("a"), col("sh").as("sa")), "a")
      .join(sets.select(col(idCol).as("b"), col("sh").as("sb")), "b")
      .select(col("a"), col("b"),
        (matches.cast("double") / numPerm).as("est"),
        graft.functions.SortedJaccard(col("sa"), col("sb")).as("jaccard"))
  }

  /** Connected components over a near-dup pair graph: every doc gets
    * cluster_id = the smallest doc id it can reach — the canonical
    * representative — so "keep one per dup cluster" is `WHERE id =
    * cluster_id`. Pairwise dedup alone under-deletes: A~B and B~C leaves
    * both B and C without the transitive closure.
    *
    * Iterative min-label propagation (the standard distributed CC): each
    * round, label(x) := min(label(x), min label among x's neighbors); a
    * round is one shuffle (groupBy dst) + one join, and the loop stops
    * when no label changed. Rounds needed = graph diameter, and dup
    * clusters are near-cliques, so 2-3 rounds in practice — at 100 TB
    * each round is a bounded edge-sized shuffle, never an all-pairs
    * blowup. `localCheckpoint` truncates the growing lineage each round
    * (on a cluster you would checkpoint to durable storage instead).
    *
    * One Spark job per round: the first propagation hop folds into label
    * initialization (label₀ = min(id, min neighbor)), the checkpoint is
    * lazy, and convergence reads a single DECIMAL sum — labels only ever
    * decrease, so Σlabels is strictly decreasing exactly while the
    * labeling still changes (a driver-side scalar per round, same role
    * as GraphX's Pregel active-set count, at half the jobs of a
    * join-and-count diff). */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint()
    // Only edge-touched nodes can ever change label: the loop runs over
    // the dup GRAPH (≈ 2·|pairs| nodes), not the corpus — at 100 TB the
    // dup graph is orders of magnitude smaller than the doc count, and
    // isolated docs join back as their own singleton cluster at the end.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("cluster_id").cast("decimal(38,0)"))).head().getDecimal(0)
    var labels = sym.groupBy(col("src"))
      .agg(min(col("dst")).as("nbest"))
      .select(col("src").as("id"), least(col("src"), col("nbest")).as("cluster_id"))
      .localCheckpoint(eager = false)
    var lastSum = labelSum(labels) // materializes the lazy checkpoint too
    var iter = 1 // init already propagated one hop
    var changed = true
    while (changed && iter < maxIter) {
      // best label reachable in one hop: neighbor labels, min per node.
      val fromNeighbors = sym
        .join(labels.select(col("id").as("src"), col("cluster_id").as("nl")), "src")
        .groupBy(col("dst").as("id")).agg(min(col("nl")).as("nbest"))
      val next = labels
        .join(fromNeighbors, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster_id"), coalesce(col("nbest"), col("cluster_id")))
            .as("cluster_id"))
        .localCheckpoint(eager = false)
      val newSum = labelSum(next)
      changed = newSum != lastSum && newSum != null
      lastSum = newSum
      labels = next
      iter += 1
    }
    val singletons = nodes.select(col("id"))
      .join(labels.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("cluster_id"))
    labels.unionByName(singletons)
  }

  /** Duplicate clusters from MinHash-LSH candidate pairs: (doc_id,
    * cluster_id) for EVERY doc — singletons are their own cluster. */
  def dupClusters(docs: DataFrame, idCol: String, textCol: String,
                  numPerm: Int = 12, rowsPerBand: Int = 3, shingleW: Int = 3): DataFrame = {
    // CC only needs connectivity, so the edge set is the per-bucket STAR
    // ([[bandedStarEdges]]): identical clusters, linear (not quadratic)
    // edge volume when a giant dup cluster floods one bucket.
    val edges = bandedStarEdges(
      minhashSignatureExpr(docs, idCol, textCol, numPerm, shingleW),
      idCol, numPerm, rowsPerBand)
    connectedComponents(docs.select(col(idCol).as("id")), edges)
      .withColumnRenamed("id", idCol)
  }

  /** SOFT dedup (the SoftDeDup alternative to dropping): every doc
    * survives, but near-dup clusters share one doc's worth of training
    * weight — weight = 1/|cluster| — so repeated content stops being
    * over-trained without losing whichever copy carried the cleanest
    * formatting. Feed the weight column into weighted sampling
    * ([[graft.ops.CorpusOps]] sample_weighted) or a loss-weighting
    * column in the packed output.
    *
    * Scale: [[dupClusters]]' star-edge CC (linear edge volume,
    * diameter-bounded rounds, output localCheckpointed) + ONE
    * cluster_id hash-agg joined back on the cluster-sized table — no
    * new corpus-sized machinery. */
  def softDedupWeights(docs: DataFrame, idCol: String, textCol: String,
                       numPerm: Int = 12, rowsPerBand: Int = 3,
                       shingleW: Int = 3): DataFrame =
    softDedupWeightsOf(
      dupClusters(docs, idCol, textCol, numPerm, rowsPerBand, shingleW), idCol)

  /** The weighting layer alone, over a PRE-BUILT cluster map (doc →
    * cluster_id) — the sidecar-table shape: build the clusters once,
    * run every policy pass against the same table. */
  def softDedupWeightsOf(clusters: DataFrame, idCol: String): DataFrame = {
    val sizes = clusters.groupBy(col("cluster_id")).agg(count(lit(1)).as("n_dups"))
    clusters.join(sizes, "cluster_id")
      .select(col(idCol), col("cluster_id"), col("n_dups"),
        TimeSeries.portableRound6(
          lit(1.0) / col("n_dups").cast("double")).as("weight"))
  }

  /** Bloom-prefiltered incremental span dedup — the recurring-crawl
    * contamination check with a MAP-SIDE kill-switch: build a Bloom
    * filter over the settled corpus's w-token span hashes, broadcast it,
    * and drop every incoming span the filter rejects BEFORE any shuffle.
    * A Bloom filter has no false negatives, so the prefilter keeps every
    * true collision; the exact verify join on the span text then removes
    * its false positives — the final (new_id, old_id) pair set is EXACT,
    * identical to a full span join (oracle-checked as dedup_bloom_incr).
    *
    * Scale shape: at 100 TB/crawl the dominant cost of incremental span
    * dedup is shuffling the increment's span universe into the join; the
    * bloom cuts that to `collisions + fpp * spans` rows — at fpp = 1%
    * a 99%-clean crawl shuffles ~2% of its spans instead of all of them.
    * The filter itself is `numBits(expectedSpans, fpp)` bits (~1.2 MB per
    * 10^6 spans at 1%) built with one `treeAggregate` pass and shipped
    * once per executor via broadcast. The settled side would be a
    * persisted span table in production (cf. [[writeSignatureTable]]);
    * here it is recomputed per call, which also keeps the two passes'
    * span definitions trivially in sync.
    *
    * The settled span frame stays persisted while the returned plan is
    * live (the verify join reads it); release it with `unpersist` on the
    * result's cached lineage or a cache clear once consumed. */
  def bloomIncrementalSpans(existing: DataFrame, incoming: DataFrame,
                            idCol: String, textCol: String, w: Int = 15,
                            expectedSpans: Long = 4L << 20,
                            fpp: Double = 0.01): DataFrame = {
    // One explode of the settled corpus serves both passes: the bloom
    // build (an action — it materializes the cache) and the verify join.
    val settled = shingles(existing, idCol, textCol, w)
      .select(col(idCol).as("old_id"), col("shingle"))
      .persist()
    // expectedSpans is the CAP: the bitmap is sized from the settled
    // side's real span count (Scale.sizedBloom — result-invisible, the
    // verify join removes false positives either way)
    val bloom = Scale.sizedBloom(
      settled.select(xxhash64(col("shingle")).as("h")), "h",
      cap = expectedSpans, fpp = fpp)
    val bc = existing.sparkSession.sparkContext.broadcast(bloom)
    shingles(incoming, idCol, textCol, w)
      .withColumnRenamed(idCol, "new_id")
      // map-side, pre-shuffle, and INSIDE whole-stage codegen: a native
      // probe expression, not a UDF boundary (functions/BloomProbe.scala)
      .where(graft.functions.BloomProbe(xxhash64(col("shingle")), bc))
      .join(settled, "shingle")                      // exact verify on text
      .select(col("new_id"), col("old_id")).distinct()
  }

  /** Persist the settled corpus's spans as a table BUCKETED by the join
    * key (shingle) plus a Bloom SIDECAR of the span hashes — the two
    * artifacts [[bloomIncrementalSpansFromTable]] probes on every
    * recurring crawl. One write-time shuffle + one bloom-build scan of
    * the persisted table, amortized over every later increment. The bloom
    * is built from the table AS WRITTEN, so filter and table can never
    * disagree about the span definition. */
  def writeSpanTable(docs: DataFrame, idCol: String, textCol: String,
                     table: String, buckets: Int, bloomPath: String,
                     w: Int = 15, expectedSpans: Long = 4L << 20,
                     fpp: Double = 0.01): Unit = {
    Scale.writeBucketed(
      shingles(docs, idCol, textCol, w)
        .select(col(idCol).as("old_id"), col("shingle")),
      table, buckets, keyCols = Seq("shingle"))
    val bloom = docs.sparkSession.table(table)
      .select(xxhash64(col("shingle")).as("h"))
      .stat.bloomFilter("h", expectedSpans, fpp)
    writeBloom(bloomPath, bloom)
  }

  /** Bloom-sidecar (de)serialization — ONE definition of the on-disk
    * format for every artifact producer/consumer (local filesystem by
    * contract: the sidecar lives next to the driver, ships via
    * broadcast). */
  private[graft] def readBloom(path: String): org.apache.spark.util.sketch.BloomFilter = {
    val in = new java.io.BufferedInputStream(new java.io.FileInputStream(path))
    try org.apache.spark.util.sketch.BloomFilter.readFrom(in) finally in.close()
  }

  private[graft] def writeBloom(path: String,
                                bf: org.apache.spark.util.sketch.BloomFilter): Unit = {
    val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(path))
    try bf.writeTo(out) finally out.close()
  }

  /** [[bloomIncrementalSpans]] against persisted artifacts: the bloom
    * sidecar loads once and broadcasts; only increment spans that probe
    * positive shuffle into the settled table's bucket layout — the
    * settled corpus itself NEVER moves (bucketed scan, no exchange;
    * plan-asserted in ScaleSpec). This is the production recurring-crawl
    * loop: write the table once, probe every crawl against it. */
  def bloomIncrementalSpansFromTable(spark: org.apache.spark.sql.SparkSession,
                                     table: String, bloomPath: String,
                                     incoming: DataFrame, idCol: String,
                                     textCol: String, w: Int = 15): DataFrame = {
    val bc = spark.sparkContext.broadcast(readBloom(bloomPath))
    shingles(incoming, idCol, textCol, w)
      .withColumnRenamed(idCol, "new_id")
      .where(graft.functions.BloomProbe(xxhash64(col("shingle")), bc))
      .join(spark.table(table), "shingle")
      .select(col("new_id"), col("old_id")).distinct()
  }

  /** One turn of the recurring-crawl ADMISSION loop over the persisted
    * artifacts: detect the batch's collisions against the settled corpus
    * ([[bloomIncrementalSpansFromTable]]), then EXTEND the corpus with
    * the clean docs — their spans append into the bucketed table (same
    * bucket spec, so co-location holds for every later crawl) and their
    * span hashes merge into the bloom sidecar (same numBits/hash count ⇒
    * `mergeInPlace` is exact). Returns the collision pairs; the NEXT
    * batch collides against everything admitted so far, not just the
    * original corpus.
    *
    * Collisions are checked BOTH ways: against the settled corpus and
    * WITHIN the batch (per shared span, the smallest clean id is
    * admitted; the rest are rejected as pairs against it) — a crawler
    * re-emitting the same page twice inside one batch must not settle
    * it twice. Self-pairs (new_id = old_id) are filtered: they can only
    * arise when a crash-replayed batch re-probes spans its first attempt
    * already admitted, and rejecting a doc against itself would turn an
    * at-least-once replay into data loss.
    *
    * `expectedSpans`/`fpp` MUST match the sidecar's creation parameters
    * (merge requires compatible filters). The bloom saturates as the
    * corpus outgrows expectedSpans — fpp rises, which costs verify-join
    * work but never correctness (no false negatives ever); production
    * rebuilds the sidecar from the table on a rollover cadence. */
  def admitCrawl(spark: org.apache.spark.sql.SparkSession,
                 table: String, bloomPath: String, batch: DataFrame,
                 idCol: String, textCol: String, w: Int = 15,
                 expectedSpans: Long = 4L << 20,
                 fpp: Double = 0.01): DataFrame = {
    val settledC = bloomIncrementalSpansFromTable(
      spark, table, bloomPath, batch, idCol, textCol, w)
      .where(col("new_id") =!= col("old_id")) // replay self-match, not a dup
      .persist()
    val cleanVsSettled = batch.join(
      settledC.select(col("new_id").as(idCol)).distinct(), Seq(idCol), "left_anti")
    // within-batch: per shared span the smallest id wins, others pair
    // against it (the star shape — linear in members, like bandedStarEdges)
    val intra = shingles(cleanVsSettled, idCol, textCol, w)
      .groupBy(col("shingle"))
      .agg(sort_array(collect_set(col(idCol))).as("ids"))
      .where(size(col("ids")) >= 2)
      .select(explode(slice(col("ids"), lit(2), size(col("ids")) - 1)).as("new_id"),
        element_at(col("ids"), 1).as("old_id"))
      .distinct().persist()
    val clean = cleanVsSettled.join(
      intra.select(col("new_id").as(idCol)).distinct(), Seq(idCol), "left_anti")
    val collisions = settledC.unionByName(intra).persist()
    collisions.count() // materialize the result before the parts release
    val newSpans = shingles(clean, idCol, textCol, w)
      .select(col(idCol).as("old_id"), col("shingle")).persist()
    // A fully-rejected batch extends nothing (and stat.bloomFilter NPEs
    // on an empty frame — its aggregate returns a null buffer).
    if (!newSpans.isEmpty) {
      val buckets = spark.sql(s"DESCRIBE EXTENDED $table")
        .where(col("col_name") === "Num Buckets")
        .select("data_type").head().getString(0).trim.toInt
      newSpans.write.mode("append")
        .bucketBy(buckets, "shingle").format("parquet").saveAsTable(table)
      val add = newSpans.select(xxhash64(col("shingle")).as("h"))
        .stat.bloomFilter("h", expectedSpans, fpp)
      val merged = readBloom(bloomPath)
      merged.mergeInPlace(add)
      writeBloom(bloomPath, merged)
    }
    newSpans.unpersist(); settledC.unpersist(); intra.unpersist()
    collisions // persisted; the caller releases (admitSink does)
  }

  /** Per-doc contamination fraction of an incoming crawl against a
    * settled corpus — the POLICY layer over incremental span dedup: the
    * share of each new doc's tokens covered by at least one w-token span
    * the settled side already contains, plus the keep/drop verdict at
    * `maxFrac` (the benchmark-decontamination rule: drop training docs
    * that overlap the eval set beyond a threshold; overlapping spans
    * count each token once via distinct positions, as [[dupFraction]]).
    *
    * Scale shape: the settled side reduces to its DISTINCT span set
    * (one hash-agg); the incoming side explodes once, bloom-prefilters
    * map-side (same no-false-negative argument as
    * [[bloomIncrementalSpans]] — the semi-join removes bloom false
    * positives, so the fraction is exact), and aggregates per doc id —
    * high-cardinality key, no skew. The settled span set stays persisted
    * while the returned plan is live; clear the cache once consumed. */
  def contaminationFraction(existing: DataFrame, incoming: DataFrame,
                            idCol: String, textCol: String, w: Int = 15,
                            maxFrac: Double = 0.2,
                            expectedSpans: Long = 4L << 20,
                            fpp: Double = 0.01): DataFrame = {
    val settled = shingles(existing, idCol, textCol, w)
      .select(col("shingle")).distinct().persist()
    // expectedSpans caps the bitmap; the real (distinct) span count
    // sizes it (Scale.sizedBloom — FPs die in the semi-join, so the
    // fraction is exact at any bloom size)
    val bloom = Scale.sizedBloom(
      settled.select(xxhash64(col("shingle")).as("h")), "h",
      cap = expectedSpans, fpp = fpp)
    val bc = existing.sparkSession.sparkContext.broadcast(bloom)
    val covered = incoming
      .select(col(idCol), posexplode(shingleArray(col(textCol), w)))
      .withColumnRenamed("pos", "p").withColumnRenamed("col", "shingle")
      .where(graft.functions.BloomProbe(xxhash64(col("shingle")), bc))
      .join(settled, Seq("shingle"), "leftsemi")
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("p"))).as("ps"))
      .select(col(idCol), coveredLen(col("ps"), w).as("n_contam_tokens"))
    incoming.select(col(idCol), TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))
      .join(covered, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_contam_tokens"), lit(0L)).as("n_contam_tokens"),
        round(coalesce(col("n_contam_tokens"), lit(0L)).cast("double") /
          col("n_tokens"), 4).as("contam_frac"))
      .withColumn("keep", col("contam_frac") < lit(maxFrac))
  }

  /** Cross-document duplicated token spans: every w-token window that
    * appears verbatim in >= 2 distinct docs — the detection half of
    * substring-level dedup (long shared spans are boilerplate/quotation
    * contamination that document-level near-dup scoring dilutes away).
    * Returns (span_id = md5 of the span, n_docs, first_doc, last_doc).
    *
    * Scale shape: one explode + one hash-aggregate on the span text;
    * map-side partial aggregation collapses within-partition repeats, so
    * the shuffle carries ~distinct spans. The md5 is computed AFTER the
    * aggregate (once per distinct span, not once per occurrence). */
  def dupSpans(docs: DataFrame, idCol: String, textCol: String, w: Int = 15): DataFrame =
    shingles(docs, idCol, textCol, w)
      .groupBy(col("shingle"))
      .agg(countDistinct(col(idCol)).as("n_docs"),
        min(col(idCol)).as("first_doc"), max(col(idCol)).as("last_doc"))
      .where(col("n_docs") >= 2)
      .select(md5(to_binary(col("shingle"), lit("utf-8"))).as("span_id"),
        col("n_docs"), col("first_doc"), col("last_doc"))

  /** Per-doc duplicate-token fraction: the share of a doc's tokens
    * covered by at least one cross-document duplicated w-token span —
    * the doc-level "duplicate fraction" quality filter of curation
    * pipelines (docs above a cutoff are boilerplate-heavy). Builds on
    * [[dupSpans]] semantics but keeps span POSITIONS so overlapping
    * spans count each token once.
    *
    * Scale shape: positions explode to w rows per duplicated-span
    * occurrence only (the dup-span join prunes unique spans first, and
    * AQE broadcasts the span list when it is small); the final
    * distinct-position count aggregates per doc — high-cardinality key,
    * no skew. */
  /** Distinct (id, tokpos) pairs covered by at least one cross-document
    * duplicated w-token span — the shared intermediate of the span
    * family ([[dupFraction]] counts it, [[removeSharedSpans]] collects
    * it): "shared by >=2 distinct docs" ⟺ min(id) != max(id) over the
    * shingle partition — a WINDOW, not an aggregate+self-join: the
    * explode runs once and the span universe shuffles once (an agg+join
    * shape re-computes the corpus explode on both sides; measured ~40%
    * slower). Emitted DISTINCT so overlapping spans count each token
    * once and both consumers aggregate it directly. */
  def spanCoverage(docs: DataFrame, idCol: String, textCol: String,
                   w: Int = 15): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val occ = docs.select(col(idCol), posexplode(shingleArray(col(textCol), w)))
      .withColumnRenamed("pos", "p").withColumnRenamed("col", "shingle")
    val win = Window.partitionBy(col("shingle"))
    occ
      .withColumn("mn", min(col(idCol)).over(win))
      .withColumn("mx", max(col(idCol)).over(win))
      .where(col("mn") =!= col("mx"))
      .select(col(idCol), explode(sequence(col("p"), col("p") + lit(w - 1))).as("tokpos"))
      .distinct()
  }

  /** Union length of the fixed-width intervals [p, p+w−1] over the
    * SORTED distinct start positions `ps`: Σ least(nextₚ − p, w) over
    * consecutive pairs, plus w for the last interval — exactly
    * |∪ [p, p+w−1]|, i.e. the countDistinct-token-positions value the
    * span family used to compute by exploding every interval w ways
    * and distinct-counting the fan (guide §2.3: the fan multiplied the
    * aggregate's input ×w for a number derivable from the starts). */
  private def coveredLen(ps: Column, w: Int): Column =
    (aggregate(
      zip_with(slice(ps, lit(1), size(ps) - 1), slice(ps, lit(2), size(ps) - 1),
        (a, b) => least(b - a, lit(w))),
      lit(0L), (acc, x) => acc + x) + lit(w)).cast("long")

  def dupFraction(docs: DataFrame, idCol: String, textCol: String,
                  w: Int = 15): DataFrame = {
    // inline span-coverage COUNT: the same shingle-window span universe
    // as [[spanCoverage]], but the per-doc token count folds over the
    // sorted match starts (coveredLen) instead of exploding each span's
    // w positions into a distinct-count (w× less aggregate input; the
    // (id, p) pairs are unique by construction, so no distinct at all)
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy(col("shingle"))
    val counts = docs
      .select(col(idCol), posexplode(shingleArray(col(textCol), w)))
      .withColumnRenamed("pos", "p").withColumnRenamed("col", "shingle")
      .withColumn("mn", min(col(idCol)).over(win))
      .withColumn("mx", max(col(idCol)).over(win))
      .where(col("mn") =!= col("mx"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("p"))).as("ps"))
      .select(col(idCol), coveredLen(col("ps"), w).as("n_dup_tokens"))
    docs.select(col(idCol), TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))
      .join(counts, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"),
        round(coalesce(col("n_dup_tokens"), lit(0L)).cast("double") /
          col("n_tokens"), 4).as("dup_frac"))
  }

  /** The scoring layer alone, over a PRE-BUILT coverage table — the
    * sidecar-table shape (see [[graft.ops.Sidecar]]). */
  def dupFractionOf(coverage: DataFrame, docs: DataFrame,
                    idCol: String, textCol: String): DataFrame = {
    val covered = coverage.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_dup_tokens")) // rows are distinct already
    docs.select(col(idCol), TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))
      .join(covered, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"),
        round(coalesce(col("n_dup_tokens"), lit(0L)).cast("double") /
          col("n_tokens"), 4).as("dup_frac"))
  }

  /** Substring-level dedup, the REMOVAL half (RefinedWeb-style exact
    * substring cleanup): rebuild each doc's text with every token that
    * any cross-document duplicated w-token span covers EXCISED — the
    * transformation [[dupFraction]] only scores. Returns (id,
    * clean_text, n_removed); docs sharing nothing pass through verbatim.
    *
    * Scale shape: identical span-universe pass as [[dupFraction]] (one
    * explode, one window over the shingle key), then covered positions
    * COLLECT per doc — the set is bounded by the doc's own token count,
    * never corpus-sized — and one broadcastable join back onto the
    * corpus; the excision itself is a row-local indexed filter. */
  def removeSharedSpans(docs: DataFrame, idCol: String, textCol: String,
                        w: Int = 15): DataFrame =
    removeSharedSpansOf(spanCoverage(docs, idCol, textCol, w),
      docs, idCol, textCol)

  /** The excision layer alone, over a PRE-BUILT coverage table. */
  def removeSharedSpansOf(coverage: DataFrame, docs: DataFrame,
                          idCol: String, textCol: String): DataFrame = {
    val covered = coverage.groupBy(col(idCol))
      .agg(collect_set(col("tokpos")).as("cov"))
    docs.join(covered, Seq(idCol), "left")
      .select(col(idCol), split(col(textCol), " ").as("toks"),
        coalesce(col("cov"), array().cast("array<int>")).as("cov"))
      .select(col(idCol),
        concat_ws(" ", filter(col("toks"),
          (_, i) => !array_contains(col("cov"), i))).as("clean_text"),
        size(col("cov")).as("n_removed"))
  }

  /** Exact n-gram Jaccard similarity for pairs sharing >=1 shingle.
    * Returns (a, b, jaccard) for jaccard >= threshold, a < b.
    *
    * Hot-shingle cap (`maxDocFreq`): a shingle present in N docs yields
    * N^2/2 candidate rows from the self-join — one stop-phrase shingle is
    * a quadratic skew bomb at 100 TB. Shingles with doc-frequency >
    * maxDocFreq carry ~zero Jaccard signal (they'd need to dominate BOTH
    * docs to matter at any useful threshold) and are dropped from the
    * universe before sizing and joining, so the bound applies to both the
    * numerator and denominators consistently. The hot set is tiny →
    * broadcast anti-join, no extra shuffle on the big side. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        threshold: Double, w: Int = 3, maxDocFreq: Int = 100): DataFrame =
    sharedShingleCounts(docs, idCol, textCol, w, maxDocFreq)
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("na") + col("nb") - col("n_common")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))

  /** CONTAINMENT near-dup pairs: c(A⊆B) = |A∩B| / |A| per direction —
    * the asymmetric complement of Jaccard. A 50-line quote fully inside
    * a 5000-line page scores containment ≈ 1 while Jaccard ≈ 0.01, so
    * this is the detector for subset duplication (quoted articles,
    * boilerplate wrappers, chunk-of-other-doc pages) that symmetric
    * similarity structurally misses. Same posting-list machinery, same
    * hot-shingle cap, same one-shuffle shape as [[ngramJaccardPairs]];
    * pairs survive when EITHER direction clears the threshold. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       threshold: Double, w: Int = 3, maxDocFreq: Int = 100): DataFrame =
    sharedShingleCounts(docs, idCol, textCol, w, maxDocFreq)
      .withColumn("c_a", col("n_common").cast("double") / col("na").cast("double"))
      .withColumn("c_b", col("n_common").cast("double") / col("nb").cast("double"))
      .where(greatest(col("c_a"), col("c_b")) >= threshold)
      .select(col("a"), col("b"), col("c_a"), col("c_b"))

  /** Shared core of the exact pair scorers: (a, b, n_common, na, nb)
    * over the capped shingle universe, a < b. */
  private def sharedShingleCounts(docs: DataFrame, idCol: String, textCol: String,
                                  w: Int, maxDocFreq: Int): DataFrame = {
    // Shuffle 8-byte xxhash64 keys, not raw shingle strings: the posting
    // aggregation only needs shingle IDENTITY (grouping + set membership),
    // never the text, and hashing map-side cuts shuffle bytes ~3× and makes
    // the sort/agg comparisons fixed-width. A 64-bit collision would merge
    // two posting lists (odds ~ n²/2⁶⁴ — negligible against the md5-exact
    // oracle at any testable scale; at 100 TB it shifts one Jaccard count
    // by 1 in the rare colliding pair).
    val sh = shingles(docs, idCol, textCol, w).withColumnRenamed(idCol, "id")
      .select(col("id"), xxhash64(col("shingle")).as("shingle"))
    // ONE shuffle builds the posting list per shingle; the cap drops hot
    // lists wholesale; candidate (a,b) pairs expand map-side from each
    // (bounded) list — no shingle self-join, no second pass over the corpus.
    // collect_set dedups repeated (id, shingle) occurrences — set
    // semantics land here instead of a separate distinct shuffle.
    // NOT persisted: sizes and the pair expansion both read posting, but
    // ReuseExchange shares the shuffle files between them and re-running
    // the collect_set agg off shared shuffle data measures FASTER than a
    // memory-cached copy at every tested scale (persist forces a
    // serialize/deserialize of the array column both ways).
    val posting = sh.groupBy(col("shingle"))
      .agg(sort_array(collect_set(col("id"))).as("ids"))
      .where(size(col("ids")) <= maxDocFreq)
    val sizes = posting.select(explode(col("ids")).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    // ids sorted ascending → every emitted pair already has a < b.
    val pairs = posting.select(explode(flatten(transform(col("ids"), (a, i) =>
      transform(
        slice(col("ids"), i + lit(2), greatest(size(col("ids")) - i - 1, lit(0))),
        b => struct(a.as("a"), b.as("b")))))).as("p"))
    val common = pairs.groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col("id").as("a"), col("n_sh").as("na")), "a")
      .join(sizes.select(col("id").as("b"), col("n_sh").as("nb")), "b")
  }

  /** Entity-resolution-style near-dup pairs: prefix BLOCKING + Levenshtein
    * VERIFY. Docs sharing their first `prefixLen` characters form a block;
    * within a block every (a < b) pair is verified with an edit-distance
    * threshold over the first `verifyLen` characters. The classic
    * blocking-then-verify shape for typo-level duplicates (OCR noise,
    * whitespace edits) that token-level minhash under-detects.
    *
    * Scale: one shuffle on the block key; blocks over `maxBlock` docs are
    * dropped wholesale (boilerplate prefixes — the hot-shingle cap rule:
    * deterministic, documented degradation, bounds pair work at
    * maxBlock²/2 per block). The verify uses Spark's THRESHOLDED
    * Levenshtein (returns -1 past the bound), which prunes the DP to the
    * |maxDist| diagonal band — O(maxDist·verifyLen) per pair, not
    * O(verifyLen²). */
  def editPairs(docs: DataFrame, idCol: String, textCol: String,
                prefixLen: Int = 20, maxBlock: Int = 64,
                verifyLen: Int = 120, maxDist: Int = 10): DataFrame = {
    val keyed = docs.select(col(idCol).as("id"),
      substring(col(textCol), 1, verifyLen).as("head"),
      substring(col(textCol), 1, prefixLen).as("block"))
    val blocks = keyed.groupBy(col("block"))
      .agg(sort_array(collect_list(struct(col("id"), col("head")))).as("members"))
      .where(size(col("members")).between(2, maxBlock))
    // members sorted by (id, head) → emitted pairs already have a < b.
    val pairs = blocks.select(explode(flatten(transform(col("members"), (m, i) =>
      transform(
        slice(col("members"), i + lit(2),
          greatest(size(col("members")) - i - 1, lit(0))),
        n => struct(m.getField("id").as("a"), n.getField("id").as("b"),
          levenshtein(m.getField("head"), n.getField("head"), maxDist)
            .as("dist")))))).as("p"))
    pairs.select(col("p.a").as("a"), col("p.b").as("b"), col("p.dist").as("dist"))
      .where(col("dist") >= 0)
  }
}
