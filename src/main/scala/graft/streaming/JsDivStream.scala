package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming vocabulary-drift monitor — the ingest-time companion of the
  * batch `text_js_divergence` query: each closing window's unigram
  * distribution (per source) is scored against a FROZEN reference
  * distribution with Jensen–Shannon divergence, the bounded symmetric
  * [0, 1] drift number (PSI explodes on vanishing cells and KL is
  * asymmetric; JSD is the one you can alarm on with a fixed bar).
  *
  * Shape: the DriftStream pattern — arriving docs tokenize row-locally,
  * tokens map onto the reference's CLOSED domain (top-K reference words
  * + one OOV bucket, so per-window state is ≤ K+1 cells per source
  * however large the window), two chained stateful aggregations pack
  * (window, source) → cell map, and the JSD itself is one aggregate()
  * fold over the reference entries injected as a sorted literal array —
  * deterministic order, no collected list, no partition-frame window on
  * the stream.
  *
  * Exactness: [[jsdAgainst]] is the SAME Column expression a batch
  * replay evaluates over frozen rows (JsDivStreamSpec proves stream ≡
  * batch to the bit); terms handle the p=0 / q=0 arms exactly like the
  * batch query's cell terms. The reference should come from a settled
  * corpus snapshot (`referenceFrom`, driver-side, K+1 rows collected —
  * the CusumStream frozen-envelope convention). */
object JsDivStream {

  val OovBucket = "\u0000oov"

  /** Build the frozen reference: top-K corpus words by count (ties by
    * word) + the OOV bucket holding ALL remaining token mass. K bounds
    * both the literal expression and the per-window state. */
  def referenceFrom(docs: DataFrame, textCol: String, k: Int = 64): Seq[(String, Long)] = {
    val counts = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(k)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val topMass = counts.map(_._2).sum
    val total = docs
      .select(sum(size(filter(split(col(textCol), " "),
        w => length(w) > lit(0)))).cast("long"))
      .head().getLong(0)
    (counts.toSeq :+ (OovBucket -> (total - topMass))).sortBy(_._1)
  }

  /** JSD of a packed (word → count) map column vs the reference — the
    * shared kernel: one aggregate() fold over the sorted literal
    * reference entries. `cc` is the window's total token count. */
  def jsdAgainst(cur: Column, cc: Column,
                 reference: Seq[(String, Long)]): Column = {
    val refTotal = reference.map(_._2).sum.toDouble
    val entries = typedlit(reference.sortBy(_._1))
    val fold = aggregate(entries, lit(0.0), (acc, e) => {
      val w = e.getField("_1")
      val p = coalesce(element_at(cur, w), lit(0L)).cast("double") /
        cc.cast("double")
      val q = e.getField("_2").cast("double") / lit(refTotal)
      val both = p + q
      val term =
        when(p > 0 && q > 0,
          p * log2(lit(2.0) * p / both) + q * log2(lit(2.0) * q / both))
          .when(p > 0, p * log2(lit(2.0)))
          .when(q > 0, q * log2(lit(2.0)))
          .otherwise(lit(0.0))
      acc + term
    })
    fold / lit(2.0)
  }

  /** @param reference frozen (word, count) distribution from
    *                  [[referenceFrom]] — MUST include [[OovBucket]].
    * @return per closed (window, source): token count, OOV fraction,
    *         and the 6dp JSD vs the reference. */
  def windowedJsd(stream: DataFrame, tsCol: String, sourceCol: String,
                  textCol: String, reference: Seq[(String, Long)],
                  windowDur: String = "1 hour",
                  delay: String = "5 minutes"): DataFrame = {
    require(reference.exists(_._1 == OovBucket),
      "reference must carry the OOV bucket (referenceFrom adds it)")
    val refWords = typedlit(reference.map(_._1).filterNot(_ == OovBucket))
    val mapped = stream
      .withWatermark(tsCol, delay)
      .select(col(tsCol), col(sourceCol).as("source"),
        explode(split(col(textCol), " ")).as("w"))
      .where(length(col("w")) > 0)
      .select(col(tsCol), col("source"),
        when(array_contains(refWords, col("w")), col("w"))
          .otherwise(lit(OovBucket)).as("w"))
    val packed = mapped
      .groupBy(window(col(tsCol), windowDur).as("w"), col("source"),
        col("w").as("word"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("w"), col("source"))
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("word"), col("n"))))).as("cur"),
        sum(col("n")).as("cc"))
    packed.select(col("w.start").as("bucket"), col("source"),
      col("cc").as("n_tokens"),
      (round(coalesce(element_at(col("cur"), lit(OovBucket)), lit(0L))
        .cast("double") / col("cc").cast("double") * 1000000) / 1000000)
        .as("oov_frac"),
      (round(jsdAgainst(col("cur"), col("cc"), reference) * 1000000)
        / 1000000)
        .as("jsd"))
  }
}
