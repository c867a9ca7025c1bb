package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding vocabulary training (Sennrich et al.
  * 2016 — the subword tokenizer family behind GPT-2/LLaMA vocabularies),
  * expressed Spark-first.
  *
  * The standard scale trick is built in: training runs over the WORD
  * FREQUENCY TABLE, not the raw corpus — the corpus collapses to
  * (word, count) in one hash-aggregate, and every merge round then
  * touches vocabulary-sized data (≪ corpus-sized; at 100 TB the word
  * table is a few hundred MB). Each round is:
  *
  *  1. pair counting — one map-side explode of adjacent token pairs
  *     weighted by word count + one hash-agg (map-side combined);
  *  2. argmax — count desc, then (left, right) lexicographic, a
  *     deterministic tie-break both engines reproduce;
  *  3. merge application — a row-local regexp replace over the wrapped
  *     token string, leftmost non-overlapping (greedy), zero shuffle.
  *
  * Token sequences travel as `|tok1||tok2||…|` wrapped strings: tokens
  * are `[a-z0-9]+` so `|` is a safe delimiter, and applying a merge is
  * literally `replace(s, "|l||r|", "|lr|")` — string replace IS
  * greedy leftmost non-overlapping pair merging, which is why a plain
  * SQL oracle can replay training round for round.
  *
  * The learned artifact (K merge rules) is collected to the driver —
  * bounded by the round count, it IS the model, exactly like the
  * k-means centers in [[Similarity]]; the corpus itself never leaves
  * executors. The word table is localCheckpointed once so rounds
  * re-scan a vocabulary-sized cache, not the corpus.
  */
object Bpe {

  /** `word` → `|c1||c2||…|` per-character wrapped token string. */
  def wrap(word: Column): Column = regexp_replace(word, "(.)", "|$1|")

  /** Adjacent-pair counts of the current token strings, weighted by
    * word count: (lft, rgt, cnt). */
  def pairCounts(cur: DataFrame): DataFrame = {
    val toks = cur.select(col("cnt"),
      split(expr("substring(s, 2, length(s)-2)"), "\\|\\|").as("t"))
    toks.select(col("cnt"), explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => struct(a.as("lft"), b.as("rgt")))).as("p"))
      .groupBy(col("p.lft").as("lft"), col("p.rgt").as("rgt"))
      .agg(sum("cnt").as("cnt"))
  }

  /** Train `rounds` merge rules over the space-separated words of
    * `textCol`. Returns the merge table: (step, lft, rgt, cnt). */
  def train(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var cur = docs.select(explode(split(col(textCol), " ")).as("word"))
      .where(col("word").rlike("^[a-z0-9]+$"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(wrap(col("word")).as("s"), col("cnt"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val best = pairCounts(cur)
        .orderBy(desc("cnt"), asc("lft"), asc("rgt")).limit(1).collect()
      if (best.nonEmpty) {
        val (l, g, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((r, l, g, c))
        cur = cur.withColumn("s", regexp_replace(col("s"),
            lit(java.util.regex.Pattern.quote(s"|$l||$g|")), lit(s"|$l$g|")))
          .localCheckpoint() // flat lineage: each round re-reads a cache
      }
    }
    merges.result().toDF("step", "lft", "rgt", "cnt")
  }

  /** Inference half: apply an ordered merge-rule list to a corpus and
    * return per-document BPE token counts — the sequence-length /
    * token-budget signal every packing and sharding stage consumes.
    * The rules are plan literals (the model is rounds-sized), each
    * application is the same row-local greedy replace as training, and
    * the whole encode is one zero-shuffle scan projection followed by
    * the per-doc sum. Out-of-vocabulary words (non `[a-z0-9]+`) count
    * one token each, the single-byte-fallback convention. */
  /** Per-word subword-token count under `rules` — the greedy leftmost
    * merge application on the wrapped string, then a split on the
    * between-token "||" (the wrapped |t1||t2||…| splits into exactly
    * one piece per token). OOV (non-alnum) words count 1. */
  private def tokCountUnderRules(word: Column,
                                 rules: Seq[(String, String)]): Column = {
    val merged = rules.foldLeft(wrap(word)) { case (s, (l, g)) =>
      regexp_replace(s, lit(java.util.regex.Pattern.quote(s"|$l||$g|")),
        lit(s"|$l$g|"))
    }
    when(word.rlike("^[a-z0-9]+$"), size(split(merged, "\\|\\|")))
      .otherwise(lit(1))
  }

  def encodeTokenCounts(docs: DataFrame, idCol: String, textCol: String,
                        rules: Seq[(String, String)]): DataFrame =
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .where(length(col("word")) > 0)
      .select(col(idCol), tokCountUnderRules(col("word"), rules).as("n_tok"))
      .groupBy(col(idCol)).agg(sum("n_tok").as("bpe_tokens"))

  /** Tokenizer FERTILITY per source: subword tokens emitted per
    * whitespace word — the tokenizer-fit diagnostic next to
    * [[graft.queries]] `vocab_oov` (a fertility outlier means the
    * vocabulary was trained on a different distribution than that
    * source, and its docs will cost proportionally more sequence
    * length). One corpus scan, zero joins: the per-word token count is
    * a row-local projection and the per-source ratio is one hash-agg —
    * no per-doc intermediate table, because fertility only needs
    * source-level sums. */
  def fertilityBySource(docs: DataFrame, srcCol: String, textCol: String,
                        rules: Seq[(String, String)]): DataFrame =
    docs.select(col(srcCol).as("source"),
        explode(split(col(textCol), " ")).as("word"))
      .where(length(col("word")) > 0)
      .select(col("source"),
        tokCountUnderRules(col("word"), rules).cast("long").as("n_tok"))
      .groupBy(col("source"))
      .agg(sum("n_tok").as("bpe_tokens"), count(lit(1)).as("n_words"))
      .select(col("source"), col("bpe_tokens"), col("n_words"),
        TimeSeries.portableRound6(col("bpe_tokens").cast("double") /
          col("n_words").cast("double")).as("fertility"))
}
