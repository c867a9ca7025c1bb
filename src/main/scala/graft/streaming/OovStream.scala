package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed out-of-vocabulary drift monitor — the ingest-time twin of
  * the batch `vocab_oov` audit: arriving documents tokenize row-locally,
  * each token probes a FROZEN vocabulary (the deployment artifact a
  * tokenizer shipped with), and every closing event-time window emits
  * its exact token/OOV counts plus the OOV fraction. A rising curve is
  * the first smell of a source drifting away from the tokenizer's
  * training distribution (new language, new domain, encoding junk) —
  * caught while the batch is still landing, not at the next corpus
  * audit.
  *
  * Fully declarative: explode to tokens, one stream-static broadcast
  * left join against the frozen vocab (the vocab is the SMALL side by
  * construction; the token stream never shuffles for it), one windowed
  * aggregation. State per window is three longs.
  *
  * Stream ≡ batch: a closed window's row equals `vocab_oov`'s
  * arithmetic over that window's docs against the same frozen vocab —
  * exact integer counts, one rounded division (OovStreamSpec). */
object OovStream {

  def windowed(stream: DataFrame, vocab: DataFrame, textCol: String,
               tsCol: String, windowDur: String = "1 hour",
               delay: String = "10 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, delay)
      .select(col(tsCol), explode(split(col(textCol), " ")).as("word"))
      .join(broadcast(vocab.select(col("word"), lit(1L).as("__inv"))),
        Seq("word"), "left")
      .groupBy(window(col(tsCol), windowDur))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__inv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("window.start").as("window_start"),
        col("n_tokens"), col("n_oov"),
        (round(col("n_oov").cast("double") / col("n_tokens").cast("double")
          * 1000000) / 1000000).as("oov_frac"))
}
