package graft

/** Laws for text_entropy: a strict alternation has one bit of unigram
  * entropy and ZERO conditional bits (next char fully determined);
  * uniform random chars keep h_cond near h_char. */
class TextEntropySpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(dir: String, docs: Seq[(String, String)]): Unit =
    docs.zipWithIndex.map { case ((src, text), i) =>
      (i.toLong, text, "en", src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

  test("alternation: 1 bit unigram, ~0 conditional; noise: h_cond ~ h_char") {
    var state = 112233L
    def lcg(): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      math.abs((state >>> 33).toInt % 16)
    }
    val dir = java.nio.file.Files.createTempDirectory("tent").toString
    try {
      writeDocs(dir, Seq(
        "alt" -> ("ab" * 500),
        "rng" -> (0 until 1000).map(_ => ('a' + lcg()).toChar).mkString))
      val rows = SparkEntry.queries("text_entropy")(spark, dir)
        .collect().map(r => r.getAs[String]("source") ->
          ((r.getAs[Double]("h_char"), r.getAs[Double]("h_cond")))).toMap
      val (altU, altC) = rows("alt")
      assert(altU === 1.0, s"alternation unigram = $altU")
      // bigram dist over 999 grams: 'ab' x500, 'ba' x499 -> ~1 bit, so
      // conditional ~= 0 (tiny edge effect from the odd gram count)
      assert(math.abs(altC) < 0.01, s"alternation conditional = $altC")
      val (rngU, rngC) = rows("rng")
      assert(rngU > 3.9, s"16-char noise unigram = $rngU")
      assert(rngC > 0.8 * rngU, s"noise conditional = $rngC vs $rngU")
    } finally rmdirAll(new java.io.File(dir))
  }
}
