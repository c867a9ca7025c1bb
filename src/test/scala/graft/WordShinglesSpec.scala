package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Tables}

/** WordShingles must be bit-identical to the composable form it
  * replaced — transform(sequence, i => concat_ws(" ", slice(split(text,
  * " "), i+1, w))) — including the split(" ", -1) empty-token edge
  * cases (doubled/leading/trailing spaces) and the empty-array-on-null
  * contract, because every minhash/simhash/span/contamination oracle
  * hashes these exact strings. */
class WordShinglesSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-native formulation, verbatim. */
  private def composable(textCol: org.apache.spark.sql.Column, w: Int) = {
    val toks = split(textCol, " ")
    val idxs = when(size(toks) >= w, sequence(lit(0), size(toks) - w))
      .otherwise(array().cast("array<int>"))
    transform(idxs, i => concat_ws(" ", slice(toks, i + 1, lit(w))))
  }

  private val edges = Seq(
    "a b c d e", "a", "", " ", "  ", "a ", " a", "a  b", "a b ", " a b",
    "one two three four", "x y", "tab\tnot a split", "a b c")

  test("edge cases match the composable form for w in 1..4") {
    for (w <- 1 to 4) {
      val df = edges.toDF("text")
      val got = df.select(Dedup.shingleArray(col("text"), w).as("s"))
        .collect().map(_.getSeq[String](0).toList).toList
      val ref = df.select(composable(col("text"), w).as("s"))
        .collect().map(_.getSeq[String](0).toList).toList
      assert(got == ref, s"w=$w")
    }
  }

  test("null text gives an empty array (the coalesce contract)") {
    val df = Seq[Option[String]](None, Some("a b c")).toDF("text")
    val got = df.select(Dedup.shingleArray(col("text"), 3).as("s"))
      .collect().map(r => r.getSeq[String](0).toList).toList
    assert(got == List(Nil, List("a b c")))
  }

  test("real corpus: identical shingles and identical hash sets") {
    val docs = Tables.documents(spark, sf()).limit(200)
    val both = docs.select(
      Dedup.shingleArray(col("text"), 3).as("a"),
      composable(col("text"), 3).as("b"))
    assert(both.where(not(col("a") === col("b"))).count() === 0)
    // and the downstream hash-set projection (what the dedup family
    // actually consumes) agrees too
    def hs(c: org.apache.spark.sql.Column) =
      sort_array(array_distinct(transform(c, x => xxhash64(x))))
    val hsets = docs.select(
      hs(Dedup.shingleArray(col("text"), 3)).as("a"),
      hs(composable(col("text"), 3)).as("b"))
    assert(hsets.where(not(col("a") === col("b"))).count() === 0)
  }
}
