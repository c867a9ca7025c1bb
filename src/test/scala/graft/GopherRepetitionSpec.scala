package graft

import org.apache.spark.sql.functions._

import graft.functions.GopherRepetition

/** Edge laws for the native Gopher repetition kernel (the bulk
  * differential check vs DuckDB is the text_gopher oracle hash). */
class GopherRepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def run(texts: Seq[String]): Seq[(Double, Double, Double)] = {
    val g = GopherRepetition(col("t"), 5)
    texts.toDF("t").select(g.as("g"))
      .select(col("g.top2"), col("g.top3"), col("g.dup"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
      .toSeq
  }

  test("degenerate shapes: empty, single token, sub-gram docs") {
    val out = run(Seq("", "one", "a b", "a b c d"))
    // "" splits to [""] → no bigrams → all zero
    assert(out(0) === ((0.0, 0.0, 0.0)))
    assert(out(1) === ((0.0, 0.0, 0.0)))
    // "a b": one bigram → top2 = 1/1; no trigram; no 5-gram
    assert(out(2) === ((1.0, 0.0, 0.0)))
    // 4 tokens: 3 bigrams all distinct → 1/3; 2 distinct trigrams → 1/2
    assert(out(3) === ((1.0 / 3, 0.5, 0.0)))
  }

  test("repeated 5-grams cover overlapping positions once") {
    // "x x x x x x" (6 tokens): both 5-grams equal → duplicated; their
    // union covers all 6 positions → dup = 1.0; top2 = 5/5 = 1.0
    val Seq((t2, t3, d)) = run(Seq("x x x x x x"))
    assert(t2 === 1.0 && t3 === 1.0 && d === 1.0)
    // a repeated 5-gram far apart: positions [0,5) and [7,12) of 12
    // tokens → 10/12 covered
    val text = "p q r s t z w p q r s t"
    val Seq((_, _, d2)) = run(Seq(text))
    assert(math.abs(d2 - 10.0 / 12) < 1e-12)
  }

  test("most-frequent-gram fraction counts the plurality gram") {
    // bigrams of "a b a b a b": [a b, b a, a b, b a, a b] → top run 3/5
    val Seq((t2, _, _)) = run(Seq("a b a b a b"))
    assert(math.abs(t2 - 3.0 / 5) < 1e-12)
  }
}
