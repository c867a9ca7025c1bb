package graft

import org.apache.spark.sql.functions._

/** BPE trainer: the classic Sennrich worked example (hand-computed
  * merges, including both argmax tie-break directions) and the greedy
  * non-overlapping merge application on repeated-character runs. */
class BpeSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Bpe

  test("classic corpus learns (e,s), (es,t), (l,o) with exact counts") {
    // low:5 lower:2 newest:6 widest:3 — the worked example from
    // Sennrich et al. 2016 §3.2.
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq(text).toDF("text")
    val merges = Bpe.train(docs, "text", rounds = 3)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // round 1: es and st both 9, lexicographic tie-break picks es;
    // round 2: est closes at 9; round 3: lo vs ow tie at 7 picks lo.
    assert(merges.toSeq == Seq((1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L)))
  }

  test("pair counting overlaps, merge application is greedy non-overlapping") {
    val docs = Seq("aaaa aaaa").toDF("text")
    val merges = Bpe.train(docs, "text", rounds = 3)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // [a,a,a,a] counts 3 overlapping (a,a) pairs ×2 words = 6, but the
    // merge applies greedily → [aa,aa], so round 2 sees exactly one
    // (aa,aa) pair per word; round 3 has no pairs left and emits nothing.
    assert(merges.toSeq == Seq((1, "a", "a", 6L), (2, "aa", "aa", 2L)))
  }

  test("encodeTokenCounts applies rules in order; OOV words count 1") {
    val rules = Seq(("e", "s"), ("es", "t"), ("l", "o"))
    val docs = Seq(
      (1L, "newest low"),   // n,e,w,est = 4; lo,w = 2
      (2L, "lower x-y"),    // lo,w,e,r = 4; OOV = 1
      (3L, "a")             // single char = 1
    ).toDF("doc_id", "text")
    val out = Bpe.encodeTokenCounts(docs, "doc_id", "text", rules)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 6L, 2L -> 5L, 3L -> 1L))
  }

  test("non-alphanumeric words are excluded from the vocabulary") {
    val docs = Seq("ab ab a|b x-y !!").toDF("text")
    val merges = Bpe.train(docs, "text", rounds = 1).collect()
    assert(merges.map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq ==
      Seq(("a", "b", 2L)))
  }

  test("fertilityBySource: tokens-per-word ratio, OOV counts 1") {
    val rules = Seq(("e", "s"), ("es", "t"))
    val docs = Seq(
      // srcA: "newest" → n,e,w,est = 4 toks; "best" → b,est = 2 → 6/2 = 3.0
      ("srcA", "newest best"),
      // srcB: two OOV words (count 1 each) + "es" → 1 tok → 3/3 = 1.0
      ("srcB", "x-y !! es")
    ).toDF("source", "text")
    val out = Bpe.fertilityBySource(docs, "source", "text", rules)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("srcA") === ((6L, 2L, 3.0)))
    assert(out("srcB") === ((3L, 3L, 1.0)))
  }
}
