package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** The spec-only differential pack for exhaustive REFERENCE twins that
  * were evicted from the registered query set (r10 verdict #2): a
  * reference whose cost is corpus-pair-proportional has no production
  * role, so it is not benched and not oracled — but it still certifies
  * the production shape's output here, on every test run.
  *
  * - `Dedup.ngramJaccardPairs` (exhaustive, formerly "dedup_jaccard",
  *   measured near-LINEAR in pair volume at 125×) certifies
  *   `Dedup.lshVerifiedPairs` ("dedup_lsh_verified", the registered
  *   two-stage production pipeline).
  * - `Similarity.semDedup` (uncapped, formerly "emb_semdedup_ref",
  *   218–498× at 25×) certifies `semDedupCapped` in
  *   SemDedupCappedSpec (cap-inert equality + planted-dup laws).
  */
class ReferenceTwinSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"${sf()}/documents.parquet")

  private def pairSet(df: org.apache.spark.sql.DataFrame)
      : Map[(Long, Long), Double] =
    df.select(col("a"), col("b"), col("jaccard")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("LSH-verified pairs are SOUND vs the exhaustive reference and recall its pair set") {
    val exh = pairSet(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5))
    val lsh = pairSet(Dedup.lshVerifiedPairs(docs, "doc_id", "text", 0.5))
    assert(exh.nonEmpty, "corpus must plant near-dup pairs")

    // soundness: every pair the production pipeline emits is a true
    // >=0.5 pair under the exhaustive reference, with the same score
    // (both score distinct 3-shingle sets; the exhaustive hot-shingle
    // cap does not bind on this corpus, which the subset check proves)
    lsh.foreach { case (pair, j) =>
      assert(exh.contains(pair), s"false positive $pair")
      assert(math.abs(exh(pair) - j) < 1e-12, s"score drift at $pair")
    }

    // recall: banding (12 perms, 3 rows/band) is probabilistic, but the
    // corpus and seeds are pinned, so recall is deterministic — planted
    // near-dups collide in at least one band. A banding refactor that
    // silently guts recall fails here.
    val recall = lsh.keySet.intersect(exh.keySet).size.toDouble / exh.size
    assert(recall >= 0.8, f"recall $recall%.3f < 0.8 (lsh ${lsh.size}, exhaustive ${exh.size})")
  }

  test("planted corpus: production pipeline finds every planted pair the reference finds") {
    import spark.implicits._
    // 20 identical pairs (jaccard 1.0) + 20 unrelated docs: recall on
    // exact copies must be 1.0 — identical docs share every signature
    val planted = ((0L until 20L).flatMap { g =>
      val t = s"alpha$g beta$g gamma$g delta$g epsilon$g zeta$g eta$g theta$g"
      Seq((g, t), (g + 1000L, t))
    } ++ (0L until 20L).map(i =>
      (5000L + i, s"solo$i unique$i text$i here$i only$i once$i ever$i"))
    ).toDF("doc_id", "text")
    val exh = pairSet(Dedup.ngramJaccardPairs(planted, "doc_id", "text", 0.5))
    val lsh = pairSet(Dedup.lshVerifiedPairs(planted, "doc_id", "text", 0.5))
    assert(exh.keySet === (0L until 20L).map(g => (g, g + 1000L)).toSet)
    assert(lsh === exh)
  }
}
