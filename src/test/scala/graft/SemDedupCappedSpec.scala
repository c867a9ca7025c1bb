package graft

import org.apache.spark.sql.functions._
import graft.ops.{Similarity, Tables}

/** The hot-cell cap's contract: inert when no cell exceeds maxCell
  * (bit-identical to the exact per-cell scan), total when cells split
  * (every vector still labeled exactly once), and the split arithmetic
  * integer-exact. The oracle gate hash-checks emb_semdedup_capped end to
  * end; this spec pins the degradation CONTRACT. */
class SemDedupCappedSpec extends SparkSpec {

  private val emb = Tables.embeddings(spark, sf("sf0.001"))

  test("cap above every cell size is inert: identical to exact semDedup") {
    val exact = Similarity.semDedup(emb, "vec_id", "embedding",
      threshold = 0.2, k = 8)
    val capped = Similarity.semDedupCapped(emb, "vec_id", "embedding",
      threshold = 0.2, k = 8, maxCell = 1000000, maxSubBits = 8)
    assert(capped.exceptAll(exact).count() === 0)
    assert(exact.exceptAll(capped).count() === 0)
  }

  test("aggressive cap: every vector labeled once; drops are a subset of exact drops") {
    val n = emb.count()
    val capped = Similarity.semDedupCapped(emb, "vec_id", "embedding",
      threshold = 0.2, k = 8, maxCell = 8, maxSubBits = 4)
    assert(capped.count() === n, "one verdict per vector, split or not")
    assert(capped.select("vec_id").distinct().count() === n)
    // splitting can only LOSE pairs (sub-buckets partition each cell), so
    // the capped drop set is contained in the exact one — semantics
    // degrade monotonically, never invent a duplicate.
    val exactDrops = Similarity.semDedup(emb, "vec_id", "embedding",
      threshold = 0.2, k = 8).where(!col("keep")).select("vec_id")
    val cappedDrops = capped.where(!col("keep")).select("vec_id")
    assert(cappedDrops.exceptAll(exactDrops).count() === 0)
  }
}
