package graft

import graft.ops.Dedup

/** Containment vs Jaccard: subset duplication must clear the
  * containment threshold while staying invisible to symmetric
  * similarity — the asymmetric detector's whole reason to exist. */
class DedupContainSpec extends SparkSpec {
  import spark.implicits._

  test("a small doc quoted inside a big one: containment ~1, jaccard ~0") {
    val quote = (0 until 10).map(t => s"q$t").mkString(" ")
    val filler = (0 until 190).map(t => s"f$t").mkString(" ")
    val docs = Seq(
      (1L, quote),                    // the quoted article
      (2L, s"$filler $quote")         // the page wrapping it
    ).toDF("doc_id", "text")
    val contain = Dedup.containmentPairs(docs, "doc_id", "text", threshold = 0.8)
      .collect()
    assert(contain.length === 1)
    val r = contain(0)
    assert(r.getLong(0) === 1L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === 1.0)          // all of A's shingles are in B
    assert(r.getDouble(3) < 0.1)            // B barely overlaps A
    // symmetric similarity misses the same pair entirely
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.5)
    assert(jac.count() === 0L)
  }

  test("disjoint docs produce no containment pairs") {
    val docs = Seq(
      (1L, (0 until 20).map(t => s"a$t").mkString(" ")),
      (2L, (0 until 20).map(t => s"b$t").mkString(" "))
    ).toDF("doc_id", "text")
    assert(Dedup.containmentPairs(docs, "doc_id", "text", 0.1).count() === 0L)
  }

  test("hammingPairs is pigeonhole-exact: equals brute force on random hashes") {
    val rnd = new scala.util.Random(7)
    val hashes = (1L to 120L).map(i => (i, rnd.nextInt(1 << 16).toLong))
    val df = hashes.toDF("id", "h")
    val got = Dedup.hammingPairs(df, "id", "h",
        totalBits = 16, bands = 4, maxHamming = 3)
      .select("a", "b", "hamming").as[(Long, Long, Int)].collect().toSet
    val brute = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d)).toSet
    assert(got == brute, s"missing=${brute -- got} extra=${got -- brute}")
  }
}
