package graft

import org.apache.spark.sql.functions._
import graft.functions.LcsLength

/** Laws for the native LCS kernel (the ROUGE-L hot loop): differential
  * against a reference DP, classic known answers, edge shapes, and the
  * SQL registration. */
class LcsLengthSpec extends SparkSpec {
  import spark.implicits._

  private def refLcs(a: Seq[String], b: Seq[String]): Int = {
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) =
        if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
        else math.max(dp(i - 1)(j), dp(i)(j - 1))
    dp(a.length)(b.length)
  }

  private def run(pairs: Seq[(Seq[String], Seq[String])]): Seq[Long] =
    pairs.toDF("a", "b")
      .select(LcsLength(col("a"), col("b")).as("lcs"))
      .as[Long].collect().toSeq

  test("known answers and classic cases") {
    val cases = Seq(
      (Seq("a", "b", "c", "d"), Seq("a", "b", "c", "d")), // identical -> 4
      (Seq("a", "b", "c"), Seq("x", "y", "z")),           // disjoint -> 0
      (Seq("a", "x", "b", "y", "c"), Seq("a", "b", "c")), // gapped -> 3
      (Seq("a", "b", "a", "b"), Seq("b", "a", "b", "a")), // -> 3
      (Seq("the", "cat", "sat"), Seq("the", "dog", "sat", "cat")))
    assert(run(cases) === cases.map { case (a, b) => refLcs(a, b).toLong })
  }

  test("differential vs the reference DP on generated token arrays") {
    // deterministic pseudo-random corpus over a small alphabet (dense
    // match structure, the hard regime for an off-by-one)
    def gen(seed: Int, len: Int): Seq[String] =
      (0 until len).map(i => s"t${(seed * 31 + i * 17 + i * i * seed) % 7}")
    val cases = for (s1 <- 1 to 6; s2 <- 1 to 6)
      yield (gen(s1, 5 + s1 * 7 % 40), gen(s2 * 13, 3 + s2 * 11 % 50))
    assert(run(cases) === cases.map { case (a, b) => refLcs(a, b).toLong })
  }

  test("edge shapes: empty arrays, single tokens, order sensitivity") {
    val cases = Seq(
      (Seq.empty[String], Seq("a", "b")),
      (Seq("a"), Seq.empty[String]),
      (Seq("a"), Seq("a")),
      // reversal: bag identical, order destroyed -> LCS 1 (any single)
      (Seq("a", "b", "c", "d"), Seq("d", "c", "b", "a")))
    assert(run(cases) === Seq(0L, 0L, 1L, 1L))
  }

  test("registered as the lcs_length SQL function") {
    val (id, info, builder) = GraftExtensions.lcsLength
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    val r = spark.sql(
      "SELECT lcs_length(array('a','x','b'), array('a','b','y')) AS l")
      .as[Long].collect().head
    assert(r === 2L)
  }
}
