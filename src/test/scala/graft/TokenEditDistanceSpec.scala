package graft

import org.apache.spark.sql.functions._
import graft.functions.{LcsLength, TokenEditDistance}

/** Laws for the native token-Levenshtein kernel (the WER hot loop):
  * differential against a reference DP, classic known answers, the
  * metric identities that tie it to LCS, and the SQL registration. */
class TokenEditDistanceSpec extends SparkSpec {
  import spark.implicits._

  private def refEdit(a: Seq[String], b: Seq[String]): Int = {
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 0 to a.length) dp(i)(0) = i
    for (j <- 0 to b.length) dp(0)(j) = j
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1),
        math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1))
    dp(a.length)(b.length)
  }

  private def run(pairs: Seq[(Seq[String], Seq[String])]): Seq[Long] =
    pairs.toDF("a", "b")
      .select(TokenEditDistance(col("a"), col("b")).as("d"))
      .as[Long].collect().toSeq

  test("known answers: substitution costs ONE unit (the char-level trap)") {
    val cases = Seq(
      (Seq("a", "b", "c", "d"), Seq("a", "b", "c", "d")),       // 0
      (Seq("the", "cat", "sat"), Seq("the", "dog", "sat")),     // 1 sub
      (Seq("a", "b", "c"), Seq("x", "y", "z")),                 // 3 subs
      (Seq("a", "b", "c"), Seq("a", "c")),                      // 1 del
      (Seq("a", "c"), Seq("a", "b", "c")),                      // 1 ins
      // "kitten"->"sitting" at token granularity
      (Seq("k", "i", "t", "t", "e", "n"),
        Seq("s", "i", "t", "t", "i", "n", "g")))                // 3
    assert(run(cases) === Seq(0L, 1L, 3L, 1L, 1L, 3L))
  }

  test("differential vs the reference DP on generated token arrays") {
    def gen(seed: Int, len: Int): Seq[String] =
      (0 until len).map(i => s"t${(seed * 31 + i * 17 + i * i * seed) % 7}")
    val cases = for (s1 <- 1 to 6; s2 <- 1 to 6)
      yield (gen(s1, 5 + s1 * 7 % 40), gen(s2 * 13, 3 + s2 * 11 % 50))
    assert(run(cases) === cases.map { case (a, b) => refEdit(a, b).toLong })
  }

  test("edge shapes and metric laws") {
    // empty side -> other side's length; symmetry; triangle bounds
    val cases = Seq(
      (Seq.empty[String], Seq("a", "b", "c")),
      (Seq("a", "b"), Seq.empty[String]),
      (Seq.empty[String], Seq.empty[String]),
      (Seq("a"), Seq("a")))
    assert(run(cases) === Seq(3L, 2L, 0L, 0L))
    def gen(seed: Int, len: Int): Seq[String] =
      (0 until len).map(i => s"t${(seed * 7 + i * 13) % 5}")
    val pairs = for (s <- 1 to 8) yield (gen(s, 4 + s * 3), gen(s + 3, 2 + s * 5))
    val fwd = run(pairs)
    val bwd = run(pairs.map(_.swap))
    assert(fwd === bwd, "edit distance must be symmetric")
    // |la - lb| <= d <= max(la, lb)
    pairs.zip(fwd).foreach { case ((a, b), d) =>
      assert(d >= math.abs(a.length - b.length) && d <= math.max(a.length, b.length))
    }
  }

  test("LCS bound: edit <= la + lb - 2*lcs (equality iff no substitutions pay off)") {
    // Levenshtein with substitutions never exceeds the indel-only
    // distance the LCS induces; planted substitution-heavy pairs go
    // strictly under it.
    def gen(seed: Int, len: Int): Seq[String] =
      (0 until len).map(i => s"t${(seed * 11 + i * 19 + i * i) % 6}")
    val pairs = for (s <- 1 to 10) yield (gen(s, 6 + s * 5 % 30), gen(s * 17, 4 + s * 7 % 35))
    val ed = run(pairs)
    val lc = pairs.toDF("a", "b")
      .select(LcsLength(col("a"), col("b")).as("l")).as[Long].collect().toSeq
    pairs.indices.foreach { i =>
      val (a, b) = pairs(i)
      assert(ed(i) <= a.length + b.length - 2 * lc(i),
        s"pair $i: edit ${ed(i)} vs indel bound ${a.length + b.length - 2 * lc(i)}")
    }
    // pure substitution: indel bound is 2n, edit is n
    val subs = Seq((Seq("a", "b", "c", "d"), Seq("w", "x", "y", "z")))
    assert(run(subs).head === 4L)
  }

  test("registered as the token_edit_distance SQL function") {
    val (id, info, builder) = GraftExtensions.tokenEditDistance
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    val r = spark.sql(
      "SELECT token_edit_distance(array('a','x','b'), array('a','b')) AS d")
      .as[Long].collect().head
    assert(r === 1L)
  }
}
