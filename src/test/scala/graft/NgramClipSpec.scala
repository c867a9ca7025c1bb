package graft

import org.apache.spark.sql.functions._

import graft.functions.{CharBigramClip, NgramClip}

/** Law checks for the two native clip kernels against brute-force
  * multiset references — random token arrays / strings with heavy
  * duplication, plus the degenerate shapes (empty, shorter-than-n,
  * supplementary-plane code points). */
class NgramClipSpec extends SparkSpec {
  import spark.implicits._

  private def refClip[T](a: Seq[T], b: Seq[T]): Long = {
    val cb = b.groupBy(identity).view.mapValues(_.size).toMap
    a.groupBy(identity).map { case (g, occ) =>
      math.min(occ.size, cb.getOrElse(g, 0)).toLong }.sum
  }

  private def refNgrams(toks: Seq[String], n: Int): Seq[Seq[String]] =
    if (toks.size < n) Nil else toks.sliding(n).toSeq

  test("NgramClip matches the brute-force multiset clip (n = 1, 2, 3)") {
    val rnd = new scala.util.Random(13)
    val vocab = Vector("a", "b", "cc", "dd", "e", "", "longtoken")
    val cases = (1 to 40).map { _ =>
      (Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))),
        Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))))
    } :+ ((Seq.empty[String], Seq("a", "b"))) :+ ((Seq("a"), Seq("a")))
    val df = cases.toDF("ct", "rt").select(
      col("ct"), col("rt"),
      NgramClip(col("ct"), col("rt"), 1).as("c1"),
      NgramClip(col("ct"), col("rt"), 2).as("c2"),
      NgramClip(col("ct"), col("rt"), 3).as("c3"))
    df.collect().foreach { r =>
      val (a, b) = (r.getSeq[String](0), r.getSeq[String](1))
      assert(r.getLong(2) === refClip(a, b), s"n=1 $a / $b")
      assert(r.getLong(3) === refClip(refNgrams(a, 2), refNgrams(b, 2)), s"n=2 $a / $b")
      assert(r.getLong(4) === refClip(refNgrams(a, 3), refNgrams(b, 3)), s"n=3 $a / $b")
    }
  }

  test("CharBigramClip matches brute force, including non-BMP code points") {
    def refBigrams(s: String): Seq[String] = {
      val cps = s.codePoints().toArray.toSeq
      if (cps.size < 2) Nil
      else cps.sliding(2).map(p => new String(p.toArray, 0, 2)).toSeq
    }
    val cases = Seq(
      ("banana", "ananas"), ("", "ab"), ("x", "x"), ("aaaa", "aa"),
      ("héllo wörld", "wörld héllo"),
      ("a😀b😀", "😀b😀a"),
      ("ababab", "bababa"))
    val df = cases.toDF("c", "r")
      .select(col("c"), col("r"), CharBigramClip(col("c"), col("r")).as("clip"))
    df.collect().foreach { row =>
      val (c, r) = (row.getString(0), row.getString(1))
      assert(row.getLong(2) === refClip(refBigrams(c), refBigrams(r)),
        s"'$c' / '$r'")
    }
  }

  test("the row-local overlap equals the shuffled kernel on real pairs") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("text").as("cand"),
        lead(col("text"), 1).over(
          org.apache.spark.sql.expressions.Window.orderBy("doc_id"))
          .as("rtext"))
      .where(col("rtext").isNotNull)
      .limit(60)
    val cols = Seq("doc_id", "c1", "r1", "c2", "r2", "clip1", "clip2")
    val local = graft.ops.TextAnalysis
      .pairNgramOverlapLocal(docs, "doc_id", "cand", "rtext")
      .select(cols.map(col): _*).collect().map(_.toSeq).toSet
    val shuffled = graft.ops.TextAnalysis
      .pairNgramOverlap(docs, "doc_id", "cand", "rtext")
      .select(cols.map(col): _*).collect().map(_.toSeq).toSet
    assert(local === shuffled)
    assert(local.nonEmpty)
  }
}
