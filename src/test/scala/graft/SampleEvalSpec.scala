package graft

import org.apache.spark.sql.functions._
import graft.ops.{CorpusOps, TextAnalysis}

class SampleEvalSpec extends SparkSpec {
  import spark.implicits._

  /** JVM replica of the engine's md5 unit hash (CorpusOps.unitHash). */
  private def unitHash(id: Long): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
  }

  test("weighted sample matches the sequential A-ES reference and ignores layout") {
    val rows = (1L to 200L).map(i => (i, (i % 7 + 1) * 10L))
    val df = rows.toDF("doc_id", "w")
    val got = CorpusOps.sampleWeighted(df, "doc_id", "w", k = 20)
      .select("doc_id").as[Long].collect().toSet
    // reference: same key formula, same portable rounding, top-20
    val ref = rows.map { case (id, w) =>
      val raw = math.log(unitHash(id)) / w.toDouble
      val key = java.math.BigDecimal.valueOf(raw * 1000000)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue() / 1000000
      (id, key)
    }.sortBy { case (id, key) => (-key, id) }.take(20).map(_._1).toSet
    assert(got == ref)
    // layout independence: a different partitioning samples identically
    val got7 = CorpusOps.sampleWeighted(df.repartition(7), "doc_id", "w", k = 20)
      .select("doc_id").as[Long].collect().toSet
    assert(got7 == got)
    // weight monotonicity in expectation is the algorithm's contract;
    // degenerate weights are the testable edge: w <= 0 never samples
    val withBad = df.union(Seq((999L, 0L), (998L, -5L)).toDF("doc_id", "w"))
    val gotBad = CorpusOps.sampleWeighted(withBad, "doc_id", "w", k = 20)
      .select("doc_id").as[Long].collect().toSet
    assert(!gotBad.contains(999L) && !gotBad.contains(998L))
  }

  test("PR curve confusion counts equal a driver-side replay of the scores") {
    val docs = Tables()
    val scored = TextAnalysis.classifierScore(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"), (col("lang") === "en").as("pos")), "doc_id")
      .select("score", "pos").as[(Double, Boolean)].collect()
    val ths = Seq(0.5, 0.54)
    val got = TextAnalysis.prCurve(docs, "doc_id", "text",
        col("lang") === "en", ths)
      .orderBy("threshold")
      .select("threshold", "tp", "fp", "fn", "tn")
      .as[(Double, Long, Long, Long, Long)].collect().toSeq
    val exp = ths.map { t =>
      val tp = scored.count { case (s, p) => s >= t && p }.toLong
      val fp = scored.count { case (s, p) => s >= t && !p }.toLong
      val fn = scored.count { case (s, p) => s < t && p }.toLong
      val tn = scored.count { case (s, p) => s < t && !p }.toLong
      (t, tp, fp, fn, tn)
    }
    assert(got == exp)
    // sanity: counts always partition the corpus
    val n = docs.count()
    got.foreach { case (_, tp, fp, fn, tn) => assert(tp + fp + fn + tn == n) }
  }

  test("AUC equals the driver-side midrank replay and the known identities") {
    val docs = Tables()
    val scored = TextAnalysis.classifierScore(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"), (col("lang") === "en").as("pos")), "doc_id")
      .select("score", "pos").as[(Double, Boolean)].collect()
    val (p, n) = (scored.count(_._2).toLong, scored.count(!_._2).toLong)
    // midrank AUC reference: rank all scores asc with average ranks
    val sorted = scored.sortBy(_._1)
    val ranks = scala.collection.mutable.Map[Double, Double]()
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j)._1 == sorted(i)._1) j += 1
      ranks(sorted(i)._1) = (i + 1 + j) / 2.0 // avg of ranks i+1..j
      i = j
    }
    val rPos = sorted.filter(_._2).map(t => ranks(t._1)).sum
    val expected = (rPos - p * (p + 1) / 2.0) / (p * n)
    val got = TextAnalysis.aucScore(docs, "doc_id", "text", col("lang") === "en")
      .select("p", "n", "auc").as[(Long, Long, Double)].head()
    assert(got._1 == p && got._2 == n)
    assert(math.abs(got._3 - expected) < 1e-6, s"got ${got._3} vs $expected")
    // complement identity: flipping the label gives 1 - AUC
    val flipped = TextAnalysis.aucScore(docs, "doc_id", "text",
      col("lang") =!= "en").select("auc").as[Double].head()
    assert(math.abs(got._3 + flipped - 1.0) < 2e-6)
  }

  private def Tables() = graft.ops.Tables.documents(spark, sf())
}
