package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.ops.Similarity

/** Native cosine expression: differential-tested against the
  * higher-order-function formulation (bit-identical index-ordered sums),
  * null semantics, and codegen participation. */
class CosineExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("native cosine is bit-identical to the HOF formulation (property)") {
    val vecGen = Gen.listOfN(20,
      Gen.listOfN(16, Gen.choose(-10.0, 10.0)).map(_.toArray))
    val prop = Prop.forAll(vecGen) { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val pairs = df.select(col("id").as("a"), col("v").as("va"))
        .crossJoin(df.select(col("id").as("b"), col("v").as("vb")))
        .where(col("a") < col("b"))
      val rows = pairs.select(
        Similarity.cosine(col("va"), col("vb")).as("native"),
        Similarity.cosineHof(col("va"), col("vb")).as("hof"))
        .as[(Double, Double)].collect()
      rows.forall { case (n, h) => n == h } // EXACT equality, not approx
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(r.passed, r.status.toString)
  }

  test("null input yields null; type mismatch is rejected at analysis") {
    val df = Seq(
      (Some(Array(1.0, 0.0)), Some(Array(1.0, 0.0))),
      (None, Some(Array(1.0, 0.0))))
      .toDF("a", "b")
    val out = df.select(Similarity.cosine(col("a"), col("b")).as("c"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq === Seq(Some(1.0), None))

    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(("x", "y")).toDF("a", "b")
        .select(Similarity.cosine(col("a"), col("b"))).collect()
    }
  }

  test("zero-norm vectors and null elements yield null, never NaN") {
    // NaN would sort ABOVE every real similarity and pass >= filters —
    // a zero vector must not take rank 1 in a top-k or leak through a
    // threshold. Interpreted + codegen paths both guarded.
    val df = Seq(
      (Array(0.0, 0.0, 0.0), Array(1.0, 2.0, 3.0)), // zero left norm
      (Array(1.0, 2.0, 3.0), Array(0.0, 0.0, 0.0)), // zero right norm
      (Array(1.0, 2.0, 3.0), Array(2.0, 4.0, 6.0))  // healthy
    ).toDF("a", "b")
    val out = df.select(Similarity.cosine(col("a"), col("b")).as("c"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out(0) === None && out(1) === None)
    assert(out(2).exists(v => math.abs(v - 1.0) < 1e-12))
    assert(!out.flatten.exists(_.isNaN))

    val withNullElem = Seq(
      (Array[java.lang.Double](1.0, null, 3.0), Array[java.lang.Double](1.0, 2.0, 3.0)))
      .toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c"))
    assert(withNullElem.collect().head.isNullAt(0))

    // and the HOF twin agrees on the degenerate cases (both null)
    val both = df.select(
      Similarity.cosine(col("a"), col("b")).as("n"),
      Similarity.cosineHof(col("a"), col("b")).as("h")).collect()
    assert(both.forall(r => r.isNullAt(0) == r.isNullAt(1)))
  }

  test("srpBucket rejects vectors whose length disagrees with dim") {
    val ok = Seq((1L, Array(1.0, 2.0, 3.0, 4.0))).toDF("id", "v")
      .select(Similarity.srpBucket(col("v"), nBits = 4, dim = 4).as("b"))
    assert(ok.collect().head.getLong(0) >= 0L)
    val bad = Seq((1L, Array(1.0, 2.0, 3.0))).toDF("id", "v")
      .select(Similarity.srpBucket(col("v"), nBits = 4, dim = 4).as("b"))
    val e = intercept[Exception](bad.collect())
    assert(e.getMessage.contains("srpBucket") ||
      Option(e.getCause).exists(_.getMessage.contains("srpBucket")))
  }

  test("IVF ANN: probing every cell reproduces brute force exactly") {
    val emb = spark.read.parquet(s"${sf("sf0.01")}/embeddings.parquet")
    val q = emb.where(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().toSet

    val exact = pairs(Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 5))
    val full = pairs(Similarity.ivfTopK(emb, q, "vec_id", "embedding", k = 5,
      nLists = 8, nProbe = 8)) // probe ALL cells → must equal brute force
    assert(full === exact)

    val partial = pairs(Similarity.ivfTopK(emb, q, "vec_id", "embedding", k = 5,
      nLists = 8, nProbe = 2))
    assert(partial.size === 50) // 10 queries × k — cells are never empty here
    val recall = (partial.map(p => (p._1, p._2)) intersect
      exact.map(p => (p._1, p._2))).size / 50.0
    assert(recall >= 0.2, s"suspiciously low IVF recall: $recall")
  }

  test("int8 retrieval ranks close to float retrieval (quantization recall)") {
    val emb = spark.read.parquet(s"${sf("sf0.01")}/embeddings.parquet")
    val q = emb.where(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 5))
    val quant = pairs(Similarity.int8TopK(emb, q, "vec_id", "embedding", k = 5))
    assert(quant.size === 50)
    val recall = (quant intersect exact).size / 50.0
    assert(recall >= 0.8, s"int8 quantization degraded recall to $recall")
  }

  test("cosine scan stays inside whole-stage codegen") {
    // range-backed plan with codegen-friendly array() construction (a
    // local Seq would fold to LocalTableScan; transform() lambdas are
    // CodegenFallback and would break the project out of codegen — the
    // very tax the native expression exists to avoid)
    val df = spark.range(100).select(
        array((0 until 8).map(i => (col("id") + i + 1).cast("double")): _*).as("a"),
        array((0 until 8).map(i => (col("id") * 2 + i + 1).cast("double")): _*).as("b"))
      .select(Similarity.cosine(col("a"), col("b")).as("c"))
    // executedPlan renders WholeStageCodegen membership as a "*(n)" prefix
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(df.as[Double].collect().forall(c => c > 0.8 && c <= 1.0))
  }
}
