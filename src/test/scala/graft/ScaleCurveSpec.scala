package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** The SCALECURVE generator's null model, asserted: a k× scale-up must
  * hold the base corpus's DISTRIBUTION fixed while volume grows k× —
  * otherwise the measured curve conflates data growth with workload
  * drift. Timing itself lives in `graft.ScaleCurve` runs (SCALING.md);
  * these properties are what make those timings interpretable. */
class ScaleCurveSpec extends SparkSpec {

  private val base = "/root/testdata/sf0.001"

  test("documents: ids disjoint, volume k×, dup structure replicated not inflated") {
    val k = 3
    val docs = spark.read.parquet(s"$base/documents.parquet")
    val scaled = ScaleCurve.scaleDocuments(spark, base, k).persist()
    val n = docs.count()
    assert(scaled.count() === k * n)
    assert(scaled.select("doc_id").distinct().count() === k * n, "ids stay unique")
    // dup PAIR volume grows exactly k×: replicas never collide (token
    // suffixing), so the candidate graph is k disjoint copies of base.
    def pairCount(df: org.apache.spark.sql.DataFrame): Long =
      Dedup.minhashLshPairs(df, "doc_id", "text", numPerm = 12, rowsPerBand = 3).count()
    val basePairs = pairCount(docs)
    assert(basePairs > 0, "base corpus must actually contain near-dups")
    assert(pairCount(scaled.toDF()) === k * basePairs,
      "k disjoint replicas -> exactly k x the dup pairs")
    // no cross-replica pair: every pair stays within one replica stratum.
    // The stratum stride is the GENERATOR's stride, max(doc_id)+1 — not
    // the row count, which diverges from it whenever base ids have gaps.
    val stride = docs.agg(max("doc_id")).head.getLong(0) + 1
    val strat = Dedup.minhashLshPairs(scaled.toDF(), "doc_id", "text",
        numPerm = 12, rowsPerBand = 3)
      .where(floor(col("a") / stride) =!= floor(col("b") / stride))
    assert(strat.count() === 0, "replicas must not near-dup against each other")
    scaled.unpersist(); ()
  }

  test("embeddings: rotation preserves norms, ids offset per replica") {
    val k = 3
    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    val scaled = ScaleCurve.scaleEmbeddings(spark, base, k).persist()
    val n = emb.count()
    assert(scaled.count() === k * n)
    assert(scaled.select("vec_id").distinct().count() === k * n)
    def norms(df: org.apache.spark.sql.DataFrame) = df.select(
      round(aggregate(transform(col("embedding"), x => x.cast("double") * x),
        lit(0.0), (a, x) => a + x), 4).as("nrm"))
      .groupBy("nrm").count().orderBy("nrm").collect().toSeq
    // the multiset of vector norms is invariant per replica (rotation)
    assert(norms(scaled.toDF()).map(r => (r.getDouble(0), r.getLong(1))) ===
      norms(emb).map(r => (r.getDouble(0), r.getLong(1) * k)).sortBy(_._1))
    scaled.unpersist(); ()
  }

  test("events: k× users with verbatim per-user streams, ids disjoint") {
    val base = sf()
    val k = 3
    val ev = spark.read.parquet(s"$base/events.parquet")
    val scaled = ScaleCurve.scaleEvents(spark, base, k).persist()
    val n = ev.count()
    assert(scaled.count() === k * n)
    assert(scaled.select("event_id").distinct().count() === k * n)
    assert(scaled.select("user_id").distinct().count() ===
      k * ev.select("user_id").distinct().count())
    // behavioral distributions are replica-invariant: the per-type event
    // counts and the timestamp span are exactly k× / unchanged
    val byType = scaled.groupBy("event_type").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val baseTypes = ev.groupBy("event_type").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(byType === baseTypes.view.mapValues(_ * k).toMap)
    assert(scaled.agg(min("ts"), max("ts")).head ===
      ev.agg(min("ts"), max("ts")).head)
    scaled.unpersist(); ()
  }

  test("HeavyQueries lists each query once and every entry resolves in the registry") {
    // a duplicated name times the query twice and emits duplicate rows
    // into SCALECURVE.json (caught live twice: ts_cointegration r13,
    // the r14 legacy-sweep additions); an unresolvable name dies at
    // sweep time instead of review time
    val dups = ScaleCurve.HeavyQueries.groupBy(identity)
      .collect { case (q, occ) if occ.size > 1 => q }
    assert(dups.isEmpty, s"duplicate HeavyQueries entries: ${dups.mkString(", ")}")
    val missing = ScaleCurve.HeavyQueries.filterNot(Queries.all.contains)
    assert(missing.isEmpty, s"HeavyQueries not in registry: ${missing.mkString(", ")}")
  }
}
