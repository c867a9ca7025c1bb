package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Relational, Similarity, TextAnalysis}
import graft.streaming.Generator

/** Unit coverage for the training-data operators and generator source
  * (tier-1 style: construct rows, assert operator output). */
class DataOpsSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup groups identical normalized text") {
    val docs = Seq(
      (1L, "hello  world"), (2L, "Hello world"), (3L, "unrelated text here")
    ).toDF("doc_id", "text")
    val out = Dedup.exact(docs, "doc_id", "text")
      .select("keep_id", "n_copies").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 2L, 3L -> 1L)) // 1 and 2 collapse
  }

  test("minhash-LSH finds the planted near-dup, jaccard confirms") {
    val base = (1 to 40).map(i => s"token$i").mkString(" ")
    val nearDup = base.replace("token7", "tokenX")
    val other = (100 to 140).map(i => s"other$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text")

    val cands = Dedup.minhashLshPairs(docs, "doc_id", "text", numPerm = 12, rowsPerBand = 3)
      .as[(Long, Long)].collect().toSet
    assert(cands.contains((1L, 2L)))
    assert(!cands.exists(p => p._1 == 3L || p._2 == 3L))

    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(jac === Set((1L, 2L)))
  }

  test("editPairs: typo-level dup verified, hot block capped, distance banded") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away home"
    val docs = Seq(
      (1L, base),
      (2L, base.replace("jumps", "jumped")),   // 2 edits, same 20-char prefix
      (3L, base.replace("dog", "cat") + " x"), // 5 edits
      (4L, "completely different text that shares no prefix with the others")
    ).toDF("doc_id", "text")
    val got = Dedup.editPairs(docs, "doc_id", "text",
        prefixLen = 20, maxBlock = 64, verifyLen = 120, maxDist = 10)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(got((1L, 2L)) === 2)  // jumps->jumped: 1 sub + 1 insert
    assert(got((1L, 3L)) === 5)  // dog->cat (3 subs) + " x" (2 inserts)
    // pairs past maxDist vanish (thresholded Levenshtein returns -1).
    val tight = Dedup.editPairs(docs, "doc_id", "text",
      prefixLen = 20, maxBlock = 64, verifyLen = 120, maxDist = 2)
    assert(tight.select("a", "b").as[(Long, Long)].collect().toSet
      === Set((1L, 2L)))
    // a block larger than maxBlock is dropped wholesale (boilerplate cap).
    val boiler = (1L to 10L).map(i => (100 + i, base + s" tail$i"))
      .toDF("doc_id", "text")
    val capped = Dedup.editPairs(boiler, "doc_id", "text",
      prefixLen = 20, maxBlock = 5, verifyLen = 120, maxDist = 10)
    assert(capped.count() === 0)
  }

  test("simhash: identical texts hash equal, disjoint texts differ") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w v"))
      .toDF("doc_id", "text")
    val h = Dedup.simhash(docs, "doc_id", "text").as[(Long, Long)].collect().toMap
    assert(h(1L) === h(2L))
    assert(h(1L) !== h(3L))
  }

  test("cosine: self=1, orthogonal=0") {
    val df = Seq(
      (Seq(1.0, 0.0), Seq(1.0, 0.0)),
      (Seq(1.0, 0.0), Seq(0.0, 1.0))
    ).toDF("a", "b")
    val sims = df.select(Similarity.cosine(col("a"), col("b"))).as[Double].collect()
    assert(sims(0) === 1.0 +- 1e-12)
    assert(sims(1) === 0.0 +- 1e-12)
  }

  test("brute-force topK ranks by similarity") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(-1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val nn = Similarity.bruteForceTopK(vecs, vecs.where(col("vec_id") === 0),
        "vec_id", "embedding", k = 3)
      .orderBy("rank").select("neighbor_id").as[Long].collect()
    assert(nn.toSeq === Seq(1L, 2L, 3L))
  }

  test("int8 quantization: codes in range, dequantization error <= scale/2") {
    val vecs = Seq(
      (0L, Seq(0.5f, -1.25f, 3.75f, 0.0f)),
      (1L, Seq(2.0f, 2.0f, 2.0f, 2.0f)) // constant vector: scale guard
    ).toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(vecs, "vec_id", "embedding")
      .as[(Long, String, Double, Double)].collect().sortBy(_._1)
    val orig = vecs.as[(Long, Seq[Float])].collect().sortBy(_._1).toMap
    q.foreach { case (id, csv, zero, scale) =>
      val codes = csv.split(",").map(_.toInt)
      assert(codes.forall(c => c >= 0 && c <= 255))
      codes.zip(orig(id)).foreach { case (c, x) =>
        assert(math.abs((zero + c * scale) - x) <= scale / 2 + 1e-9)
      }
    }
    assert(q(1)._4 === 1.0) // constant vector falls back to unit scale
  }

  test("HLL sketch: approx distinct within the configured error bound") {
    val df = (1L to 20000L).map(i => (i % 500, i)).toDF("uid", "x")
    val approx = df.agg(approx_count_distinct(col("uid"), rsd = 0.05))
      .as[Long].head()
    // 500 true distinct; 3 standard deviations of rsd=5%.
    assert(math.abs(approx - 500L) <= (500 * 0.15).toLong,
      s"approx=$approx outside HLL bound")
  }

  test("native HLL++ per-group estimates track exact distincts (ex-agg_hll)") {
    // The former `agg_hll` correctness query, kept as a spec-only
    // error-bound check: Spark's native approx_count_distinct sketch is
    // not engine-portable, so it has no DuckDB oracle by design — its
    // portable twins agg_kmv/agg_hll_md5 stay hash-checked in the gate.
    val ev = graft.ops.Tables.events(spark, sf())
    val rows = ev.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .as[(String, Long, Long)].collect()
    assert(rows.length > 0)
    rows.foreach { case (et, approx, exact) =>
      // default rsd = 5%; allow 3 sigma + small-cardinality slack
      val tol = math.max(3L, (exact * 0.15).toLong)
      assert(math.abs(approx - exact) <= tol,
        s"$et: approx=$approx exact=$exact outside HLL++ bound")
    }
  }

  test("X1: parquet writes honor the compression codec end to end") {
    val dir = java.nio.file.Files.createTempDirectory("codec").toString
    val df = (1L to 1000L).toDF("v")
    df.write.mode("overwrite").option("compression", "zstd").parquet(dir)
    val files = new java.io.File(dir).listFiles.map(_.getName)
    assert(files.exists(_.endsWith(".zstd.parquet")), files.mkString(","))
    assert(spark.read.parquet(dir).count() === 1000L)
  }

  test("language id picks the profile with most stopword hits") {
    val docs = Seq(
      (1L, "the cat and the dog of a house"),
      (2L, "el gato y la casa de que")
    ).toDF("doc_id", "text")
    val langs = docs.select(col("doc_id"), TextAnalysis.langId(col("text")))
      .as[(Long, String)].collect().toMap
    assert(langs(1L) === "en")
    assert(langs(2L) === "es")
  }

  test("as-of join picks most recent prior value per key") {
    val left = Seq(("k", ts("2024-01-01 00:01:00"), 1L), ("k", ts("2024-01-01 00:03:00"), 2L))
      .toDF("key", "ts", "id")
    val right = Seq(
      ("k", ts("2024-01-01 00:00:30"), 10.0),
      ("k", ts("2024-01-01 00:02:00"), 20.0),
      ("k", ts("2024-01-01 00:09:00"), 90.0))
      .toDF("key", "ts", "value")
    val out = Relational.asOfJoin(left, right, Seq("key"), "ts", "value", "asof")
      .select("id", "asof").as[(Long, Double)].collect().toMap
    assert(out === Map(1L -> 10.0, 2L -> 20.0))
  }

  test("tolerance as-of: exactly-at-bound matches, one microsecond past is null") {
    val left = Seq(
      ("k", ts("2024-01-01 00:01:00"), 1L),   // 30s stale -> fresh
      ("k", ts("2024-01-01 00:01:30"), 2L),   // exactly 60s -> fresh (<=)
      ("k", ts("2024-01-01 00:01:30.000001"), 3L), // 60s + 1us -> null
      ("k", ts("2023-12-31 00:00:00"), 4L))   // no prior at all -> null
      .toDF("key", "ts", "id")
    val right = Seq(("k", ts("2024-01-01 00:00:30"), 10.0))
      .toDF("key", "ts", "value")
    val out = Relational.asOfJoinTolerance(left, right, Seq("key"), "ts",
        "value", "fresh", maxStalenessUs = 60000000L)
      .select("id", "fresh").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out === Map(1L -> Some(10.0), 2L -> Some(10.0), 3L -> None, 4L -> None))
  }

  test("generator batch: round-robin keys and JSON payload") {
    val g = Generator.batch(spark, rows = 100, keyCount = 5)
    assert(g.select("key").distinct().count() === 5)
    val payload = g.select(get_json_object(col("payload"), "$.value")).as[String].head()
    assert(payload === "0")
  }

  // ScalaTest's +- for doubles
  private implicit class DoubleOps(d: Double) {
    def +-(eps: Double): org.scalactic.TripleEqualsSupport.Spread[Double] =
      org.scalactic.TripleEqualsSupport.Spread(d, eps)
  }
}
