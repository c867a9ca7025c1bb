package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ops.{Similarity, TextAnalysis}

/** Laws for the round-3 curation operators: SemDeDup, the hashed-logistic
  * quality classifier, DSIR importance weights, and last-touch
  * attribution. */
class CurationOpsSpec extends SparkSpec {

  test("semDedup partitions the corpus and keeps no near-dup pair") {
    val emb = spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet")
    val out = Similarity.semDedup(emb, "vec_id", "embedding",
      threshold = 0.2, k = 8, dim = 64).cache()
    assert(out.count() === emb.count(), "every vector labeled exactly once")
    assert(out.select("vec_id").distinct().count() === emb.count())

    // Invariant: within a cell, no two KEPT vectors are near-dups — every
    // qualifying pair dropped its loser, so at most the winner survives.
    val kept = out.where(col("keep"))
      .join(emb, "vec_id")
      .select(col("vec_id"), col("cell"),
        transform(col("embedding"), _.cast("double")).as("v"))
    val l = kept.select(col("vec_id").as("a"), col("cell"), col("v").as("va"))
    val r = kept.select(col("vec_id").as("b"), col("cell"), col("v").as("vb"))
    val survivors = l.join(r, "cell").where(col("a") < col("b"))
      .where(Similarity.cosine(col("va"), col("vb")) >= 0.2)
    assert(survivors.count() === 0, "no same-cell near-dup pair both kept")

    // at this threshold the synthetic table must actually drop something
    // (emb_neardup_lsh finds hundreds of pairs at sf0.01).
    assert(out.where(!col("keep")).count() > 0)
    out.unpersist()
  }

  test("semDedup is deterministic under repartitioning") {
    val emb = spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet")
    val a = Similarity.semDedup(emb, "vec_id", "embedding", 0.2)
      .orderBy("vec_id").collect()
    val b = Similarity.semDedup(emb.repartition(7), "vec_id", "embedding", 0.2)
      .orderBy("vec_id").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("dedupInline removes repeated-trigram spans, keeps the first") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c x a b c"),        // trigram "a b c" repeats at pos 4
      (2L, "p q r s t u v"),        // repeat-free → verbatim
      (3L, "m n o m n o m n o"))    // two repeats of "m n o"
      .toDF("doc_id", "text")
    val out = TextAnalysis.dedupInline(docs, "doc_id", "text", w = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(out(1L) === (("a b c x", 3)), out(1L))
    assert(out(2L) === (("p q r s t u v", 0)), out(2L))
    // "m n o"@0 keeps 0-2, but the interior repeated trigrams "n o m"@1
    // and "o m n"@2 are ALSO first-of-repeated and keep 3 and 4 — the
    // position-algebra semantics protect one overlap beyond the first
    // occurrence; everything past it (5..8) is repeat-only coverage.
    assert(out(3L) === (("m n o m n", 4)), out(3L))
  }

  test("classifierScore matches a hand-rolled scalar reimplementation") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
      .limit(50).cache()
    val got = TextAnalysis.classifierScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap

    def bucket(t: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(t.getBytes("UTF-8")).take(4)
        .map(x => f"${x & 0xff}%02x").mkString
      (java.lang.Long.parseLong(hex, 16) % TextAnalysis.ClfDim).toInt
    }
    docs.select("doc_id", "text").collect().foreach { case Row(id: Long, text: String) =>
      val toks = text.split(" ", -1)
      var s = 0.0
      toks.foreach(t => s += TextAnalysis.clfWeights(bucket(t)))
      val z = TextAnalysis.ClfBias + s / toks.length
      val score = BigDecimal(1.0 / (1.0 + math.exp(-z)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (gs, gk) = got(id)
      assert(math.abs(gs - score) < 1e-9, s"doc $id score")
      assert(gk === (z > 0), s"doc $id label")
    }
    docs.unpersist()
  }

  test("dsirWeights upweights docs that look like the target domain") {
    import spark.implicits._
    // target domain speaks "alpha beta"; general noise speaks "gamma delta".
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha", "tgt"),
      (2L, "alpha beta alpha", "tgt"),
      (3L, "gamma delta gamma delta gamma", "other"),
      (4L, "alpha beta gamma", "other"), // mixed: target-ish bigrams
      (5L, "delta gamma delta", "other")
    ).toDF("doc_id", "text", "source")
    val w = TextAnalysis.dsirWeights(docs, "doc_id", "text",
      col("source") === "tgt")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // docs of target bigrams score strictly higher than pure-noise docs,
    // and the mixed doc lands in between.
    assert(w(1L) > w(4L) && w(4L) > w(3L))
    assert(w(2L) > w(5L))
    // target-bigram docs get POSITIVE log-ratios, noise negative.
    assert(w(1L) > 0 && w(3L) < 0)
  }

  test("cdcChunks covers every token exactly once, contiguously") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val out = graft.ops.CorpusOps.cdcChunks(docs, "doc_id", "text").cache()
    val perDoc = out.groupBy("doc_id")
      .agg(sum("n_tokens").as("covered"), min("start_tok").as("first"),
        max(col("start_tok") + col("n_tokens")).as("past_end"),
        count(lit(1)).as("n_chunks"))
      .join(docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok")), "doc_id")
    assert(perDoc.where(col("covered") =!= col("n_tok")).count() === 0)
    assert(perDoc.where(col("first") =!= 1).count() === 0)
    assert(perDoc.where(col("past_end") =!= col("n_tok") + 1).count() === 0)
    // the boundary rule actually fires (docs are ~100+ tokens, mean chunk ~32)
    assert(perDoc.where(col("n_chunks") >= 2).count() > 0)
    out.unpersist()
  }

  test("cdcChunks boundaries are stable under a mid-doc edit") {
    import spark.implicits._
    // 400 deterministic pseudo-random tokens; insert one token at pos 200.
    val rnd = new scala.util.Random(7)
    val toks = Seq.fill(400)("tok" + rnd.nextInt(50))
    val edited = toks.take(200) ++ Seq("INSERTED") ++ toks.drop(200)
    val df = Seq((1L, toks.mkString(" ")), (2L, edited.mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = graft.ops.CorpusOps.cdcChunks(df, "doc_id", "text")
      .select("doc_id", "chunk_hash").collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getString(1)).toSeq }
    val (a, b) = (chunks(1L), chunks(2L))
    val shared = a.intersect(b).size
    // all chunks except the edited one (and at most its successor, while
    // the boundary stream re-synchronizes) survive the insertion.
    assert(a.size - shared <= 2, s"only the touched chunks change (${a.size - shared})")
    assert(shared >= a.size - 2 && a.size >= 5)
  }

  test("KMV sketch: exact below k, bounded error above, merge-invariant") {
    import spark.implicits._
    import graft.functions.KmvDistinct
    // below k distinct -> exact
    val small = (1 to 50).map(i => ("g", i.toLong)).toDF("g", "id")
    val ex = small.groupBy("g").agg(KmvDistinct.onMd5(col("id"), 128).as("d"))
      .collect().head.getLong(1)
    assert(ex === 50L, "sketch is exact below k")
    // above k: relative error within 4 standard errors (rse ~ 1/sqrt(k-2))
    val big = (1 to 20000).map(i => ("g", i.toLong)).toDF("g", "id")
    val est = big.groupBy("g").agg(KmvDistinct.onMd5(col("id"), 128).as("d"))
      .collect().head.getLong(1)
    val relErr = math.abs(est - 20000.0) / 20000.0
    assert(relErr < 4.0 / math.sqrt(126.0), s"relative error $relErr (est $est)")
    // partition layout must not change the estimate (merge = set union)
    val est7 = big.repartition(7).groupBy("g")
      .agg(KmvDistinct.onMd5(col("id"), 128).as("d")).collect().head.getLong(1)
    assert(est7 === est, "merge-order invariant")
    // duplicates don't inflate: the sketch sees the distinct set
    val dup = big.union(big).groupBy("g")
      .agg(KmvDistinct.onMd5(col("id"), 128).as("d")).collect().head.getLong(1)
    assert(dup === est, "duplicate-insensitive")
  }

  test("degenerate inputs: empty/null text, zero vectors, empty target") {
    import spark.implicits._
    // classifier: empty text scores finite (one "" token); null text
    // propagates null, never throws.
    val docs = Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "a b"))
      .toDF("doc_id", "text")
    val clf = TextAnalysis.classifierScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!clf(1L).isNullAt(1) && clf(1L).getDouble(1) > 0 && clf(1L).getDouble(1) < 1)
    assert(clf(2L).isNullAt(1) && clf(2L).isNullAt(2))
    // CDC: null text yields no chunks (not a null chunk), short text one chunk.
    val cdc = graft.ops.CorpusOps.cdcChunks(docs, "doc_id", "text")
    assert(cdc.where(col("doc_id") === 2L).count() === 0)
    assert(cdc.where(col("doc_id") === 3L).count() === 1)
    // semDedup: a zero vector's cosine is NULL (never NaN) -> it can't
    // near-dup anything; it stays, labeled, kept.
    val vecs = Seq(
      (1L, Array.fill(64)(0.0f)),
      (2L, Array.tabulate(64)(_.toFloat)),
      (3L, Array.tabulate(64)(i => i * 1.001f)) // near-identical to 2:
      // same cell (argmin distances differ negligibly), cosine ~1
    ).toDF("vec_id", "embedding")
    val sd = Similarity.semDedup(vecs, "vec_id", "embedding", threshold = 0.99)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(sd.size === 3 && sd(1L), "zero vector present and kept")
    assert(Seq(sd(2L), sd(3L)).count(identity) === 1,
      "near-identical pair drops exactly one member")
    // DSIR: empty target selection -> uniform-model scores, all finite.
    val w = TextAnalysis.dsirWeights(
      Seq((1L, "a b c", "x")).toDF("doc_id", "text", "source"),
      "doc_id", "text", col("source") === "nope").collect()
    assert(w.length === 1 && !w.head.isNullAt(1))
  }

  test("ev_attribution credits the latest in-window click only") {
    val out = graft.queries.EventQueries.queries("ev_attribution")(
      spark, sf("sf0.001")).cache()
    val ev = graft.ops.Tables.events(spark, sf("sf0.001")).cache()
    val purchases = ev.where(col("event_type") === "purchase")
    assert(out.count() === purchases.count(), "one row per purchase")

    val attributed = out.where(col("click_id").isNotNull)
    assert(attributed.count() > 0, "some purchases attribute")
    // the credited click is a real click of the same user, at-or-before
    // the purchase, within the hour.
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("real_ts"))
    val joined = attributed.join(clicks, Seq("click_id", "user_id"))
    assert(joined.count() === attributed.count(), "click belongs to the user")
    assert(joined.where(col("real_ts") =!= col("click_ts")).count() === 0)
    assert(attributed.where(col("click_ts") > col("ts")).count() === 0)
    assert(attributed.where(
      col("click_ts") < col("ts") - expr("INTERVAL 1 HOUR")).count() === 0)
    // no SKIPPED later click: none strictly between credited click and
    // purchase (inclusive-at-purchase ordering → ties at purchase ts OK).
    val skipped = attributed.join(
      ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("cts2")), "user_id")
      .where(col("cts2") > col("click_ts") && col("cts2") <= col("ts"))
    assert(skipped.count() === 0, "always the LATEST in-window click")
    out.unpersist(); ev.unpersist()
  }

  test("winnow position cap: over-cap document raises, at-cap encodes correctly") {
    import spark.implicits._
    // maxPos=99 (2-digit sortkeys) makes the guard testable without a
    // 10M-token row; the production default is MaxWinnowPositions.
    val atCap = (1 to 103).map(i => s"t$i").mkString(" ")   // 100 positions (k=4)
    val overCap = (1 to 104).map(i => s"t$i").mkString(" ") // 101 positions
    def run(text: String) = Seq((1L, text)).toDF("doc_id", "text")
      .select(TextAnalysis.winnowKeys(split(col("text"), " "), k = 4, maxPos = 99).as("wkeys"))
      .select(explode(TextAnalysis.winnowSelections(col("wkeys"), w = 4, maxPos = 99)).as("sel"))
      .select(col("sel.sel_pos")).as[Int].collect()

    val pos = run(atCap)
    assert(pos.nonEmpty && pos.forall(p => p >= 0 && p <= 99))
    // positions decode in order (no lexicographic corruption at the edge):
    // selection at the final window must be the max position selected.
    assert(pos.max <= 99)

    val e = intercept[Exception] { run(overCap) }
    assert(e.getMessage != null && e.getMessage.contains("chunk the document"),
      s"expected the winnow cap error, got: ${e.getMessage}")

    // the default cap leaves ordinary documents untouched.
    val normal = TextAnalysis.winnow(
      Seq((1L, (1 to 50).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(normal.count() > 0)
  }

  test("compressionRatio: repetition compresses, noise doesn't, runs agree") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val repetitive = (1 to 200).map(_ => "the same boilerplate line").mkString(" ")
    val noisy = (1 to 1000).map(_ => rnd.nextPrintableChar()).mkString
    val prose = "a modest sentence with ordinary words and a few repeats " * 10
    val df = Seq((1L, repetitive), (2L, noisy), (3L, prose), (4L, ""))
      .toDF("doc_id", "text")
    def run() = TextAnalysis.compressionRatio(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val got = run()
    assert(got(1L)._1 === repetitive.getBytes("UTF-8").length.toLong)
    assert(got(1L)._3 < 0.05, s"boilerplate must crush: ${got(1L)}")
    assert(got(2L)._3 > 0.5, s"noise must not: ${got(2L)}")
    assert(got(3L)._3 > got(1L)._3 && got(3L)._3 < got(2L)._3)
    assert(got(4L)._2 >= 0L) // empty doc: defined, no divide-by-zero
    assert(run() === got)    // deterministic across runs
    // zero shuffles: the scorer pipelines with the scan
    val plan = TextAnalysis.compressionRatio(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("watermarkScore: a green-list sampler's output flags; natural text doesn't") {
    import spark.implicits._
    // the same green rule as the op, in Scala
    def green(p: String, c: String): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val b0 = md.digest(s"$p|$c".getBytes("UTF-8"))(0)
      ((b0 >> 4) & 0xf) < 8
    }
    val vocab = (0 until 50).map(i => s"w$i")
    // watermarked: from each token, pick the first vocab word that is
    // green — exactly what a green-list sampler does
    val wm = Iterator.iterate(List("w0")) { acc =>
      vocab.find(c => green(acc.head, c)).get :: acc
    }.drop(80).next().reverse.mkString(" ")
    // natural: fixed pseudo-arbitrary walk, no green bias
    val nat = (0 until 81).map(i => vocab((i * 17 + 3) % 50)).mkString(" ")
    val out = graft.ops.TextAnalysis.watermarkScore(
        Seq((1L, wm), (2L, nat), (3L, "solo")).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getAs[Double]("z"),
          r.getBoolean(4)))).toMap
    val (n1, g1, z1, f1) = out(1L)
    assert(g1 === n1 && f1, s"fully green text must flag: ${out(1L)}")
    assert(z1 > 8.0)
    assert(!out(2L)._4, s"natural text must not flag: ${out(2L)}")
    assert(math.abs(out(2L)._3) < 4.0)
    assert(out(3L) === ((0L, 0L, 0.0, false))) // single token: no pairs
    // plan: strictly row-local — pipelines with the scan
    val plan = graft.ops.TextAnalysis.watermarkScore(
        Seq((1L, wm)).toDF("doc_id", "text"), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("removeFrequentSegments: cross-doc segments excised, order kept") {
    import spark.implicits._
    // 2-token segments; docs are concatenations of exact segments
    val boiler1 = "nav bar"      // in docs 1,2,3
    val boiler2 = "foot note"    // in docs 1,2
    val docs = Seq(
      (1L, s"$boiler1 alpha one $boiler2"),
      (2L, s"$boiler2 beta two $boiler1"),
      (3L, s"$boiler1 gamma three"),
      (4L, "delta four unique words"),
      (5L, s"$boiler1 $boiler2")) // nothing but boilerplate
      .toDF("doc_id", "text")
    val out = TextAnalysis.removeFrequentSegments(docs, "doc_id", "text",
        segTokens = 2, minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2)))).toMap
    assert(out(1L) === (("alpha one", 2)))
    assert(out(2L) === (("beta two", 2)))
    assert(out(3L) === (("gamma three", 1)))
    assert(out(4L) === (("delta four unique words", 0)))
    assert(out(5L) === (("", 2))) // all-boiler doc survives as a row
    // maxBoiler cap: only the (nd desc, seg)-top segment is excised —
    // boiler1 (3 docs) outranks boiler2 (2 docs)
    val capped = TextAnalysis.removeFrequentSegments(docs, "doc_id", "text",
        segTokens = 2, minDocs = 2, maxBoiler = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(capped(5L) === "foot note")
    // removal is a broadcast probe, never a data-side join shuffle
    val plan = TextAnalysis.removeFrequentSegments(docs, "doc_id", "text",
        segTokens = 2, minDocs = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      plan)
  }
}
