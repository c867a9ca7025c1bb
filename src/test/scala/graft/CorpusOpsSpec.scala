package graft

import org.apache.spark.sql.functions._
import graft.ops.{CorpusOps, Dedup}

/** Laws for the corpus-assembly operators: split totality/determinism,
  * stratified-cap enforcement, chunk reassembly, packing capacity/
  * completeness, and connected-component transitivity. */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit: total, deterministic, roughly proportional") {
    val df = (1L to 2000L).toDF("id")
    val s = CorpusOps.hashSplit(df, "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = s.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum === 2000L)                      // total: every row assigned
    assert(counts("train") > 1500 && counts("train") < 1700) // ~1600
    assert(counts("val") > 130 && counts("val") < 270)
    // deterministic: same assignment on a re-run and under repartitioning.
    val again = CorpusOps.hashSplit(df.repartition(7), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(s.except(again).count() === 0 && again.except(s).count() === 0)
  }

  test("stratifiedSample caps each stratum and keeps a deterministic subset") {
    val df = (1L to 900L).map(i => (i, s"src${i % 3}")).toDF("id", "stratum")
    val kept = CorpusOps.stratifiedSample(df, "id", "stratum", perStratum = 50)
    val per = kept.groupBy("stratum").count().as[(String, Long)].collect().toMap
    // expectation is 50 of 300 per stratum; hash noise stays well inside 2x.
    per.values.foreach(n => assert(n > 20 && n < 100, s"stratum kept $n"))
    val again = CorpusOps.stratifiedSample(df.repartition(5), "id", "stratum", 50)
    assert(kept.except(again).count() === 0 && again.except(kept).count() === 0)
  }

  test("chunk: concatenating chunks in order reproduces the token stream") {
    val docs = Seq(
      (1L, (1 to 100).map(i => s"t$i").mkString(" ")), // 100 tokens -> 4 chunks of 32/32/32/4
      (2L, "just three tokens"),
      (3L, (1 to 32).map(i => s"u$i").mkString(" "))   // exact multiple: single full chunk
    ).toDF("doc_id", "text")
    val ch = CorpusOps.chunk(docs, "doc_id", "text", chunkTokens = 32)
    val back = ch.orderBy("doc_id", "chunk_idx")
      .groupBy("doc_id").agg(concat_ws(" ", collect_list("chunk_text")).as("t"))
      .as[(Long, String)].collect().toMap
    val orig = docs.as[(Long, String)].collect().toMap
    assert(back === orig)
    val n = ch.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(n === Map(1L -> 4L, 2L -> 1L, 3L -> 1L))
    // per-chunk token counts sum to the doc's token count.
    val sums = ch.groupBy("doc_id").agg(sum("n_tokens")).as[(Long, Long)].collect().toMap
    assert(sums === Map(1L -> 100L, 2L -> 3L, 3L -> 32L))
  }

  test("packGreedy: bins respect capacity, cover every doc exactly once") {
    val docs = (1L to 200L).map(i => CorpusOps.PackedDoc(i, 10 + i % 90)).toDS()
    val bins = CorpusOps.packGreedy(docs, binTokens = 256, numShards = 4).collect()
    bins.foreach { b =>
      assert(b.total_tokens <= 256, s"bin over capacity: $b")
      assert(b.ids.nonEmpty)
    }
    val packed = bins.flatMap(_.ids).sorted
    assert(packed.toSeq === (1L to 200L))                    // complete, no duplicates
    // oversized doc still gets its own bin.
    val big = Seq(CorpusOps.PackedDoc(1L, 999L)).toDS()
    val bb = CorpusOps.packGreedy(big, binTokens = 256, numShards = 4).collect()
    assert(bb.length === 1 && bb.head.ids === Seq(1L))
  }

  test("packNextFit: capacity/completeness laws + sequential-fold equivalence") {
    val docs = (1L to 200L).map(i => CorpusOps.PackedDoc(i, 10 + i % 90)).toDS()
    val bins = CorpusOps.packNextFit(docs, binTokens = 256, numShards = 4).collect()
    bins.foreach { b =>
      assert(b.total_tokens <= 256 || b.ids.length == 1, s"bin over capacity: $b")
      assert(b.ids.nonEmpty)
    }
    assert(bins.flatMap(_.ids).sorted.toSeq === (1L to 200L))
    // next-fit is a pure prefix fold: replay it per shard and compare the
    // exact (bin_idx → ids) assignment, not just aggregate laws.
    val byShard = (1L to 200L).groupBy(i => math.floorMod(i, 4L))
    byShard.foreach { case (shard, ids) =>
      var idx = 0; var load = 0L
      val expect = scala.collection.mutable.Map.empty[Int, List[Long]]
      ids.sorted.foreach { i =>
        val n = 10 + i % 90
        if (expect.contains(idx) && load + n > 256) { idx += 1; load = 0L }
        load += n; expect(idx) = i :: expect.getOrElse(idx, Nil)
      }
      val got = bins.filter(_.bin_key == shard)
        .map(b => b.bin_idx -> b.ids.toList).toMap
      assert(got === expect.map { case (k, v) => k -> v.reverse.sorted }.toMap,
        s"shard $shard assignment diverged")
    }
  }
  test("packGreedy properties: random sizes — capacity, completeness, determinism") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val docsGen = Gen.listOfN(80, Gen.choose(1L, 300L))
    val p = Prop.forAll(docsGen) { sizes =>
      val ds = sizes.zipWithIndex
        .map { case (n, i) => CorpusOps.PackedDoc(i.toLong, n) }.toDS()
      val bins = CorpusOps.packGreedy(ds, binTokens = 256, numShards = 4).collect()
      val capOk = bins.forall(b => b.total_tokens <= 256 || b.ids.length == 1)
      val coverOk = bins.flatMap(_.ids).sorted.toSeq == sizes.indices.map(_.toLong)
      val sumOk = bins.forall(b =>
        b.total_tokens == b.ids.map(id => sizes(id.toInt)).sum)
      capOk && coverOk && sumOk
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(5), p)
    assert(r.passed, r.status.toString)
  }

  test("samplePerGroup: exactly min(k, |group|) rows, layout-independent") {
    val df = (0L until 50L).map(i => (i, s"g${i % 4}")).toDF("id", "g")
      .union(Seq((1000L, "tiny")).toDF("id", "g")) // 1-row group
    val a = CorpusOps.samplePerGroup(df, "id", "g", 5)
      .select("g", "id").as[(String, Long)].collect().toSet
    val sizes = a.groupBy(_._1).view.mapValues(_.size).toMap
    assert(sizes === Map("g0" -> 5, "g1" -> 5, "g2" -> 5, "g3" -> 5,
      "tiny" -> 1))
    // repartitioned input draws the identical sample (pure function of
    // the data, the property a true reservoir lacks)
    val b = CorpusOps.samplePerGroup(df.repartition(7, col("id")), "id", "g", 5)
      .select("g", "id").as[(String, Long)].collect().toSet
    assert(b === a)
  }

  test("null robustness: null text/ids flow through without crashing") {
    val docs = Seq[(java.lang.Long, String)](
      (1L, "alpha beta gamma delta"),
      (2L, null),                       // null text
      (null, "some text here okay"),    // null id
      (4L, ""))                         // empty text
      .toDF("doc_id", "text")
    // dedup family: null/short texts simply produce no shingles.
    assert(Dedup.minhashLshPairs(docs, "doc_id", "text").count() === 0)
    assert(Dedup.exact(docs, "doc_id", "text").count() === 4) // null hash is its own group
    // text analysis: null text yields null features, no exceptions.
    val q = graft.ops.TextAnalysis.qualityFeatures(docs, "text").collect()
    assert(q.length === 4)
    // splits: null ids get a deterministic bucket (the ELSE arm).
    val s = CorpusOps.hashSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(s.where(col("doc_id").isNull).select("split").as[String].head() === "test")
    // chunking: null text yields zero chunks rather than a crash.
    assert(CorpusOps.chunk(docs, "doc_id", "text", 8)
      .where(col("doc_id") === 2L).count() === 0)
  }

  test("connectedComponents: chains close transitively, singletons stay put") {
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    // 1-2, 2-3 chain; 5-6 pair; 4 isolated.
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val cc = Dedup.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
  }

  test("connectedComponents: long path needs multiple propagation rounds") {
    val n = 12L
    val nodes = (1L to n).toDF("id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("a", "b")
    val cc = Dedup.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(cc === (1L to n).map(_ -> 1L).toMap)
  }

  test("shardByTokenBudget: distributed prefix sum equals the global-window spec") {
    import org.apache.spark.sql.expressions.Window
    // Gapped, shuffled ids with varied doc lengths across many partitions.
    val docs = (1L to 600L).filter(_ % 7 != 0)
      .map(i => (i * 3, Seq.fill((i % 17 + 1).toInt)("w").mkString(" ")))
      .toDF("doc_id", "text").repartition(16)
    val got = CorpusOps.shardByTokenBudget(docs, "doc_id", "text", budget = 100L)
    // Reference: the one-task global window (fine at test size only).
    val ref = docs.select(col("doc_id"),
        graft.ops.TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      .withColumn("before", coalesce(sum(col("n_tokens")).over(
        Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("n_tokens"),
        floor(col("before") / 100.0).as("shard"))
    assert(got.except(ref).count() === 0 && ref.except(got).count() === 0)
    // Laws: shards are contiguous in id order and within budget + one doc.
    val byShard = got.groupBy("shard").agg(
        sum("n_tokens").as("tot"), max("n_tokens").as("mx"),
        min("doc_id").as("lo"), max("doc_id").as("hi"))
      .orderBy("shard").collect()
    byShard.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(4) < b.getLong(3), "contiguous ranges")
      case _ =>
    }
    byShard.foreach(r => assert(r.getLong(1) <= 100L + r.getLong(2),
      s"shard ${r.getLong(0)} holds ${r.getLong(1)} tokens"))
  }

  test("bloomIncrementalSpans: exact vs the unfiltered span join") {
    // Settled corpus and an increment sharing some 15-token spans.
    val span = (tag: String) => (1 to 15).map(i => s"tok$i$tag").mkString(" ")
    val settled = Seq(
      (1L, span("A") + " " + span("B")),
      (2L, span("C"))).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, span("A") + " fresh tail here"),   // collides with doc 1
      (11L, span("Z")),                        // clean
      (12L, span("C") + " " + span("A"))       // collides with 1 and 2
    ).toDF("doc_id", "text")
    val got = Dedup.bloomIncrementalSpans(settled, incoming, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    val ref = Dedup.shingles(incoming, "doc_id", "text", 15)
      .withColumnRenamed("doc_id", "new_id")
      .join(Dedup.shingles(settled, "doc_id", "text", 15)
        .withColumnRenamed("doc_id", "old_id"), "shingle")
      .select("new_id", "old_id").distinct()
      .as[(Long, Long)].collect().toSet
    assert(got === ref)
    assert(got === Set((10L, 1L), (12L, 1L), (12L, 2L)))
  }

  test("contaminationFraction: planted overlap scored exactly, clean docs keep") {
    val span = (tag: String) => (1 to 15).map(i => s"tok$i$tag").mkString(" ")
    val settled = Seq((1L, span("A")), (2L, span("B"))).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, span("A") + " x y z a b"),        // 15 of 20 tokens covered
      (11L, span("Z") + " q r s t u"),        // clean
      (12L, span("A") + " " + span("B"))      // fully covered
    ).toDF("doc_id", "text")
    val got = Dedup.contaminationFraction(settled, incoming, "doc_id", "text",
        maxFrac = 0.8)
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(10L) === ((20L, 15L, 0.75, true)))
    assert(got(11L) === ((20L, 0L, 0.0, true)))
    assert(got(12L) === ((30L, 30L, 1.0, false)))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged exactly") {
    val v1 = Seq((1L, "a", "en"), (2L, "b", "en"), (3L, "c", "de"))
      .toDF("id", "text", "lang")
    val v2 = Seq((2L, "b", "en"), (3L, "c2", "de"), (4L, "d", "fr"))
      .toDF("id", "text", "lang")
    val got = CorpusOps.snapshotDiff(v1, v2, "id", Seq("text", "lang"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
    // identical snapshots: everything unchanged (digest covers all cols).
    val same = CorpusOps.snapshotDiff(v1, v1, "id", Seq("text", "lang"))
    assert(same.where(col("change") =!= "unchanged").count() === 0)
    // a change in a column OUTSIDE the digest is invisible by contract.
    val v2lang = v1.withColumn("lang", lit("xx"))
    val textOnly = CorpusOps.snapshotDiff(v1, v2lang, "id", Seq("text"))
    assert(textOnly.where(col("change") =!= "unchanged").count() === 0)
  }

  test("scd2 folds repeats into intervals; valid_to chains to the next change") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      (1L, ts(0), 10L, "bronze"), (1L, ts(1), 11L, "bronze"),
      (1L, ts(2), 12L, "silver"), (1L, ts(3), 13L, "bronze"),
      (2L, ts(5), 14L, "gold")
    ).toDF("user_id", "ts", "event_id", "tier")
    val got = graft.ops.Relational.scd2(ev, Seq("user_id"), "ts",
        Seq("tier"), Seq(col("ts"), col("event_id")))
      .as[(Long, String, Timestamp, Option[Timestamp])].collect().toSet
    assert(got === Set(
      (1L, "bronze", ts(0), Some(ts(2))),  // repeat at ts(1) folded in
      (1L, "silver", ts(2), Some(ts(3))),
      (1L, "bronze", ts(3), None),         // re-entering a past state re-opens
      (2L, "gold", ts(5), None)))
    // intervals tile: each user's valid_from chain is gap-free by
    // construction (valid_to == next valid_from), so an as-of probe at
    // any instant >= first event lands in exactly one interval.
    val probe = Timestamp.valueOf("2024-01-01 00:02:30")
    val hit = got.filter { case (u, _, f, t) =>
      u == 1L && !f.after(probe) && t.forall(_.after(probe)) }
    assert(hit.map(_._2) === Set("silver"))
  }

  test("contributionBound: whale capped at first-cap rows, others untouched") {
    // whale user 1: 5 'buy' events of 10.00 each; user 2: 2 events;
    // user 3: 1 'view' event — cap 3 keeps the whale's FIRST three.
    val rows = (1 to 5).map(i => (1L, "buy", 10.00, i.toLong)) ++
      Seq((2L, "buy", 5.00, 10L), (2L, "buy", 5.00, 11L),
        (3L, "view", 2.00, 12L))
    val df = rows.toDF("user_id", "event_type", "value", "event_id")
    val got = CorpusOps.contributionBound(df, "user_id", "event_type",
        "value", "event_id", cap = 3)
      .collect().map(r => r.getString(0) -> r).toMap
    val buy = got("buy")
    assert(buy.getLong(1) === 7L)          // n_events
    assert(buy.getLong(2) === 6000L)       // raw cents: 5*1000 + 2*500
    assert(buy.getLong(3) === 4000L)       // bounded: 3*1000 + 2*500
    assert(buy.getLong(4) === 2L)          // dropped rows (whale's 4th, 5th)
    assert(buy.getLong(5) === 1L)          // exactly one user capped
    val view = got("view")
    assert(view.getLong(2) === view.getLong(3) && view.getLong(5) === 0L)
    assert(view.getDouble(6) === 1.0)      // kept_frac untouched
  }

  // sequential waterfill reference: raise t until sum(min(cap, t·w)) = B,
  // then largest-remainder the unsaturated residual — shared by the
  // fixed-case differential and the scalacheck property below.
  private def waterfillRef(rows: Seq[(String, Long, Long)],
                           bNum: Long, r: Int): Map[String, Long] = {
    val caps = rows.map { case (s, u, w) => (s, u * r, w) }
    val b = rows.map(_._2).sum * bNum
    var sat = Set.empty[String]
    var changed = true
    while (changed) {
      val csat = caps.filter(c => sat(c._1)).map(_._2).sum
      val wun = caps.filter(c => !sat(c._1)).map(_._3).sum
      val newly = caps.filter(c => !sat(c._1) &&
        BigInt(c._2) * wun <= BigInt(b - csat) * c._3).map(_._1)
      changed = newly.nonEmpty
      sat ++= newly
    }
    val csat = caps.filter(c => sat(c._1)).map(_._2).sum
    val resid = math.min(b - csat, Long.MaxValue)
    val wun = caps.filter(c => !sat(c._1)).map(_._3).sum
    val base = caps.map { case (s, cap, w) =>
      if (sat(s)) (s, cap, -1L)
      else (s, resid * w / wun, resid * w % wun)
    }
    val leftover = resid - base.filter(x => !sat(x._1)).map(_._2).sum
    val bumped = base.filter(x => !sat(x._1))
      .sortBy(x => (-x._3, x._1)).take(leftover.toInt).map(_._1).toSet
    base.map { case (s, v, _) =>
      s -> (if (bumped(s)) v + 1 else v)
    }.toMap
  }

  test("waterfillBudget replays the sequential waterfill; sum = budget") {
    import org.apache.spark.sql.functions._
    // skewed supplies and weights so some sources saturate
    val rows = Seq(("a", 100L, 1L), ("b", 50L, 5L), ("c", 400L, 2L),
      ("d", 10L, 8L), ("e", 200L, 4L))
    val counts = rows.toDF("source", "available", "weight")
    def run(bNum: Long, r: Int) =
      graft.ops.CorpusOps.waterfillBudget(counts, "source", bNum, 1L, r)
        .collect().map(x => x.getString(0) ->
          ((x.getLong(2), x.getLong(3), x.getAs[Double]("epochs")))).toMap
    for ((bNum, r) <- Seq((2L, 3), (3L, 4), (1L, 2))) {
      val got = run(bNum, r)
      val want = waterfillRef(rows, bNum, r)
      val b = rows.map(_._2).sum * bNum
      assert(got.map(x => x._1 -> x._2._2) === want, s"b=$bNum r=$r")
      assert(got.values.map(_._2).sum === math.min(b,
        rows.map(_._2).sum * r), s"sum must hit budget (or all caps)")
      got.foreach { case (s, (cap, alloc, ep)) =>
        assert(alloc <= cap, s"$s over cap")
        assert(ep <= r + 1e-9)
      }
    }
    // budget beyond all caps: everyone capped, shortfall visible
    val over = run(10L, 2)
    assert(over.values.map(_._2).sum === rows.map(_._2).sum * 2)
    assert(over.forall { case (_, (cap, alloc, _)) => alloc === cap })
  }

  test("waterfillBudget property: random supplies/weights/budgets") {
    import org.apache.spark.sql.functions._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val caseGen = for {
      n <- Gen.choose(2, 8)
      us <- Gen.listOfN(n, Gen.choose(1L, 5000L))
      ws <- Gen.listOfN(n, Gen.choose(1L, 50L))
      bNum <- Gen.choose(1L, 6L)
      r <- Gen.choose(1, 5)
    } yield (us.indices.map(i => (s"s$i", us(i), ws(i))), bNum, r)
    val prop = Prop.forAll(caseGen) { case (rows, bNum, r) =>
      val got = graft.ops.CorpusOps
        .waterfillBudget(rows.toDF("source", "available", "weight"),
          "source", bNum, 1L, r)
        .collect().map(x => x.getString(0) -> x.getLong(3)).toMap
      val want = waterfillRef(rows, bNum, r)
      val b = rows.map(_._2).sum * bNum
      val totCap = rows.map(_._2).sum * r
      got == want &&
        got.values.sum == math.min(b, totCap) &&
        rows.forall { case (s, u, _) => got(s) <= u * r }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
