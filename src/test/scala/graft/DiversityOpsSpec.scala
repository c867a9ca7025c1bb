package graft

import org.apache.spark.sql.functions._
import graft.ops.{CorpusOps, Similarity}

/** Laws for the diversity-selection wave: MMR rerank, cluster-capped
  * sampling, and the cross-split leakage audit — each checked against a
  * sequential JVM reference (the oracle hash-checks cross-engine
  * equality; these specs check the MATH and the determinism contracts). */
class DiversityOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Bit-exact JVM twin of the CosineSimilarity expression (index-ordered
    * dot/norm sums, sqrt(na)*sqrt(nb) denominator). */
  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def md5hex8(id: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(id.toString.getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
  }

  test("mmrRerank replays the sequential greedy reference exactly") {
    val rnd = new scala.util.Random(42)
    val vecs = (0L until 31L).map(i =>
      (i, Array.fill(8)(rnd.nextDouble() * 2 - 1)))
    val df = vecs.map { case (i, v) => (i, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(df, df.where(col("vec_id") === 0),
        "vec_id", "embedding", k = 5, nCand = 12)
      .orderBy("step").collect()
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Int]("step")))

    // sequential reference on the SAME widened doubles the plan scores
    val wide = vecs.map { case (i, v) => i -> v.map(_.toFloat.toDouble) }.toMap
    val q = wide(0L)
    val cand = wide.toSeq.filter(_._1 != 0L)
      .map { case (i, v) => (i, cos(q, v), v) }
      .sortBy { case (i, s, _) => (-s, i) }.take(12)
    var selected = Vector(cand.head)
    var remaining = cand.tail
    for (_ <- 2 to 5) {
      val pick = remaining
        .map { case (i, s, v) =>
          val ms = selected.map(sel => cos(v, sel._3)).max
          (i, s, v, 0.7 * s - 0.3 * ms)
        }
        .sortBy { case (i, _, _, sc) => (-sc, i) }.head
      selected :+= ((pick._1, pick._2, pick._3))
      remaining = remaining.filterNot(_._1 == pick._1)
    }
    val want = selected.zipWithIndex.map { case ((i, _, _), t) => (i, t + 1) }
    assert(got.toSeq == want, s"got ${got.toSeq}, want $want")
    // and the greedy picks actually diversify: all distinct, step 1 is
    // the raw top-1
    assert(got.map(_._1).distinct.length == 5)
    assert(got.head._1 == cand.head._1)
  }

  test("clusterCapSample: cap takes the md5-ordered prefix, layout-blind") {
    val rnd = new scala.util.Random(7)
    val df = (0L until 60L).map(i =>
      (i, Array.fill(4)((rnd.nextDouble() * 2 - 1).toFloat)))
      .toDF("vec_id", "embedding")
    val full = Similarity.clusterCapSample(df, "vec_id", "embedding",
      cap = 100, k = 2, dim = 4).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cell"), r.getAs[Int]("rk")))
    assert(full.length == 60) // cap above every cell size keeps all rows

    // within each cell, rk must be the 1-based rank under (md5(id), id)
    full.groupBy(_._2).foreach { case (cell, rows) =>
      val want = rows.map(_._1).sortBy(i => (md5hex8(i), i))
        .zipWithIndex.map { case (i, r) => (i, r + 1) }.toMap
      rows.foreach { case (i, _, rk) =>
        assert(rk == want(i), s"cell $cell id $i: rk $rk != ${want(i)}")
      }
    }

    // capping = prefix of the full ordering, and repartitioning the
    // input must not change the draw (the hash is of the id, not the
    // position)
    val capped = Similarity.clusterCapSample(df, "vec_id", "embedding",
      cap = 3, k = 2, dim = 4).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cell"), r.getAs[Int]("rk")))
      .toSet
    assert(capped == full.filter(_._3 <= 3).toSet)
    val reparted = Similarity.clusterCapSample(df.repartition(7),
      "vec_id", "embedding", cap = 3, k = 2, dim = 4).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cell"), r.getAs[Int]("rk")))
      .toSet
    assert(reparted == capped)
  }

  test("splitLeakage reports exactly the planted cross-split dup pairs") {
    // 30 planted dup pairs (g, g+1000) with identical per-group texts and
    // zero cross-group shingle overlap: the only verified pairs are the
    // planted ones, and the audit must keep exactly those whose md5
    // splits differ.
    def unitHash(id: Long): Double =
      java.lang.Long.parseLong(md5hex8(id), 16).toDouble / 4294967296.0
    def split(id: Long): String = {
      val u = unitHash(id)
      if (u < 0.8) "train" else if (u < 0.9) "val" else "test"
    }
    val docs = (0L until 30L).flatMap { g =>
      val text = s"alpha$g beta$g gamma$g delta$g epsilon$g zeta$g"
      Seq((g, text), (g + 1000L, text))
    }.toDF("doc_id", "text")
    val got = CorpusOps.splitLeakage(docs, "doc_id", "text",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), threshold = 0.5)
      .collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[String]("split_a"), r.getAs[String]("split_b"),
        r.getAs[Double]("jaccard"))).toSet
    val want = (0L until 30L).collect {
      case g if split(g) != split(g + 1000L) =>
        (g, g + 1000L, split(g), split(g + 1000L), 1.0)
    }.toSet
    assert(want.nonEmpty, "fixture must plant at least one crossing pair")
    assert(got == want, s"got $got\nwant $want")
  }

  test("clusterSplit: zero leakage where the doc-hash split provably leaks") {
    // same planted-dup fixture as above: the doc-hash split leaks (shown
    // there); the cluster split must not — and the guarantee must be
    // STRUCTURAL: every verified near-dup pair shares a split because it
    // shares a cluster.
    val docs = (0L until 30L).flatMap { g =>
      val text = s"alpha$g beta$g gamma$g delta$g epsilon$g zeta$g"
      Seq((g, text), (g + 1000L, text))
    }.toDF("doc_id", "text")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val assigned = CorpusOps.clusterSplit(docs, "doc_id", "text", splits)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cluster_id"), r.getAs[String]("split")))).toMap
    assert(assigned.size == 60)
    // every planted pair: same cluster (the smaller id), same split
    (0L until 30L).foreach { g =>
      assert(assigned(g)._1 == g && assigned(g + 1000L)._1 == g)
      assert(assigned(g)._2 == assigned(g + 1000L)._2,
        s"pair $g leaked across splits")
    }
    // and the audit agrees: verified pairs × cluster split = no crossing
    val pairs = graft.ops.Dedup.lshVerifiedPairs(docs, "doc_id", "text", 0.5)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b) => assigned(a)._2 == assigned(b)._2 })
  }

  test("softDedupWeights: clusters share one doc of weight, total = #clusters") {
    // 30 planted pairs (weight 0.5 each member) + 10 singletons (1.0)
    val docs = ((0L until 30L).flatMap { g =>
      val text = s"alpha$g beta$g gamma$g delta$g epsilon$g zeta$g"
      Seq((g, text), (g + 1000L, text))
    } ++ (0L until 10L).map { i =>
      (5000L + i, s"solo$i unique$i text$i here$i only$i once$i")
    }).toDF("doc_id", "text")
    val got = graft.ops.Dedup.softDedupWeights(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_dups"), r.getAs[Double]("weight")))).toMap
    assert(got.size === 70)
    (0L until 30L).foreach { g =>
      assert(got(g) === ((2L, 0.5)), s"pair $g")
      assert(got(g + 1000L) === ((2L, 0.5)))
    }
    (0L until 10L).foreach(i => assert(got(5000L + i) === ((1L, 1.0))))
    // invariant: Σ weights = number of clusters (one doc's worth each)
    assert(got.values.map(_._2).sum === 40.0)
  }
}
