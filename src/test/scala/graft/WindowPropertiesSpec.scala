package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based window semantics (SURVEY §5 — coverage the reference's
  * test suite lacks): window-assignment laws checked against an
  * independent model over randomized event sets, plus dedup invariants. */
class WindowPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val baseMs = ts("2024-01-01 00:00:00").getTime
  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(5), p)
    assert(r.passed, r.status.toString)
  }

  /** 150 events in a 1h span across 4 keys. */
  private val evGen: Gen[List[(Int, Int, Long)]] =
    Gen.listOfN(150, for {
      s <- Gen.choose(0, 3600); k <- Gen.choose(0, 3); v <- Gen.choose(0L, 100L)
    } yield (s, k, v))

  private def toDf(evs: List[(Int, Int, Long)]) =
    evs.map { case (s, k, v) => (new Timestamp(baseMs + s * 1000L), s"k$k", v) }
      .toDF("ts", "key", "value")

  test("fixed windows: each event lands in exactly the window truncate(ts, L)") {
    check(Prop.forAll(evGen) { evs =>
      {
        val rows = toDf(evs)
          .select(window(col("ts"), "60 seconds").as("w"), col("ts"))
          .select(col("w.start"), col("w.end"), col("ts"))
          .as[(Timestamp, Timestamp, Timestamp)].collect()
        rows.length == evs.length && rows.forall { case (s, e, t) =>
          s.getTime <= t.getTime && t.getTime < e.getTime &&
            e.getTime - s.getTime == 60000L &&
            s.getTime == t.getTime - (t.getTime - baseMs) % 60000L
        }
      }
    })
  }

  test("sliding windows: each event appears in exactly L/S windows, all containing it") {
    check(Prop.forAll(evGen) { evs =>
      {
        val rows = toDf(evs)
          .select(window(col("ts"), "60 seconds", "20 seconds").as("w"), col("ts"))
          .select(col("w.start"), col("ts"))
          .as[(Timestamp, Timestamp)].collect()
        // ceil(60/20) = 3 assignments per event, each window covering ts
        rows.length == evs.length * 3 &&
          rows.forall { case (s, t) =>
            s.getTime <= t.getTime && t.getTime < s.getTime + 60000L } &&
          rows.groupBy(_._2).values.forall(_.map(_._1).distinct.length == 3)
      }
    })
  }

  test("session windows: session count per key = 1 + gaps beyond the timeout") {
    check(Prop.forAll(evGen) { evs =>
      {
        val gapMs = 120000L
        val model = evs
          .map { case (s, k, v) => (s"k$k", baseMs + s * 1000L) }
          .groupBy(_._1).map { case (k, ts0) =>
            val sorted = ts0.map(_._2).distinct.sorted
            k -> (1 + sorted.zip(sorted.tail).count { case (a, b) => b - a > gapMs })
          }
        val got = toDf(evs)
          .groupBy(session_window(col("ts"), "120 seconds"), col("key"))
          .agg(count(lit(1)))
          .groupBy(col("key")).agg(count(lit(1)).as("n"))
          .as[(String, Long)].collect().toMap
        model.forall { case (k, n) => got(k) == n.toLong }
      }
    })
  }

  test("minhash LSH: an exact duplicate is always a candidate pair") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val docGen = Gen.listOfN(12, Gen.oneOf(vocab)).map(_.mkString(" "))
    check(Prop.forAll(Gen.listOfN(6, docGen)) { docs =>
      {
        // doc 0 duplicated under a fresh id — its pair MUST surface
        val rows = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) } :+
          (docs.length.toLong, docs.head)
        val pairs = graft.ops.Dedup.minhashLshPairs(
          rows.toDF("doc_id", "text"), "doc_id", "text",
          numPerm = 12, rowsPerBand = 3)
          .as[(Long, Long)].collect().toSet
        pairs.contains((0L, docs.length.toLong))
      }
    })
  }

  test("expression minhash signature ≡ grouped aggregation (property)") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val docGen = Gen.choose(1, 25).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
    check(Prop.forAll(Gen.listOfN(8, docGen)) { docs =>
      {
        val rows = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }
          .toDF("doc_id", "text")
        val viaExpr = graft.ops.Dedup
          .minhashSignatureExpr(rows, "doc_id", "text", numPerm = 12, shingleW = 3)
          .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
        val viaAgg = graft.ops.Dedup
          .minhashSignature(graft.ops.Dedup.shingles(rows, "doc_id", "text", 3),
            "doc_id", numPerm = 12)
          .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
        viaExpr == viaAgg // identical doc sets AND identical h0..h11 values
      }
    })
  }

  test("two-stage LSH dedup agrees with exhaustive jaccard (property)") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta",
      "iota", "kappa", "lambda", "mu")
    val docGen = Gen.listOfN(20, Gen.oneOf(vocab)).map(_.mkString(" "))
    check(Prop.forAll(Gen.listOfN(8, docGen)) { docs =>
      {
        val rows = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }
          .toDF("doc_id", "text")
        val exhaustive = graft.ops.Dedup
          .ngramJaccardPairs(rows, "doc_id", "text", threshold = 0.5)
          .as[(Long, Long, Double)].collect()
          .map { case (a, b, j) => (a, b) -> j }.toMap
        val verified = graft.ops.Dedup
          .lshVerifiedPairs(rows, "doc_id", "text", threshold = 0.5)
          .as[(Long, Long, Double)].collect()
        // every LSH-verified pair exists in the exhaustive result with the
        // IDENTICAL jaccard value — the verifier never invents or inflates.
        verified.forall { case (a, b, j) =>
          exhaustive.get((a, b)).contains(j)
        }
      }
    })
  }

  test("as-of join matches an independent model (property)") {
    val leftGen = Gen.listOfN(40, for {
      u <- Gen.choose(0, 3); s <- Gen.choose(0, 1000)
    } yield (s"u$u", s))
    val rightGen = Gen.listOfN(30, for {
      u <- Gen.choose(0, 3); s <- Gen.choose(0, 1000); v <- Gen.choose(1L, 999L)
    } yield (s"u$u", s, v))
    check(Prop.forAll(leftGen, rightGen) { (ls, rs0) =>
      // distinct right (u, ts): equal-ts right rows would make the
      // "most recent" value ambiguous on both sides of the comparison
      val rs = rs0.groupBy(r => (r._1, r._2)).values.map(_.head).toList
      val left = ls.zipWithIndex
        .map { case ((u, s), i) => (i.toLong, u, new Timestamp(baseMs + s * 1000L)) }
        .toDF("id", "u", "ts")
      val right = rs
        .map { case (u, s, v) => (u, new Timestamp(baseMs + s * 1000L), v) }
        .toDF("u", "ts", "v")
      val got = graft.ops.Relational
        .asOfJoin(left, right, Seq("u"), "ts", "v", "asof")
        .select("id", "asof").as[(Long, Option[Long])].collect().toMap
      val model = ls.zipWithIndex.map { case ((u, s), i) =>
        i.toLong -> rs.filter(r => r._1 == u && r._2 <= s)
          .sortBy(_._2).lastOption.map(_._3)
      }.toMap
      got == model
    })
  }

  test("winnowing guarantee: every w-window selects ≥1 fingerprint; matches a model (property)") {
    // the SIGMOD 2003 density/coverage contract: for every window of w
    // consecutive k-gram positions, at least one selected fingerprint
    // falls inside it — this is what makes winnowed fingerprint tables a
    // SOUND substring-match index (no k-gram run of length w can escape).
    // Checked against an independent rightmost-min model.
    val (k, w) = (3, 4)
    val docGen = Gen.listOfN(8,
      Gen.listOfN(40, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
    val p = Prop.forAll(docGen) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val sel = graft.ops.TextAnalysis.winnow(df, "doc_id", "text", k, w)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      // model: md5 per k-gram, rightmost minimal hash per window
      def md5hex(s: String): String =
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      val model = texts.zipWithIndex.flatMap { case (t, i) =>
        val toks = t.split(" ")
        val hs = (0 to toks.length - k)
          .map(p0 => p0 -> md5hex(toks.slice(p0, p0 + k).mkString(" ")))
        (0 to hs.length - w).map { s0 =>
          val win = hs.slice(s0, s0 + w)
          val mn = win.map(_._2).min
          win.filter(_._2 == mn).last // rightmost on ties
        }.distinct.map { case (p0, h) => (i.toLong, p0, h) }
      }.toSet
      val selSet = sel.toSet
      val coverage = texts.zipWithIndex.forall { case (t, i) =>
        val nSh = t.split(" ").length - k + 1
        (0 to nSh - w).forall { s0 =>
          sel.exists { case (d, p0, _) => d == i && p0 >= s0 && p0 < s0 + w }
        }
      }
      selSet == model && coverage
    }
    check(p)
  }

  test("exact dedup: n_copies sums to corpus size and keep_id is a member") {
    check(Prop.forAll(Gen.listOfN(30, Gen.oneOf("a b c", "d e f", "g h i", "a  b c "))) { texts =>
      {
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        val groups = graft.ops.Dedup.exact(df, "doc_id", "text")
          .as[(String, Long, Long)].collect()
        groups.map(_._3).sum == texts.length.toLong &&
          groups.forall(_._2 >= 0) &&
          // normalization: "a  b c " collapses into the "a b c" group
          groups.length <= 3
      }
    })
  }
}
