package graft

import org.apache.spark.sql.functions._
import graft.ops.{Retrieval, Tables}

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val qs = Seq("q1" -> Seq("cat", "dog"), "q2" -> Seq("fish"))

  test("searchTopK ranks by BM25: rarer terms and denser docs score higher") {
    val docs = Seq(
      (1L, "cat dog cat dog"),        // both terms, short -> top for q1
      (2L, "cat filler filler filler filler filler filler filler"),
      (3L, "dog cat filler filler"),
      (4L, "fish"),                   // only fish doc -> top (and only) for q2
      (5L, "filler filler filler")
    ).toDF("doc_id", "text")
    val out = Retrieval.searchTopK(docs, "doc_id", "text", qs, k = 3)
      .orderBy("qid", "rank").collect()
      .map(r => (r.getAs[String]("qid"), r.getAs[Int]("rank"), r.getAs[Long]("doc_id")))
    val q1 = out.filter(_._1 == "q1").map(t => (t._2, t._3)).toSeq
    assert(q1.head == (1, 1L), s"doc 1 must rank first for q1: ${q1.toList}")
    assert(q1.map(_._2).toSet == Set(1L, 2L, 3L))
    val q2 = out.filter(_._1 == "q2").map(_._3).toSeq
    assert(q2 == Seq(4L), s"only doc 4 matches q2: ${q2.toList}")
    // doc 5 (no query term) appears nowhere
    assert(!out.exists(_._3 == 5L))
  }

  test("phrase search counts token-exact occurrences, including tricky shapes") {
    val docs = Seq(
      (1L, "x table scan y table scan z"),  // two occurrences
      (2L, "table y scan"),                 // both terms, never adjacent
      (3L, "scan table"),                   // reversed order only
      (4L, "tabletable scanscan"),          // substrings must not match
      (5L, "a a a"),                        // repeated-token phrase below
      (6L, "table scan")                    // exact doc
    ).toDF("doc_id", "text")
    val got = Retrieval.phraseSearch(docs, "doc_id", "text",
        Seq("table", "scan"))
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 2, 6L -> 1), got.toString)
    // a phrase with a repeated token: "a a" occurs twice in "a a a"
    val rep = Retrieval.phraseSearch(docs, "doc_id", "text", Seq("a", "a"))
      .as[(Long, Int)].collect().toMap
    assert(rep == Map(5L -> 2), rep.toString)
  }

  test("persisted index serves identical results to the index-free path") {
    val docs = Tables.documents(spark, sf())
    val direct = Retrieval.searchTopK(docs, "doc_id", "text",
      Seq("qa" -> Seq("scan", "fast"), "qb" -> Seq("merge", "table")), k = 5)
    dropLocalTable("ret_idx")
    dropLocalTable("ret_idx_stats")
    Retrieval.writeIndex(docs, "doc_id", "text", "ret_idx", buckets = 4)
    val viaIndex = Retrieval.searchFromIndex(spark, "ret_idx",
      Seq("qa" -> Seq("scan", "fast"), "qb" -> Seq("merge", "table")), k = 5)
    val a = direct.orderBy("qid", "rank").collect().map(_.toSeq).toSeq
    val b = viaIndex.orderBy("qid", "rank").collect().map(_.toSeq).toSeq
    assert(a == b, s"index path diverged:\n direct=$a\n index =$b")

    // search-time plan never rescans the corpus: only the postings table
    // (term-pruned) and the one-row stats sidecar are read
    val p = viaIndex.queryExecution.executedPlan.toString
    assert(!p.contains("documents.parquet"), p)
    assert(p.contains("ret_idx"), p)
    dropLocalTable("ret_idx")
    dropLocalTable("ret_idx_stats")
  }

  test("incremental index append equals a full rebuild, search-identically") {
    val docs = Tables.documents(spark, sf())
    val old = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val fresh = docs.where(pmod(col("doc_id"), lit(2)) === 1)
    val qs = Seq("qa" -> Seq("scan", "fast"), "qb" -> Seq("merge", "table"))
    for (t <- Seq("ret_full", "ret_incr", "ret_full_stats", "ret_incr_stats"))
      dropLocalTable(t)
    Retrieval.writeIndex(docs, "doc_id", "text", "ret_full", buckets = 4)
    Retrieval.writeIndex(old, "doc_id", "text", "ret_incr", buckets = 4)
    Retrieval.appendToIndex(fresh, "doc_id", "text", "ret_incr", buckets = 4)
    val a = Retrieval.searchFromIndex(spark, "ret_full", qs, k = 5)
      .orderBy("qid", "rank").collect().map(_.toSeq).toSeq
    val b = Retrieval.searchFromIndex(spark, "ret_incr", qs, k = 5)
      .orderBy("qid", "rank").collect().map(_.toSeq).toSeq
    assert(a == b, s"incremental index diverged:\n full=$a\n incr=$b")
    // stats sidecar merged by addition
    val sf1 = spark.table("ret_full_stats").collect()(0)
    val si = spark.table("ret_incr_stats").collect()(0)
    assert(sf1.getLong(0) == si.getLong(0) && sf1.getLong(1) == si.getLong(1))
    for (t <- Seq("ret_full", "ret_incr", "ret_full_stats", "ret_incr_stats"))
      dropLocalTable(t)
  }
}
