package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.TemporalJoin

/** Event-time temporal join: every emitted fact carries the dimension
  * version in force at its event time (the batch backward-as-of
  * semantics), under any batch split and with dimension versions
  * arriving AFTER the facts they govern; facts before any version emit
  * null; every watermark-passed fact is emitted exactly once. Rows
  * older than the watermark allowance are dropped BEFORE the stateful
  * op (standard Spark lateness semantics) — the allowance, not the
  * operator, is the lateness contract. */
class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  private val dims: Seq[(String, Timestamp, String)] = Seq(
    ("a", ts("2024-01-01 00:00:00"), "v1"),
    ("a", ts("2024-01-01 01:30:00"), "v2"),
    ("c", ts("2024-01-01 05:00:00"), "w1"))

  private val facts: Seq[(String, Timestamp, Double)] = Seq(
    ("a", ts("2024-01-01 00:30:00"), 1.0),  // v1
    ("a", ts("2024-01-01 01:30:00"), 2.0),  // tie → the version AT its ts
    ("a", ts("2024-01-01 02:00:00"), 3.0),  // v2
    ("a", ts("2024-01-01 00:10:00"), 4.0),  // late arrival, still v1
    ("b", ts("2024-01-01 03:00:00"), 5.0),  // keyed dim never exists → null
    ("c", ts("2024-01-01 04:00:00"), 6.0))  // before c's first version → null

  /** Sequential reference: backward as-of per fact over ALL versions. */
  private val reference: Set[(String, Timestamp, Double, Option[String])] =
    facts.map { case (k, t, v) =>
      (k, t, v, dims.filter(d => d._1 == k && !d._2.after(t))
        .sortBy(_._2.getTime).lastOption.map(_._3))
    }.toSet

  private def run(factBatches: Seq[Seq[(String, Timestamp, Double)]],
                  dimBatches: Seq[Seq[(String, Timestamp, String)]])
      : Seq[(String, Timestamp, Double, Option[String])] = {
    implicit val ctx = spark.sqlContext
    val fIn = MemoryStream[(String, Timestamp, Double)]
    val dIn = MemoryStream[(String, Timestamp, String)]
    val q = TemporalJoin.enrich(
        fIn.toDF().toDF("k", "t", "fv"), dIn.toDF().toDF("k", "t", "dv"),
        "k", "t", "fv", "dv", delay = "6 hours")
      .writeStream.format("memory").queryName("tj_out")
      .outputMode("append").start()
    try {
      val n = math.max(factBatches.length, dimBatches.length)
      for (i <- 0 until n) {
        dimBatches.lift(i).foreach(b => if (b.nonEmpty) dIn.addData(b: _*))
        factBatches.lift(i).foreach(b => if (b.nonEmpty) fIn.addData(b: _*))
        q.processAllAvailable()
      }
      // push both sides' watermarks past every fact so the tail drains
      fIn.addData(("__flush", ts("2024-01-02 00:00:00"), 0.0))
      dIn.addData(("__flush", ts("2024-01-02 00:00:00"), "x"))
      q.processAllAvailable()
      fIn.addData(("__flush2", ts("2024-01-03 00:00:00"), 0.0))
      dIn.addData(("__flush2", ts("2024-01-03 00:00:00"), "x"))
      q.processAllAvailable()
      spark.table("tj_out")
        .where(!col("k").startsWith("__flush"))
        .as[(String, Timestamp, Double, Option[String])].collect().toSeq
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS tj_out")
    }
  }

  test("enrichment equals the batch as-of reference; one emission per fact") {
    val got = run(Seq(facts), Seq(dims))
    assert(got.length === reference.size) // exactly once
    assert(got.toSet === reference)
  }

  test("dimension versions arriving after their facts still govern them") {
    // facts land first; the versions that should enrich them arrive two
    // batches later, inside the lateness allowance
    val got = run(
      Seq(facts.take(4), Nil, facts.drop(4)),
      Seq(Nil, Nil, dims))
    assert(got.toSet === reference)
  }

  test("arbitrary batch splits converge to the same rows") {
    val got = run(facts.grouped(2).toSeq, dims.grouped(1).toSeq)
    assert(got.toSet === reference)
  }

  test("idleTtlMs drops an idle key's retained version; default keeps it") {
    // key "a" settles one version, then sits idle well past the TTL; a
    // fact arriving after the lease expires enriches to null under TTL
    // and to the version under the default (permanent retention).
    def run(ttl: Option[Long]): Option[String] = {
      implicit val ctx = spark.sqlContext
      val fIn = MemoryStream[(String, Timestamp, Double)]
      val dIn = MemoryStream[(String, Timestamp, String)]
      val q = TemporalJoin.enrich(
          fIn.toDF().toDF("k", "t", "fv"), dIn.toDF().toDF("k", "t", "dv"),
          "k", "t", "fv", "dv", delay = "6 hours", idleTtlMs = ttl)
        .writeStream.format("memory").queryName("tj_ttl")
        .outputMode("append").start()
      try {
        dIn.addData(("a", ts("2024-01-01 00:00:00"), "v1"))
        fIn.addData(("__f1", ts("2024-01-02 00:00:00"), 0.0))
        dIn.addData(("__f1", ts("2024-01-02 00:00:00"), "x"))
        q.processAllAvailable() // wm 01-01 18:00; "a" idle, lease wm+1h
        fIn.addData(("__f2", ts("2024-01-03 00:00:00"), 0.0))
        dIn.addData(("__f2", ts("2024-01-03 00:00:00"), "x"))
        q.processAllAvailable() // wm 01-02 18:00 — past the lease
        fIn.addData(("a", ts("2024-01-02 20:00:00"), 9.0))
        fIn.addData(("__f3", ts("2024-01-04 00:00:00"), 0.0))
        dIn.addData(("__f3", ts("2024-01-04 00:00:00"), "x"))
        q.processAllAvailable()
        fIn.addData(("__f4", ts("2024-01-05 00:00:00"), 0.0))
        dIn.addData(("__f4", ts("2024-01-05 00:00:00"), "x"))
        q.processAllAvailable()
        val rows = spark.table("tj_ttl").where(col("k") === "a")
          .as[(String, Timestamp, Double, Option[String])].collect()
        assert(rows.length == 1)
        rows.head._4
      } finally {
        q.stop(); spark.sql("DROP TABLE IF EXISTS tj_ttl")
      }
    }
    assert(run(Some(3600L * 1000)) === None) // lease expired → null dim
    assert(run(None) === Some("v1"))         // default: version retained
  }

  test("maxStalenessMs nulls versions older than the bound at emit") {
    // the staleness-bounded batch reference (join_asof_tol semantics):
    // the backward match counts only within the bound, else null
    def refWithBound(boundMs: Long) = facts.map { case (k, t, v) =>
      (k, t, v, dims.filter(d => d._1 == k && !d._2.after(t))
        .sortBy(_._2.getTime).lastOption
        .filter(d => t.getTime - d._2.getTime <= boundMs).map(_._3))
    }.toSet
    implicit val ctx = spark.sqlContext
    val bound = 30L * 60 * 1000 // 30 min: fact 3.0 (v2 is 30 min old)
    val fIn = MemoryStream[(String, Timestamp, Double)]
    val dIn = MemoryStream[(String, Timestamp, String)]
    val q = TemporalJoin.enrich(
        fIn.toDF().toDF("k", "t", "fv"), dIn.toDF().toDF("k", "t", "dv"),
        "k", "t", "fv", "dv", delay = "6 hours",
        maxStalenessMs = Some(bound))
      .writeStream.format("memory").queryName("tj_stale")
      .outputMode("append").start()
    try {
      dIn.addData(dims: _*); fIn.addData(facts: _*)
      q.processAllAvailable()
      fIn.addData(("__flush", ts("2024-01-02 00:00:00"), 0.0))
      dIn.addData(("__flush", ts("2024-01-02 00:00:00"), "x"))
      q.processAllAvailable()
      fIn.addData(("__flush2", ts("2024-01-03 00:00:00"), 0.0))
      dIn.addData(("__flush2", ts("2024-01-03 00:00:00"), "x"))
      q.processAllAvailable()
      val got = spark.table("tj_stale")
        .where(!col("k").startsWith("__flush"))
        .as[(String, Timestamp, Double, Option[String])].collect().toSet
      assert(got === refWithBound(bound))
      // the bound actually bit somewhere: fact 1.0 sits exactly AT the
      // 30-min edge (inclusive → kept), 4.0 is 10 min fresh (kept),
      // 2.0/3.0 are 0/30 min (kept) — shrink to 5 min and 1.0/3.0 drop
      assert(got.exists(r => r._3 == 1.0 && r._4 == Some("v1")))
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS tj_stale")
    }
  }

  test("maxStalenessMs = 5 min drops the 30-min-old matches") {
    implicit val ctx = spark.sqlContext
    val fIn = MemoryStream[(String, Timestamp, Double)]
    val dIn = MemoryStream[(String, Timestamp, String)]
    val q = TemporalJoin.enrich(
        fIn.toDF().toDF("k", "t", "fv"), dIn.toDF().toDF("k", "t", "dv"),
        "k", "t", "fv", "dv", delay = "6 hours",
        maxStalenessMs = Some(5L * 60 * 1000))
      .writeStream.format("memory").queryName("tj_stale5")
      .outputMode("append").start()
    try {
      dIn.addData(dims: _*); fIn.addData(facts: _*)
      q.processAllAvailable()
      fIn.addData(("__flush", ts("2024-01-02 00:00:00"), 0.0))
      dIn.addData(("__flush", ts("2024-01-02 00:00:00"), "x"))
      q.processAllAvailable()
      fIn.addData(("__flush2", ts("2024-01-03 00:00:00"), 0.0))
      dIn.addData(("__flush2", ts("2024-01-03 00:00:00"), "x"))
      q.processAllAvailable()
      val byVal = spark.table("tj_stale5")
        .where(!col("k").startsWith("__flush"))
        .as[(String, Timestamp, Double, Option[String])].collect()
        .map(r => r._3 -> r._4).toMap
      assert(byVal(1.0) === None)        // v1 is 30 min old → stale
      assert(byVal(2.0) === Some("v2"))  // version AT the fact ts → fresh
      assert(byVal(3.0) === None)        // v2 is 30 min old → stale
      assert(byVal(4.0) === None)        // v1 is 10 min old → stale at 5
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS tj_stale5")
    }
  }

  test("seeded random shuffles and splits all converge (3 trials)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val fs = rnd.shuffle(facts)
      val ds = rnd.shuffle(dims)
      val fSplit = fs.grouped(1 + rnd.nextInt(3)).toSeq
      val dSplit = ds.grouped(1 + rnd.nextInt(2)).toSeq
      val got = run(fSplit, dSplit)
      assert(got.toSet === reference, s"trial $trial: $fSplit / $dSplit")
    }
  }
}
