package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.HeavyHitterStream

/** Misra–Gries laws for the streaming heavy-hitter summary: counts are
  * lower bounds with bracket true ∈ [cnt, cnt+err], state never exceeds
  * m counters, any item above the tracked decrement mass is present,
  * and a skew-free prefix reports exact counts (err = 0). */
class HeavyHitterStreamSpec extends SparkSpec {
  import spark.implicits._

  private val m = 4

  /** Final (item → (cnt, n, err)) per group after streaming `batches`. */
  private def run(name: String, batches: Seq[Seq[(String, String)]])
      : Map[(String, String), (Long, Long, Long)] = {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, String)]
    val q = HeavyHitterStream.perGroup(in.toDF().toDF("g", "item"), "g", "item", m)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      // keep each (g, item)'s LAST emission; drop items whose final
      // summary no longer contains them (superseded emissions linger
      // in the memory sink — resolve by n_total, which only grows)
      val rows = spark.table(name)
        .withColumn("seq", monotonically_increasing_id())
        .orderBy(col("seq"))
        .as[(String, String, Long, Long, Long, Long)].collect()
      val lastN = rows.groupBy(_._1).view.mapValues(_.map(_._4).max).toMap
      rows.filter(r => r._4 == lastN(r._1))
        .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    } finally {
      q.stop(); spark.sql(s"DROP TABLE IF EXISTS $name")
    }
  }

  test("skewed stream: heavy item present with bracketed count, state ≤ m") {
    // group A: item "hot" 30 times, 8 distinct cold items 2 each (N=46);
    // hot's true count exceeds any possible decrement mass, so it MUST
    // survive with 30 ∈ [cnt, cnt+err].
    val hot = Seq.fill(30)(("A", "hot"))
    val cold = (1 to 8).flatMap(i => Seq.fill(2)(("A", s"c$i")))
    val interleaved = (hot ++ cold).zipWithIndex
      .sortBy { case (_, i) => (i * 7919) % 46 }.map(_._1)
    val got = run("hh_skew", interleaved.grouped(9).toSeq)
    val a = got.collect { case ((g, it), v) if g == "A" => it -> v }
    assert(a.size <= m, s"state leaked past m: $a")
    val (cnt, n, err) = a("hot")
    assert(n === 46L)
    assert(cnt <= 30L && cnt + err >= 30L, s"bracket broken: $cnt + $err")
    // every reported count is a lower bound on its true count
    val truth = interleaved.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    a.foreach { case (it, (c, _, e)) =>
      assert(c <= truth(it) && truth(it) <= c + e, s"$it: $c/$e vs ${truth(it)}")
    }
  }

  test("≤ m distinct items: exact counts, zero decrement mass") {
    val data = Seq.fill(5)(("B", "x")) ++ Seq.fill(3)(("B", "y")) ++
      Seq.fill(2)(("B", "z"))
    val got = run("hh_exact", data.grouped(4).toSeq)
    val b = got.collect { case ((g, it), v) if g == "B" => it -> v }
    assert(b("x") === ((5L, 10L, 0L)))
    assert(b("y") === ((3L, 10L, 0L)))
    assert(b("z") === ((2L, 10L, 0L)))
  }

  test("batch split does not change the bracket guarantee") {
    val data = (1 to 60).map(i => ("C", s"i${i % 6}")) ++
      Seq.fill(40)(("C", "big"))
    for (split <- Seq(Seq(data), data.grouped(13).toSeq)) {
      val got = run(s"hh_split${split.size}", split)
      val (cnt, n, err) = got(("C", "big"))
      assert(n === 100L)
      assert(cnt <= 40L && cnt + err >= 40L)
    }
  }
}
