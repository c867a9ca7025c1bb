package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.Stats
import graft.streaming.SprtStream

/** Streaming SPRT laws: the live trajectory replays the sequential
  * bucket-fold reference point for point (same µ-nat constants as the
  * batch op), a decided arm goes silent, and the emitted trajectory is
  * invariant to how the input splits into micro-batches. */
class SprtStreamSpec extends SparkSpec {
  import spark.implicits._

  // arm 0: successes only → accept_h1 within a few buckets; arm 1:
  // strict alternation under symmetric hypotheses → never decides.
  // One trial per second, 1-minute buckets, 8 minutes of traffic.
  private val trials: Seq[(Int, Boolean, Timestamp)] =
    (0 until 480).map { i =>
      val arm = i % 2
      val succ = if (arm == 0) true else (i / 2) % 2 == 0
      (arm, succ, ts(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"))
    }

  private def reference: Map[(Int, Long), (Long, Long, Long, String)] = {
    val (l1, l0, up, lo) = Stats.sprtMicroNats(0.4, 0.6, 0.05, 0.20)
    trials.groupBy(_._1).flatMap { case (arm, ts) =>
      val byBucket = ts.groupBy(_._3.getTime / 60000L).toSeq.sortBy(_._1)
      var n = 0L; var s = 0L; var decided = false
      byBucket.flatMap { case (b, rows) =>
        if (decided) None
        else {
          n += rows.size; s += rows.count(_._2)
          val llr = s * l1 + (n - s) * l0
          val dec = if (llr >= up) "accept_h1"
                    else if (llr <= lo) "accept_h0" else "continue"
          decided = dec != "continue"
          Some((arm, b + 1) -> ((n, s, llr, dec))) // bucket END minute
        }
      }
    }
  }

  private def run(batches: Seq[Seq[(Int, Boolean, Timestamp)]])
      : Map[(Int, Long), (Long, Long, Long, String)] = {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Int, Boolean, Timestamp)]
    val name = s"sprt_out_${System.nanoTime()}"
    val q = SprtStream.decisions(in.toDF().toDF("arm", "succ", "t"),
        "arm", "succ", "t", p0 = 0.4, p1 = 0.6, delay = "0 seconds")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      in.addData((9, false, ts("2024-01-02 00:00:00"))) // flush watermark
      q.processAllAvailable()
      spark.table(name)
        .collect().map { r =>
          (r.getAs[Int]("arm"), r.getAs[Timestamp]("bucket").getTime / 60000L) ->
            ((r.getAs[Long]("n"), r.getAs[Long]("s"),
              r.getAs[Long]("llr_u"), r.getAs[String]("decision")))
        }.filter(_._1._1 != 9).toMap
    } finally q.stop()
  }

  test("trajectory replays the sequential bucket fold; decided arm silent") {
    val got = run(Seq(trials))
    val want = reference
    assert(got === want, s"got $got\nwant $want")
    // arm 0 decides and goes silent: its last point is the decision
    val arm0 = got.toSeq.filter(_._1._1 == 0).sortBy(_._1._2)
    assert(arm0.last._2._4 === "accept_h1")
    assert(arm0.init.forall(_._2._4 === "continue"))
    // arm 1 never decides: every point is continue, none missing
    val arm1 = got.toSeq.filter(_._1._1 == 1)
    assert(arm1.nonEmpty && arm1.forall(_._2._4 === "continue"))
  }

  test("batch-split invariance: any micro-batch carve emits the same points") {
    val whole = run(Seq(trials))
    val bySecond = run(trials.grouped(97).toSeq)  // ragged splits
    assert(bySecond === whole)
    val pairSplit = run(Seq(trials.take(240), trials.drop(240)))
    assert(pairSplit === whole)
  }
}
