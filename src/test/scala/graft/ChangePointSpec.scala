package graft

import org.apache.spark.sql.functions._
import graft.ops.TimeSeries

/** Edge laws for the offline change-point (ts_changepoint) and the
  * round-12-continuation stat queries' kernels — the oracle hash proves
  * engine parity on the real tables; these pin the SEMANTICS the hash
  * can't see (brute-force equivalence, tie direction, degenerate keys,
  * the value-domain trim identity). */
class ChangePointSpec extends SparkSpec {
  import spark.implicits._

  private def series(key: String, counts: Seq[Int]) =
    counts.zipWithIndex.flatMap { case (n, h) =>
      Seq.fill(n)((key, ts(f"2024-01-01 ${h}%02d:00:00"), 1.0))
    }

  test("changePoint matches the brute-force SSE-gain argmax on a known series") {
    // level shift after hour 3: [2,2,2, 8,8,8,8]
    val counts = Seq(2, 2, 2, 8, 8, 8, 8)
    val df = series("a", counts).toDF("k", "ts", "value")
    val row = TimeSeries.changePoint(df, "k", "ts").collect().head
    // brute force over all boundaries
    val total = counts.sum.toDouble
    val gains = (1 until counts.length).map { t =>
      val sl = counts.take(t).sum.toDouble
      val sr = total - sl
      (t, sl * sl / t + sr * sr / (counts.length - t) -
        total * total / counts.length)
    }
    val (bestT, bestGain) = gains.maxBy(_._2)
    assert(row.getAs[Long]("t_split") === bestT.toLong)
    assert(bestT === 3) // the true boundary
    assert(math.abs(row.getAs[Double]("gain") - bestGain) < 1e-6)
    assert(row.getAs[Double]("mean_before") === 2.0)
    assert(row.getAs[Double]("mean_after") === 8.0)
  }

  test("changePoint ties break on the EARLIER boundary") {
    // perfectly flat series: every boundary has gain 0 — t_split must be 1
    val df = series("flat", Seq(4, 4, 4, 4)).toDF("k", "ts", "value")
    val row = TimeSeries.changePoint(df, "k", "ts").collect().head
    assert(row.getAs[Long]("t_split") === 1L)
    assert(row.getAs[Double]("gain") === 0.0)
  }

  test("a single-bucket key has no interior boundary and drops out") {
    val df = (series("one", Seq(5)) ++ series("two", Seq(1, 9)))
      .toDF("k", "ts", "value")
    val out = TimeSeries.changePoint(df, "k", "ts")
    assert(out.select("k").as[String].collect().toSet === Set("two"))
  }

  test("changePoint fills silent hours with zeros (the resample grid rule)") {
    // activity at hours 0 and 3 only: the series is [5,0,0,5]; the best
    // split of a symmetric series is the flat-tie rule over equal gains
    val df = (series("g", Seq(5)) ++
      Seq(("g", ts("2024-01-01 03:00:00"), 1.0),
          ("g", ts("2024-01-01 03:10:00"), 1.0),
          ("g", ts("2024-01-01 03:20:00"), 1.0),
          ("g", ts("2024-01-01 03:30:00"), 1.0),
          ("g", ts("2024-01-01 03:40:00"), 1.0))).toDF("k", "ts", "value")
    val row = TimeSeries.changePoint(df, "k", "ts").collect().head
    assert(row.getAs[Long]("n_hours") === 4L) // gap hours 1,2 are present
  }

  test("value-domain trim multiplicity identity: kept counts equal the row-rank trim") {
    // mixed ties straddling both trim boundaries
    val xs = Seq(1, 1, 1, 2, 3, 3, 4, 5, 5, 5, 6, 7, 7, 8, 9, 9, 9, 9, 10, 11)
    val n = xs.length; val k = n / 10 // = 2 per tail
    val sorted = xs.sorted
    val keptRows = sorted.slice(k, n - k) // the row-rank definition
    // the value-domain formula used by stat_trimmed
    val byValue = xs.groupBy(identity).view.mapValues(_.size).toSeq.sortBy(_._1)
    var cum = 0L
    val keptSum = byValue.map { case (x, c) =>
      cum += c
      val kept = math.max(0L, math.min(cum, (n - k).toLong) -
        math.max(cum - c, k.toLong))
      x * kept
    }.sum
    assert(keptSum === keptRows.sum.toLong)
    assert(byValue.map { case (_, c) => c }.sum === n)
  }

  test("stat_trimmed plan: no row-level sort — the window runs on the post-agg value table") {
    val q = graft.queries.EventQueries.queries("stat_trimmed")(spark, sf())
    val plan = q.queryExecution.optimizedPlan.toString
    // the Window must sit ABOVE an Aggregate (the (type, cents) collapse),
    // never directly over the scan: a row-rank regression would put the
    // Sort/Window on raw events
    val winIdx = plan.indexOf("Window")
    val aggIdx = plan.indexOf("Aggregate", winIdx)
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"expected Window over Aggregate in:\n$plan")
    assert(q.collect().nonEmpty)
  }
}
