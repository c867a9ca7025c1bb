package graft

import graft.ops.TimeSeries

/** Laws for the Granger-causality kernel (ts_granger): a planted x→y
  * lead must score a large F in the causal direction and a small one in
  * reverse; singular designs (constant series) must yield nulls, never
  * a division error; and the closed-form RSS must match a direct OLS
  * residual computation on the same series. */
class GrangerSpec extends SparkSpec {
  import spark.implicits._

  /** Build events so the hourly count of key k at hour h is counts(h). */
  private def series(key: String, counts: Seq[Int]) =
    counts.zipWithIndex.flatMap { case (n, h) =>
      Seq.fill(n)((key, ts(f"2024-01-01 ${h}%02d:00:00"), 1.0))
    }

  test("a planted lag-1 lead is detected in the causal direction only") {
    // x is a jumpy deterministic series; y tracks x shifted one hour
    // plus a small alternating perturbation (a perfect copy would make
    // the unrestricted RSS float-zero and the F-ratio guard-null) —
    // x_{t-1} predicts y_t almost perfectly, y's own lag does not.
    val x = Seq(3, 9, 2, 8, 1, 7, 4, 6, 5, 10, 2, 9, 3, 8)
    val y = x.indices.map(t => (if (t == 0) 5 else x(t - 1)) + t % 2)
    val df = (series("x", x) ++ series("y", y)).toDF("k", "ts", "value")
    val out = TimeSeries.granger(df, "k", "ts").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val fwd = out(("x", "y"))
    val rev = out(("y", "x"))
    assert(fwd.getAs[Double]("rss_u") < fwd.getAs[Double]("rss_r") / 10.0)
    assert(fwd.getAs[Double]("f_granger") > 50.0)
    // reverse: y's past says little about x beyond x's own history
    assert(rev.getAs[Double]("f_granger") <
      fwd.getAs[Double]("f_granger") / 10.0)
  }

  test("closed-form RSS matches a direct least-squares fit") {
    val x = Seq(2, 5, 3, 7, 4, 6, 8, 1, 9, 5, 4, 7)
    val y = Seq(4, 3, 6, 4, 8, 5, 7, 9, 2, 8, 6, 5)
    val df = (series("x", x) ++ series("y", y)).toDF("k", "ts", "value")
    val row = TimeSeries.granger(df, "k", "ts").collect()
      .find(r => r.getString(0) == "x" && r.getString(1) == "y").get
    // direct OLS on (1, y_{t-1}, x_{t-1}) -> y_t via normal equations
    val rows = (1 until y.length).map(t => (y(t).toDouble, y(t - 1).toDouble, x(t - 1).toDouble))
    def solve3(a: Array[Array[Double]], v: Array[Double]): Array[Double] = {
      // Gaussian elimination, partial pivot — small and exact enough here
      val m = a.map(_.clone) :+ Array(0.0, 0.0, 0.0)
      val b = v.clone
      for (i <- 0 until 3) {
        val p = (i until 3).maxBy(r => math.abs(m(r)(i)))
        val tmp = m(i); m(i) = m(p); m(p) = tmp
        val tb = b(i); b(i) = b(p); b(p) = tb
        for (r <- i + 1 until 3) {
          val fct = m(r)(i) / m(i)(i)
          for (c2 <- i until 3) m(r)(c2) -= fct * m(i)(c2)
          b(r) -= fct * b(i)
        }
      }
      val out = new Array[Double](3)
      for (i <- 2 to 0 by -1) {
        var s = b(i)
        for (c2 <- i + 1 until 3) s -= m(i)(c2) * out(c2)
        out(i) = s / m(i)(i)
      }
      out
    }
    val n = rows.length.toDouble
    val (sy, syl, sxl) = (rows.map(_._1).sum, rows.map(_._2).sum, rows.map(_._3).sum)
    val a = Array(
      Array(n, syl, sxl),
      Array(syl, rows.map(r => r._2 * r._2).sum, rows.map(r => r._2 * r._3).sum),
      Array(sxl, rows.map(r => r._2 * r._3).sum, rows.map(r => r._3 * r._3).sum))
    val v = Array(sy, rows.map(r => r._1 * r._2).sum, rows.map(r => r._1 * r._3).sum)
    val beta = solve3(a, v)
    val rssDirect = rows.map { case (yy, yl, xl) =>
      val e = yy - (beta(0) + beta(1) * yl + beta(2) * xl); e * e
    }.sum
    assert(math.abs(row.getAs[Double]("rss_u") - rssDirect) < 1e-4,
      s"closed-form ${row.getAs[Double]("rss_u")} vs direct $rssDirect")
  }

  test("a constant series makes the design singular and yields nulls") {
    val df = (series("c", Seq.fill(8)(4)) ++ series("y", Seq(1, 5, 2, 7, 3, 8, 4, 6)))
      .toDF("k", "ts", "value")
    val row = TimeSeries.granger(df, "k", "ts").collect()
      .find(r => r.getString(0) == "c" && r.getString(1) == "y").get
    assert(row.isNullAt(row.fieldIndex("rss_u")))
    assert(row.isNullAt(row.fieldIndex("f_granger")))
  }
}
