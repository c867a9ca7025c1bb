package graft

import java.sql.Timestamp

/** Laws for ev_lifecycle: the growth-accounting identity
  * (active = new + retained + resurrected), churn charged to the
  * calendar week it happened, resurrection distinguished from
  * retention across a gap, and the quick ratio. */
class LifecycleSpec extends SparkSpec {
  import spark.implicits._

  // week starts (Mondays): 2024-01-01, -08, -15
  private def at(day: String) = Timestamp.valueOf(s"2024-01-$day 10:00:00")

  test("planted lifecycle: classification, churn week, quick ratio") {
    // u1: wk1+wk2 (retained in wk2); u2: wk1 only (churns in wk2);
    // u3: wk1+wk3 (resurrected in wk3); u4: wk2+wk3 (new in wk2,
    // retained in wk3)
    val rows = Seq(
      (1L, at("01"), 1L), (2L, at("08"), 1L),
      (3L, at("02"), 2L),
      (4L, at("03"), 3L), (5L, at("16"), 3L),
      (6L, at("09"), 4L), (7L, at("15"), 4L)
    ).map { case (eid, ts, u) => (eid, ts, u, "view", 1.0, "{}") }
    val dir = java.nio.file.Files.createTempDirectory("lifecycle").toString
    try {
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      val byWk = SparkEntry.queries("ev_lifecycle")(spark, dir)
        .collect().map(r => r.getAs[java.sql.Date]("wk").toString -> r).toMap
      val w1 = byWk("2024-01-01")
      assert(w1.getAs[Long]("active") === 3L)
      assert(w1.getAs[Long]("n_new") === 3L)
      assert(w1.isNullAt(w1.fieldIndex("churned"))) // no prior week
      val w2 = byWk("2024-01-08")
      assert(w2.getAs[Long]("active") === 2L)
      assert(w2.getAs[Long]("n_new") === 1L)        // u4
      assert(w2.getAs[Long]("n_retained") === 1L)   // u1
      assert(w2.getAs[Long]("n_resurrected") === 0L)
      assert(w2.getAs[Long]("churned") === 2L)      // u2, u3 went missing
      assert(w2.getAs[Double]("quick_ratio") === 0.5) // (1+0)/2
      val w3 = byWk("2024-01-15")
      assert(w3.getAs[Long]("active") === 2L)
      assert(w3.getAs[Long]("n_retained") === 1L)   // u4
      assert(w3.getAs[Long]("n_resurrected") === 1L) // u3 (gap week)
      assert(w3.getAs[Long]("churned") === 1L)      // u1
      assert(w3.getAs[Double]("quick_ratio") === 1.0) // (0+1)/1
      // the accounting identity holds every week
      byWk.values.foreach { r =>
        assert(r.getAs[Long]("active") === r.getAs[Long]("n_new") +
          r.getAs[Long]("n_retained") + r.getAs[Long]("n_resurrected"))
      }
    } finally rmdirAll(new java.io.File(dir))
  }
}
