package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream ≡ batch for the online feature snapshots: an in-order feed
  * through FeatureStream must produce exactly the batch
  * ev_feature_snapshot fold (the same sequential replay
  * FeatureSnapshotSpec pins the batch query to), including intra-batch
  * reordering of one user's rows (the processor sorts by event time)
  * and state carried across micro-batches. */
class FeatureStreamSpec extends SparkSpec {
  import spark.implicits._

  private def withRocksDb[A](f: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f
    finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  // (event_id, ts, user_id, event_type, value)
  private type Ev = (Long, java.sql.Timestamp, Long, String, Double)

  private def t(m: Int) = ts(f"2024-01-01 00:$m%02d:00")

  test("snapshots equal the sequential fold; state survives batch boundaries") {
    withRocksDb {
      implicit val ctx = spark.sqlContext
      val in = MemoryStream[Ev]
      val out = graft.streaming.FeatureStream.snapshots(
        in.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"))
      val q = out.writeStream.format("memory").queryName("feat_out")
        .outputMode("append").start()
      try {
        // batch 1: user 7's first purchase arrives FIRST in the batch but
        // is LATER in event time than the click — the sort must apply the
        // click before it. User 9 interleaves.
        in.addData(
          (104L, t(4), 7L, "purchase", 12.50),
          (101L, t(1), 7L, "click", 0.0),
          (102L, t(2), 9L, "view", 0.0),
          (103L, t(3), 7L, "view", 0.0))
        q.processAllAvailable()
        val b1 = spark.table("feat_out")
          .as[(Long, Long, Long, Long, Long, Long, Long, Option[Long])]
          .collect().toSet
        // purchase 104: 2 events before (click+view), 1 click, 1 view,
        // no spend yet, prev event at minute 3 -> 60s = 6e7 micros
        assert(b1 == Set((104L, 7L, 2L, 1L, 1L, 0L, 0L, Some(60000000L))))

        // batch 2: second purchase sees batch-1 history (incl. the first
        // purchase's own spend), proving cross-batch state
        in.addData(
          (105L, t(6), 7L, "error", 0.0),
          (106L, t(8), 7L, "purchase", 5.25),
          (107L, t(9), 9L, "purchase", 1.00))
        q.processAllAvailable()
        val b2 = spark.table("feat_out")
          .as[(Long, Long, Long, Long, Long, Long, Long, Option[Long])]
          .collect().toSet -- b1
        assert(b2 == Set(
          // user 7: 4 events before, 1 click, 1 view, 1 error, 1250c
          (106L, 7L, 4L, 1L, 1L, 1L, 1250L, Some(120000000L)),
          // user 9: one view before, no spend, prev at minute 2
          (107L, 9L, 1L, 0L, 1L, 0L, 0L, Some(420000000L))))

        // the emitted snapshots must equal the BATCH query's fold over
        // the same rows (stream ≡ batch under an in-order feed)
        val all = Seq(
          (101L, t(1), 7L, "click", 0.0), (102L, t(2), 9L, "view", 0.0),
          (103L, t(3), 7L, "view", 0.0), (104L, t(4), 7L, "purchase", 12.50),
          (105L, t(6), 7L, "error", 0.0), (106L, t(8), 7L, "purchase", 5.25),
          (107L, t(9), 9L, "purchase", 1.00))
        val replay = all.groupBy(_._3).toSeq.flatMap { case (u, evs) =>
          var (n, c, v, e, sp) = (0L, 0L, 0L, 0L, 0L)
          var last: Option[Long] = None
          evs.sortBy(x => (x._2.getTime, x._1)).flatMap { case (id, tts, _, typ, value) =>
            val us = tts.getTime * 1000L
            val snap = if (typ == "purchase")
              Some((id, u, n, c, v, e, sp, last.map(us - _))) else None
            n += 1
            if (typ == "click") c += 1
            if (typ == "view") v += 1
            if (typ == "error") e += 1
            if (typ == "purchase") sp += math.round(value * 100)
            last = Some(us)
            snap
          }
        }.toSet
        assert((b1 ++ b2) == replay)
      } finally {
        q.stop(); spark.sql("DROP TABLE IF EXISTS feat_out")
      }
    }
  }
}
