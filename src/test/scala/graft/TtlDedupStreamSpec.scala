package graft

import java.time.Duration

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** TTL'd streaming dedup on the Spark 4 transformWithState API: first
  * sighting passes, duplicates inside the TTL drop, a key silent past
  * the TTL is forgotten and passes again — bounded state for unbounded
  * key domains (X2's production form). Requires the RocksDB state store
  * provider (transformWithState's backend).
  *
  * Synchronization: TimeMode.ProcessingTime keeps the engine scheduling
  * micro-batches while idle (that is how TTLs expire), so
  * `processAllAvailable` never quiesces on these queries — the tests
  * poll the sink (the stateful-heartbeat precedent in
  * StreamingReduceSpec). */
class TtlDedupStreamSpec extends SparkSpec {
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

  private def pollUntil(deadlineMs: Long = 30000)(cond: => Boolean): Unit = {
    val end = System.currentTimeMillis() + deadlineMs
    while (!cond && System.currentTimeMillis() < end) Thread.sleep(100)
    assert(cond, "condition not reached within the deadline")
  }

  test("first passes, in-TTL duplicates drop, post-TTL keys pass again") {
    withRocksDb {
      implicit val ctx = spark.sqlContext
      val in = MemoryStream[(String, Long)]
      val out = graft.streaming.TtlDedupStream.dedupByKey(
        in.toDF().toDF("id", "payload"), Seq("id"), Duration.ofSeconds(12))
      val q = out.writeStream.format("memory").queryName("ttl_dedup_out")
        .outputMode("append").start()
      try {
        def got(): Seq[(String, Long)] =
          spark.table("ttl_dedup_out").as[(String, Long)].collect().toSeq.sorted

        // batch 1: a twice + b once -> first a and b pass
        in.addData(("a", 1L), ("a", 2L), ("b", 3L))
        pollUntil()(got().size == 2)
        assert(got() == Seq(("a", 1L), ("b", 3L)))

        // immediately inside the TTL (12s; the store is warm now, the
        // duplicate processes in well under that): a drops
        in.addData(("a", 4L))
        Thread.sleep(2000)
        assert(got() == Seq(("a", 1L), ("b", 3L)))

        // silence past the TTL (the a4 sighting refreshed the clock):
        // a is forgotten, next sighting passes
        Thread.sleep(13500)
        in.addData(("a", 5L))
        pollUntil()(got().size == 3)
        assert(got() == Seq(("a", 1L), ("a", 5L), ("b", 3L)))
      } finally {
        q.stop(); spark.sql("DROP TABLE IF EXISTS ttl_dedup_out")
      }
    }
  }

  test("refresh-on-sighting: a key that keeps arriving keeps being dropped past one TTL") {
    withRocksDb {
      implicit val ctx = spark.sqlContext
      val in = MemoryStream[(String, Long)]
      val out = graft.streaming.TtlDedupStream.dedupByKey(
        in.toDF().toDF("id", "payload"), Seq("id"), Duration.ofSeconds(10))
      val q = out.writeStream.format("memory").queryName("ttl_refresh_out")
        .outputMode("append").start()
      try {
        def got(): Seq[(String, Long)] =
          spark.table("ttl_refresh_out").as[(String, Long)].collect().toSeq
        in.addData(("k", 1L))
        pollUntil()(got().nonEmpty)
        // four sightings ~2s apart (5x slack vs the 10s TTL — CI-pause
        // headroom): total elapsed (~8s+settle) approaches one TTL, but
        // each sighting restarted the clock - all must drop
        for (i <- 2 to 5) {
          Thread.sleep(2000)
          in.addData(("k", i.toLong))
        }
        Thread.sleep(2000) // settle: give the last sighting time to process
        assert(got() == Seq(("k", 1L)),
          s"sliding retention must drop refreshed keys, got ${got()}")
      } finally {
        q.stop(); spark.sql("DROP TABLE IF EXISTS ttl_refresh_out")
      }
    }
  }
}
