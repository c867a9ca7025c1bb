package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._

import graft.ops.Sidecar

/** The sidecar cache's three contracts: build-once sharing, transparent
  * rebuild when checkpoint blocks die (executor loss on a cluster —
  * simulated here by unpersisting the checkpoint RDD), and eviction
  * (clearSession forgets a session's entries so mutated inputs or a
  * finished session never serve stale blocks). */
class SidecarSpec extends SparkSpec {
  import spark.implicits._

  private def buildDf() = (1 to 100).toDF("x")
    .groupBy((col("x") % 7).as("k")).agg(sum(col("x")).as("s"))

  test("second consumer reads the materialized block, not a rebuild") {
    Sidecar.clearSession(spark)
    val builds = new AtomicInteger(0)
    def build = { builds.incrementAndGet(); buildDf() }
    val a = Sidecar.cached(spark, "spec_share")(build)
    val rows = a.collect().sortBy(_.getInt(0))
    val b = Sidecar.cached(spark, "spec_share")(build)
    assert(builds.get() == 1, "second access must not rebuild")
    assert(b.collect().sortBy(_.getInt(0)).toSeq == rows.toSeq)
  }

  test("a dead checkpoint block triggers a transparent rebuild with identical results") {
    Sidecar.clearSession(spark)
    val builds = new AtomicInteger(0)
    def build = { builds.incrementAndGet(); buildDf() }
    val a = Sidecar.cached(spark, "spec_rebuild")(build)
    val rows = a.collect().sortBy(_.getInt(0)).toSeq
    // kill the blocks the way executor loss would: the checkpoint RDD's
    // cached partitions vanish from the block manager
    val rdd = a.queryExecution.analyzed
      .collectFirst { case l: LogicalRDD => l.rdd }
      .getOrElse(fail("cached entry must be a localCheckpoint plan"))
    rdd.unpersist(blocking = true)
    val b = Sidecar.cached(spark, "spec_rebuild")(build)
    assert(builds.get() == 2, "dead blocks must rebuild, not serve a dead plan")
    assert(b.collect().sortBy(_.getInt(0)).toSeq == rows)
    // and the rebuilt entry is itself cached
    Sidecar.cached(spark, "spec_rebuild")(build).collect()
    assert(builds.get() == 2)
  }

  test("clearSession evicts; the next access rebuilds") {
    Sidecar.clearSession(spark)
    val builds = new AtomicInteger(0)
    def build = { builds.incrementAndGet(); buildDf() }
    Sidecar.cached(spark, "spec_evict")(build).collect()
    Sidecar.clearSession(spark)
    Sidecar.cached(spark, "spec_evict")(build).collect()
    assert(builds.get() == 2)
  }

  test("session churn is bounded: the LRU evicts the least-recently-used session") {
    Sidecar.clear()
    val builds = new AtomicInteger(0)
    def build = { builds.incrementAndGet(); buildDf() }
    val first = spark.newSession()
    Sidecar.cached(first, "spec_lru")(build).collect()
    assert(builds.get() == 1)
    // MaxSessions fresh sessions push `first` out of the LRU
    (1 to Sidecar.MaxSessions).foreach { _ =>
      Sidecar.cached(spark.newSession(), "spec_lru")(build).collect()
    }
    Sidecar.cached(first, "spec_lru")(build).collect()
    assert(builds.get() == Sidecar.MaxSessions + 2,
      "evicted session must rebuild — churn cannot pin blocks forever")
  }

  test("disabled mode bypasses the cache but still checkpoints") {
    Sidecar.clearSession(spark)
    val builds = new AtomicInteger(0)
    def build = { builds.incrementAndGet(); buildDf() }
    Sidecar.enabled = false
    try {
      val a = Sidecar.cached(spark, "spec_off")(build)
      Sidecar.cached(spark, "spec_off")(build)
      assert(builds.get() == 2, "disabled cache must not share")
      assert(a.queryExecution.analyzed
        .collectFirst { case l: LogicalRDD => l }.nonEmpty,
        "disabled mode must still checkpoint (multi-consumer reuse)")
    } finally Sidecar.enabled = true
  }
}
