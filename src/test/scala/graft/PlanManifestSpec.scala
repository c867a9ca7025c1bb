package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Structural guard for the committed plan-fingerprint manifest (r14
  * verdict #3): silent plan regressions must surface as a git diff of
  * PLANS_rN.json, not as cross-round timing archaeology. This spec
  * asserts (a) the newest committed manifest covers exactly the query
  * registry, and (b) it is FRESH — recomputing the fingerprint of every
  * sentinel query (the MicroBench set: TPC-H analogs + the heaviest
  * registry entries + the known sweep movers) reproduces the committed
  * hash. A failure names the stale queries and the regeneration command.
  */
class PlanManifestSpec extends AnyFunSuite {

  test("newest committed PLANS_r*.json covers the registry and is fresh " +
      "for the sentinel subset") {
    PlanAudit.newestManifest() match {
      case None =>
        fail("no PLANS_r*.json committed — generate one with " +
          "`runMain graft.PlanAudit --fingerprint <round>`")
      case Some((round, manifest)) =>
        val registry = SparkEntry.queries.keySet
        val missing = registry -- manifest.keySet
        val extra = manifest.keySet -- registry
        assert(missing.isEmpty && extra.isEmpty,
          s"PLANS_r$round.json out of sync with the registry — " +
            s"missing: ${missing.toSeq.sorted.mkString(",")} " +
            s"extra: ${extra.toSeq.sorted.mkString(",")} — regenerate " +
            s"with `runMain graft.PlanAudit --fingerprint $round`")

        // fingerprintSession applies its runtime confs to the shared
        // test session; snapshot and restore the two confs no other
        // suite re-pins in its own builder
        val prior = SparkSession.getActiveSession
          .orElse(SparkSession.getDefaultSession)
        val saved = prior.map { s =>
          Seq("spark.sql.adaptive.enabled",
            "spark.sql.optimizer.windowGroupLimitThreshold",
            "spark.sql.maxMetadataStringLength")
            .map(k => k -> s.conf.getOption(k))
        }
        val spark = PlanAudit.fingerprintSession()
        try {
          val sentinels = MicroBench.Sentinels
          val unknown = sentinels.filterNot(registry.contains)
          assert(unknown.isEmpty,
            s"MicroBench.Sentinels names unknown queries: ${unknown.mkString(",")}")
          assert(sentinels.distinct.size == sentinels.size,
            "MicroBench.Sentinels contains duplicates: " +
              sentinels.diff(sentinels.distinct).distinct.mkString(","))
          val stale = sentinels.filter { n =>
            PlanAudit.fingerprint(spark, n, PlanAudit.FingerprintSf) != manifest(n)
          }
          assert(stale.isEmpty,
            s"PLANS_r$round.json is STALE for: ${stale.mkString(", ")} — " +
              s"the plan changed since the manifest was generated; rerun " +
              s"`runMain graft.PlanAudit --fingerprint <round>` and commit " +
              s"the diff (that diff IS the plan-change acknowledgment)")
        } finally saved.foreach { kvs =>
          kvs.foreach {
            case (k, Some(v)) => spark.conf.set(k, v)
            case (k, None) => spark.conf.unset(k)
          }
        }
    }
  }
}
