package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Event-time temporal join (Flink's "temporal table join" semantics,
  * re-expressed on Spark state): enrich a fact stream against a
  * versioned dimension CHANGE stream so every fact sees the dimension
  * version in force AT ITS EVENT TIME — not the latest version at
  * processing time, which is what a naive stream-static join against a
  * refreshed snapshot gives and which silently rewrites history under
  * replay or lag (the price-at-order-time vs price-now bug).
  *
  * Correctness needs buffering, not cleverness: a fact at t may only be
  * emitted once no dimension version with ts ≤ t can still arrive —
  * i.e. once the shared watermark passes t. Both streams union into one
  * event-timed flow (their watermark is therefore the MIN of the two
  * sides, the R3 fan-in rule), keyed state holds the pending facts and
  * the version history, and an event-time timeout flushes a key when
  * the watermark advances past its oldest pending fact even if no new
  * row arrives for it.
  *
  * State bounds: pending facts drain at the watermark, and versions
  * older than the newest one ≤ watermark are pruned (no future fact can
  * need them). The one retained current-version row is PERMANENT per
  * key by default — a key that ever carried a version keeps ~one row
  * forever, so state grows with lifetime key cardinality (fine for
  * bounded dimension domains, not for UUID-keyed churn). For high-churn
  * key domains pass `idleTtlMs`: a key with no pending facts is dropped
  * once the watermark sits `idleTtlMs` past its last emit/arrival — the
  * trade being that a fact arriving for that key later (but still
  * inside the watermark delay) enriches to dim = null instead of the
  * expired version. Facts with no version emit dim = null either way
  * (the caller's routing decision — dropping them would hide a late
  * dimension feed).
  *
  * Stream ≡ batch: once the watermark passes every fact, the emitted
  * rows equal the batch backward as-of join (`join_asof` semantics,
  * version ts ≤ fact ts, latest wins) — TemporalJoinSpec proves it
  * against a sequential reference under batch splits and late
  * dimension arrivals.
  */
object TemporalJoin {

  /** (version history (tsMs, dimVal) sorted, pending facts (tsMs, factVal)). */
  private type TJState = (List[(Long, String)], List[(Long, Double)])

  /** @param maxStalenessMs staleness bound on the matched version (the
    *   feature-store freshness contract, the streaming twin of the batch
    *   `join_asof_tol` query): a fact enriches to dim = null when the
    *   version in force at its event time is OLDER than this — serving
    *   would fall back to a default rather than a stale feature, so the
    *   training join must too. Compared in exact integer millis at emit
    *   time; retention is unchanged (a stale CURRENT version still
    *   serves a later fact that lands within the bound of a NEWER
    *   version, so it cannot be pruned earlier). */
  def enrich(facts: DataFrame, dims: DataFrame, keyCol: String,
             tsCol: String, factValCol: String, dimValCol: String,
             delay: String = "10 minutes",
             idleTtlMs: Option[Long] = None,
             maxStalenessMs: Option[Long] = None): DataFrame = {
    require(idleTtlMs.forall(_ > 0), "idleTtlMs must be positive")
    require(maxStalenessMs.forall(_ >= 0), "maxStalenessMs must be >= 0")
    val spark = facts.sparkSession
    import spark.implicits._
    val unioned = facts
      .select(col(keyCol).cast("string").as("k"), col(tsCol).as("ts"),
        col(factValCol).cast("double").as("fv"),
        lit(null).cast("string").as("dv"))
      .unionAll(dims.select(col(keyCol).cast("string"), col(tsCol),
        lit(null).cast("double"), col(dimValCol).cast("string")))
      .withWatermark("ts", delay)
      .as[(String, Timestamp, Option[Double], Option[String])]
    unioned.groupByKey(_._1)
      .flatMapGroupsWithState[TJState,
        (String, Timestamp, Double, Option[String])](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (k, rows, state) =>
          val (verSt, pendSt) = state.getOption.getOrElse((Nil, Nil))
          var vers = verSt
          var pend = pendSt
          rows.foreach {
            case (_, ts, Some(fv), _) => pend = (ts.getTime, fv) :: pend
            case (_, ts, _, Some(dv)) => vers = (ts.getTime, dv) :: vers
            case _ => ()
          }
          // distinct makes replayed dimension deliveries no-ops; facts
          // keep multiplicity (two identical facts are two facts)
          vers = vers.distinct.sortBy(identity)
          pend = pend.sorted
          val wm = state.getCurrentWatermarkMs()
          val (ready, waiting) = pend.partition(_._1 <= wm)
          val out = ready.map { case (ft, fv) =>
            (k, new Timestamp(ft), fv,
              vers.takeWhile(_._1 <= ft).lastOption
                .filter { case (vt, _) =>
                  maxStalenessMs.forall(ft - vt <= _) }
                .map(_._2))
          }
          // prune: newest version ≤ wm stays (it is the current value);
          // everything older can never be read again
          val settled = vers.takeWhile(_._1 <= wm)
          val kept =
            if (settled.isEmpty) vers
            else settled.last :: vers.drop(settled.length)
          // idle expiry: this invocation is a TTL timeout fire (no new
          // rows), nothing was emitted and nothing pends — the state was
          // held only for the current version, and its lease is up
          val idleExpired = state.hasTimedOut && idleTtlMs.isDefined &&
            out.isEmpty && waiting.isEmpty
          if ((kept.isEmpty && waiting.isEmpty) || idleExpired) state.remove()
          else {
            state.update((kept, waiting))
            // re-fire this key when the watermark passes its oldest
            // pending fact (must be strictly above the current wm);
            // with no pending fact, lease the current version for the
            // idle TTL (activity before then overwrites the timeout)
            waiting.headOption match {
              case Some((t, _)) =>
                state.setTimeoutTimestamp(math.max(t, wm + 1))
              case None =>
                idleTtlMs.foreach(ttl => state.setTimeoutTimestamp(wm + ttl))
            }
          }
          out.iterator
      }
      .toDF(keyCol, tsCol, factValCol, dimValCol)
  }
}
