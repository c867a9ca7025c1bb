package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming per-group reservoir: maintain, per group, the
  * min(k, |group|)-row deterministic sample that
  * [[graft.ops.CorpusOps.samplePerGroup]] would draw from everything
  * seen so far — the ingest-time "representative examples per source"
  * feed (dashboards, spot-check queues, eval-set candidates).
  *
  * The selection rule (k smallest md5-of-id) makes the state a MONOTONE
  * min-k lattice over the SET of seen ids: order of arrival, batch
  * boundaries, duplicate deliveries, and checkpoint replays all
  * converge to the same reservoir — a true random reservoir can't say
  * that (its state depends on arrival order, so an at-least-once replay
  * draws a different sample). Exactly the determinism-beats-randomness
  * argument of the batch samplers, carried to streams.
  *
  * State per group is k (hash, id) pairs, nothing more; a group emits
  * only when its reservoir actually changes (update mode), so a settled
  * group costs nothing downstream.
  */
object StreamingReservoir {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Output rows: (group, sample: Seq[id-as-string]) — the group's full
    * current reservoir, re-emitted on change. The id travels as its
    * STRING rendering (`cast("string")`, exactly what the batch twin
    * CorpusOps.samplePerGroup feeds md5) — a `cast("long")` here would
    * null out non-numeric ids and re-render '007' as '7', drawing a
    * different sample than batch. */
  def perGroup(stream: DataFrame, groupCol: String, idCol: String,
               k: Int): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(col(groupCol).cast("string"), col(idCol).cast("string"))
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[(String, String)], (String, Seq[String])](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (g, rows, state) =>
          val cur = state.getOption.getOrElse(Nil)
          // merge = min-k of the union: the lattice join. distinct makes
          // duplicate deliveries no-ops; (md5, id) ordering matches the
          // batch sampler's rank exactly (ties on md5 imply equal ids).
          val merged = (cur ++ rows.map { case (_, id) =>
            (md5hex(id), id) }).distinct.sorted.take(k)
          if (merged == cur) Iterator.empty
          else {
            state.update(merged)
            Iterator.single((g, merged.map(_._2)))
          }
      }
      .toDF(groupCol, "sample")
  }
}
