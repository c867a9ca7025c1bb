package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Tables

/** Event-stream analytics over the `events` table — the query patterns a
  * numaflow-style event pipeline feeds downstream (funnels, cohorts).
  * Both are ordinary shuffle-on-user_id aggregations: user_id is the
  * high-cardinality natural key, so the shape holds at any scale (no
  * skew, map-side partial aggregation throughout; the step joins are
  * per-user and AQE-broadcastable when a step's survivor set is small).
  */
object EventQueries extends QueryPack {

  val queries: Map[String, Q] = Map(

    // 3-step ordered funnel view -> click -> purchase: each step's
    // timestamp must follow the previous step's FIRST occurrence.
    // Output: one row per user who entered the funnel, with the number
    // of steps completed (1..3).
    "ev_funnel" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val v = ev.where(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val c = ev.where(col("event_type") === "click")
        .join(v, "user_id").where(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val p = ev.where(col("event_type") === "purchase")
        .join(c, "user_id").where(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      v.join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select(col("user_id"),
          (lit(1L) + when(col("t2").isNotNull, 1L).otherwise(0L)
            + when(col("t3").isNotNull, 1L).otherwise(0L)).as("steps"))
    },

    // weekly cohort retention: users bucketed by first-seen week; count
    // distinct active users per (cohort week, week offset).
    "ev_cohort" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val first = ev.groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).as("cohort_ts"))
      val act = ev.select(col("user_id"),
        date_trunc("week", col("ts")).as("wk")).distinct()
      first.join(act, "user_id")
        .groupBy(col("cohort_ts").cast("date").as("cohort_week"),
          (datediff(col("wk"), col("cohort_ts")) / lit(7)).cast("long")
            .as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    }
  )

  val oracles: Map[String, String] = Map(
    "ev_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id)
        |      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
        |SELECT v.user_id,
        |  CAST(1 + (CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
        |         + (CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS steps
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |       LEFT JOIN p ON v.user_id = p.user_id""".stripMargin,
    "ev_cohort" ->
      """WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort_ts
        |           FROM events GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events)
        |SELECT CAST(cohort_ts AS DATE) AS cohort_week,
        |  CAST(date_diff('day', cohort_ts, wk) / 7 AS BIGINT) AS week_offset,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM f JOIN a USING (user_id)
        |GROUP BY 1, 2""".stripMargin
  )
}
