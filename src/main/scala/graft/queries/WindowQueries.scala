package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.{Tables, Windows}

/** Batch analogs of the reduce windows (SURVEY §2.5 W1/W2/W3/W5), driving
  * graft.ops.Windows. Money-ish doubles are summed as DECIMAL(18,2) and
  * emitted as DOUBLE for bit-stable parity (see RelationalQueries). */
object WindowQueries extends QueryPack {

  private def sumDec(c: String) =
    sum(col(c).cast(DecimalType(18, 2))).cast("double").as("sum_value")

  val queries: Map[String, Q] = Map(

    // W1: keyed tumbling window (fixed 1h), the reference's core reduce.
    "w1_fixed" -> { (s, dir) =>
      Windows.fixed(Tables.events(s, dir), "ts", "1 hour",
        Seq("event_type"), Seq(count(lit(1)).as("n"), sumDec("value")))
    },

    // W5: non-keyed (global) tumbling window — keyed:false in GroupBy spec.
    "w5_global" -> { (s, dir) =>
      Windows.fixed(Tables.events(s, dir), "ts", "1 day",
        Seq.empty, Seq(count(lit(1)).as("n"), sumDec("value")))
    },

    // W2: sliding window 1h length / 30m slide (each row in 2 windows).
    "w2_sliding" -> { (s, dir) =>
      Windows.sliding(Tables.events(s, dir), "ts", "1 hour", "30 minutes",
        Seq("event_type"), Seq(count(lit(1)).as("n")))
    },

    // W3: session window, 10m inactivity gap, keyed by user.
    "w3_session" -> { (s, dir) =>
      Windows.session(Tables.events(s, dir), "ts", "10 minutes",
        Seq("user_id"), Seq(count(lit(1)).as("n"), sumDec("value")))
    }
  )

  val oracles: Map[String, String] = Map(
    "w1_fixed" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  time_bucket(INTERVAL '1 hour', ts) AS w_start,
        |  time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR AS w_end
        |FROM events
        |GROUP BY event_type, time_bucket(INTERVAL '1 hour', ts)""".stripMargin,
    "w5_global" ->
      """SELECT count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  time_bucket(INTERVAL '1 day', ts) AS w_start,
        |  time_bucket(INTERVAL '1 day', ts) + INTERVAL 1 DAY AS w_end
        |FROM events
        |GROUP BY time_bucket(INTERVAL '1 day', ts)""".stripMargin,
    "w2_sliding" ->
      """WITH expanded AS (
        |  SELECT e.event_type, e.ts,
        |    time_bucket(INTERVAL '30 minutes', e.ts) - (o.off * INTERVAL '30 minutes') AS w_start
        |  FROM events e, (VALUES (0),(1)) o(off))
        |SELECT event_type, count(*) AS n, w_start,
        |  w_start + INTERVAL 1 HOUR AS w_end
        |FROM expanded
        |WHERE ts >= w_start AND ts < w_start + INTERVAL '1 hour'
        |GROUP BY event_type, w_start""".stripMargin,
    "w3_session" ->
      """WITH g AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts - lag(ts) OVER w >= INTERVAL '10 minutes' THEN 1 ELSE 0 END AS news
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT *, sum(news) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g)
        |SELECT user_id, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  min(ts) AS session_start
        |FROM s GROUP BY user_id, sid""".stripMargin
  )
}
