package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.SessionStats

/** The native session_window rollup equals the batch sessionize
  * (gap-split) rule per session, and sessions emit only after the
  * watermark closes them. */
class SessionStatsSpec extends SparkSpec {
  import spark.implicits._

  test("closed streaming sessions equal the batch gap-split rollup") {
    // user a: session 1 = three events within 30 min (with a purchase),
    // session 2 = one event 2 h later; user b: one lone event.
    val rows = Seq(
      ("a", "2024-01-01 00:00:00", "click"),
      ("a", "2024-01-01 00:10:00", "purchase"),
      ("a", "2024-01-01 00:25:00", "click"),
      ("a", "2024-01-01 02:30:00", "view"),
      ("b", "2024-01-01 01:00:00", "view"))
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp, String)]
    val df = in.toDF().toDF("user_id", "ts", "event_type")
    val q = SessionStats.sessions(df, "user_id", "ts")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // phase 1: only session 1's events — wm = 00:15 (max − 10 min),
      // before the session's 00:55 close, so nothing may emit
      in.addData(rows.take(3).map { case (u, t, e) => (u, ts(t), e) }: _*)
      q.processAllAvailable()
      assert(spark.table("sess_out").count() === 0L)
      // phase 2: the late events push the wm to 02:20 — session 1 and
      // b's lone session close; a's 02:30 session stays open
      in.addData(rows.drop(3).map { case (u, t, e) => (u, ts(t), e) }: _*)
      q.processAllAvailable()
      assert(spark.table("sess_out").count() === 2L)
      in.addData(("z", ts("2024-01-02 00:00:00"), "view"))
      q.processAllAvailable()

      val got = spark.table("sess_out").where(col("user_id") =!= "z")
        .select("user_id", "n_events", "duration_us", "converted")
        .as[(String, Long, Long, Boolean)].collect().toSet
      assert(got === Set(
        ("a", 3L, 25L * 60 * 1000000, true),
        ("a", 1L, 0L, false),
        ("b", 1L, 0L, false)))

      // batch twin: the wf_sessionize gap rule over the same rows
      val ev = rows.map { case (u, t, e) => (u, ts(t), e) }
        .toDF("user_id", "ts", "event_type")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"))
      val ep = unix_micros(col("ts").cast("timestamp"))
      val batch = ev
        .withColumn("new_sess",
          coalesce(ep - lag(ep, 1).over(w) >= 1800L * 1000000L, lit(false)))
        .withColumn("seq", sum(when(col("new_sess"), 1L).otherwise(0L)).over(w))
        .groupBy("user_id", "seq")
        .agg(count(lit(1)).as("n_events"),
          (max(ep) - min(ep)).as("duration_us"),
          max(col("event_type") === "purchase").as("converted"))
        .select("user_id", "n_events", "duration_us", "converted")
        .as[(String, Long, Long, Boolean)].collect().toSet
      assert(batch === got)
    } finally q.stop()
  }
}
