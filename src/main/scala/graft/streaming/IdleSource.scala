package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Idle-source watermark advancement (SURVEY WM5/WM6 — flagged hard).
  *
  * Spark's watermark only advances on data; the reference advances it on a
  * timer when a source (or a conditional-forwarding branch) idles
  * (numaflow `pkg/apis/numaflow/v1alpha1/pipeline_types.go:626-665`,
  * `rust/numaflow-core/src/watermark/idle.rs`). Without this, windowed
  * aggregations downstream of a quiet source never close.
  *
  * Technique: union the data stream with a rate-source heartbeat whose
  * rows are tagged `__hb = true` and carry wall-clock event time. The
  * heartbeats pass through `withWatermark` (advancing it) and MUST be
  * filtered out AFTER the watermark assignment and BEFORE aggregation —
  * `dropHeartbeats` — so they never pollute results. Mirrors the
  * reference's WMB control messages, which ride the same buffers but are
  * not data (`message.rs:300-307`).
  */
object IdleSource {

  val HeartbeatCol = "__hb"

  /** Union `data` with heartbeat rows emitted every `stepIntervalSecs`
    * seconds (one rate-source row per step — the reference's
    * `stepInterval`). All data columns are null on heartbeat rows; the
    * event-time column carries the heartbeat's wall-clock timestamp minus
    * `lagSecs` (the reference's idle-advance never outruns real time
    * either; the lag bounds how far heartbeats may run ahead of delayed
    * live data).
    *
    * RESTRICTION — live data only: heartbeat time is wall-clock-derived,
    * so replaying a historical stream through this union would advance the
    * watermark to ~now and drop all real data as late. For replays, drop
    * the heartbeat union entirely (replays are never idle: the watermark
    * advances with the replayed data itself). This mirrors the reference,
    * whose idle-source config is a live-ingest feature
    * (pipeline_types.go:626-665). */
  def withHeartbeats(spark: SparkSession, data: DataFrame, tsCol: String,
                     stepIntervalSecs: Int = 1, lagSecs: Int = 0): DataFrame = {
    val hbRate = spark.readStream.format("rate")
      .option("rowsPerSecond", 1)
      .option("rampUpTime", "0s")
      .load()
    val dataCols = data.schema.fields.map(_.name)
    // rate-source `value` increments once per second at rowsPerSecond=1,
    // so value % step == 0 keeps exactly one heartbeat per step interval.
    val hb = hbRate
      .where(pmod(col("value"), lit(stepIntervalSecs.toLong)) === 0)
      .select(
        dataCols.map {
          case c if c == tsCol =>
            (col("timestamp") - expr(s"INTERVAL $lagSecs SECONDS"))
              .cast(data.schema(tsCol).dataType).as(c)
          case c => lit(null).cast(data.schema(c).dataType).as(c)
        }: _*)
      .withColumn(HeartbeatCol, lit(true))
    data.withColumn(HeartbeatCol, lit(false)).unionByName(hb)
  }

  /** Remove heartbeat rows — call AFTER withWatermark, BEFORE any
    * aggregation. */
  def dropHeartbeats(df: DataFrame): DataFrame =
    df.where(!col(HeartbeatCol)).drop(HeartbeatCol)
}
