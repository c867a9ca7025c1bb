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
    // rate-source `value` increments once per second at rowsPerSecond=1,
    // so value % step == 0 keeps exactly one heartbeat per step interval.
    val ticks = hbRate
      .where(pmod(col("value"), lit(stepIntervalSecs.toLong)) === 0)
      .select((col("timestamp") - expr(s"INTERVAL $lagSecs SECONDS")).as(tsCol))
    withHeartbeatStream(data, ticks, tsCol)
  }

  /** Core of the union mechanism with an INJECTABLE tick stream:
    * `heartbeats` is any streaming DataFrame with a single column named
    * `tsCol` (timestamps to advance the watermark to). Production paths
    * use the rate-source wrapper above; deterministic tests drive a
    * MemoryStream of timestamps. Tick rows get every data column nulled
    * and `__hb = true`. */
  def withHeartbeatStream(data: DataFrame, heartbeats: DataFrame,
                          tsCol: String): DataFrame = {
    val dataCols = data.schema.fields.map(_.name)
    val hb = heartbeats.select(
      dataCols.map {
        case c if c == tsCol => col(tsCol).cast(data.schema(tsCol).dataType).as(c)
        case c => lit(null).cast(data.schema(c).dataType).as(c)
      }: _*)
      .withColumn(HeartbeatCol, lit(true))
    data.withColumn(HeartbeatCol, lit(false)).unionByName(hb)
  }

  /** Remove heartbeat rows — call AFTER withWatermark, BEFORE any
    * aggregation.
    *
    * Same PUSHDOWN TRAP as [[dropHeartbeatRecords]]: a bare `!__hb`
    * predicate references nothing the EventTimeWatermark node produces,
    * so PushPredicateThroughNonJoin moves it BELOW the watermark — the
    * heartbeat rows then die before their event times reach the
    * watermark's max-event-time stats and the mechanism silently does
    * nothing. The predicate therefore references `tsCol` through an
    * epoch lower bound the optimizer cannot prove away (vacuously true
    * for any wall-clock or data-derived heartbeat time), pinning the
    * filter above the watermark assignment. */
  def dropHeartbeats(df: DataFrame, tsCol: String): DataFrame =
    df.where(!(col(HeartbeatCol)
        && col(tsCol) >= lit("1900-01-01").cast("timestamp")))
      .drop(HeartbeatCol)

  /** Remove heartbeat RECORDS injected by [[IdleHeartbeatSource]] from a
    * UdSource stream (same placement rule: after withWatermark).
    *
    * PUSHDOWN TRAP: a plain `headers['__hb'] != 'true'` predicate does not
    * reference the event-time column, so PushPredicateThroughNonJoin moves
    * it BELOW the EventTimeWatermark node — heartbeats then die before the
    * watermark collects their event-time stats and the watermark never
    * advances (silently defeating the whole mechanism). The predicate must
    * therefore (a) reference `tsCol` and (b) resist simplification: a
    * plain `ts IS NOT NULL` conjunct gets folded away because
    * InferFiltersFromConstraints already proves it, re-freeing the
    * heartbeat conjunct to push. The epoch lower bound below is
    * unprovable to the optimizer, vacuously true for any real event time
    * (heartbeat times derive from data times), and keeps the whole
    * disjunction pinned above the watermark. */
  def dropHeartbeatRecords(df: DataFrame, tsCol: String = "eventTime"): DataFrame =
    df.where(!(coalesce(col("headers").getItem(HeartbeatCol), lit("")) === "true"
      && col(tsCol) >= lit("1900-01-01").cast("timestamp")))

  /** Replay-safe idle heartbeats for BUILT-IN sources (Kafka, rate,
    * socket — anything that is not a [[UdSource.GraftSource]] and so
    * cannot be wrapped in [[IdleHeartbeatSource]]): the same
    * threshold/step/incrementBy contract (`pipeline_types.go:626-665`),
    * realized as a keyed stateful pass-through. Each key (use the Kafka
    * `partition` column — parallelism stays >= #partitions, state is ONE
    * long per key) persists the max event time it has served in the
    * state store; when a key sees no data for `thresholdMs`, a
    * processing-time timeout emits one heartbeat row every
    * `stepIntervalMs` whose event time is the PERSISTED max advanced by
    * `incrementByMs` per step — data-derived, so a replay advances the
    * watermark from replayed times (never to wall-clock now), and a
    * FULLY idle topic still advances because the max survives in state
    * across batches (processing-time timeouts keep empty batches
    * firing). This lifts [[withHeartbeats]]'s live-ingest restriction.
    *
    * Heartbeat rows have every data column null except `tsCol` and carry
    * `__hb = true`; assign the watermark downstream, then
    * [[dropHeartbeats]] before aggregation (same pushdown trap). A key
    * that has never produced data emits no heartbeats (no event time to
    * advance from — the reference's rule).
    *
    * Cost at scale: ONE extra hash exchange on the key columns (the
    * union technique is exchange-free) — the price of replay safety on
    * a connector whose offsets Spark owns.
    *
    * Operational note: processing-time timeouts make the engine keep
    * scheduling micro-batches while idle (that is the mechanism), so
    * `StreamingQuery.processAllAvailable()` never quiesces on such a
    * query — await results by polling the sink (tests) or listener
    * progress (production). */
  def withStatefulHeartbeats(data: DataFrame, tsCol: String,
      keyCols: Seq[String], thresholdMs: Long, stepIntervalMs: Long,
      incrementByMs: Long): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.types.BooleanType
    require(keyCols.nonEmpty, "keyCols must name at least one column")
    // thresholdMs feeds setTimeoutDuration, which rejects 0 at runtime
    require(incrementByMs > 0 && stepIntervalMs > 0 && thresholdMs > 0,
      "threshold/step/incrementBy must be positive")
    val schema = data.schema
    // heartbeat rows null every data column, so the output schema must
    // relax the input's nullability (tuple-encoded test streams carry
    // non-nullable primitives)
    val outSchema = org.apache.spark.sql.types.StructType(
      schema.fields.map(_.copy(nullable = true)))
      .add(HeartbeatCol, BooleanType, nullable = false)
    val tsIdx = schema.fieldIndex(tsCol)
    val keyIdxs = keyCols.map(schema.fieldIndex)
    val n = schema.length
    data.groupByKey(r =>
        keyIdxs.map(i => String.valueOf(r.get(i))).mkString("\u0000"))(
        Encoders.STRING)
      .flatMapGroupsWithState[Long, Row](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (_: String, rows: Iterator[Row], state:
            org.apache.spark.sql.streaming.GroupState[Long]) =>
          if (state.hasTimedOut) {
            // idle fire: heartbeat from the PERSISTED max, advanced one
            // step; re-arm so a still-idle key keeps stepping
            val t = state.get + incrementByMs
            state.update(t)
            state.setTimeoutDuration(stepIntervalMs)
            val vals = Array.fill[Any](n + 1)(null)
            vals(tsIdx) = new java.sql.Timestamp(t)
            vals(n) = true
            Iterator.single(Row.fromSeq(vals.toIndexedSeq))
          } else {
            val buf = rows.toVector
            val maxTs = buf.iterator
              .map(_.getAs[java.sql.Timestamp](tsIdx))
              .filter(_ != null).map(_.getTime)
              .foldLeft(state.getOption.getOrElse(Long.MinValue))(math.max)
            if (maxTs != Long.MinValue) {
              state.update(maxTs)
              state.setTimeoutDuration(thresholdMs)
            }
            buf.iterator.map(r => Row.fromSeq(r.toSeq :+ false))
          }
      }(Encoders.scalaLong, Encoders.row(outSchema))
  }

  /** Replay-safe idle watermark advancement, done where the reference does
    * it — AT THE SOURCE (`pipeline_types.go:626-665`: threshold /
    * stepInterval / incrementBy). Wraps any [[UdSource.GraftSource]]; when
    * a partition has served no new data for `thresholdMs`, the decorator
    * injects one heartbeat record every `stepIntervalMs` whose event time
    * is max(observed data event time) + incrementByMs — DATA-derived, so
    * replaying a historical stream advances the watermark from the
    * replayed times, never to wall-clock now (the flaw of the rate-source
    * union above, which remains the option for plain built-in sources).
    * Heartbeats carry header `__hb=true` and empty payload; filter with
    * [[dropHeartbeatRecords]] after watermark assignment.
    *
    * A partition that has never produced data emits no heartbeats (there
    * is no event-time to advance from — matches the reference, which
    * publishes no idle WM before the first watermark exists).
    *
    * Outer offsets are segment-mapped over inner offsets: data segments
    * pass through (offsets rewritten to the outer space), heartbeat
    * segments occupy one outer offset and never reach the inner source's
    * ack — checkpoint/replay reproduces the exact interleaving because
    * segments only ever append. `clock` is injectable for deterministic
    * tests. */
  private sealed trait Seg { def len: Long }
  private final case class DataSeg(innerFrom: Long, innerUntil: Long) extends Seg {
    def len: Long = innerUntil - innerFrom
  }
  private final case class HbSeg(rec: UdSource.SourceRecord) extends Seg {
    def len: Long = 1L
  }

  final class IdleHeartbeatSource(inner: UdSource.GraftSource,
      thresholdMs: Long, stepIntervalMs: Long, incrementByMs: Long,
      clock: () => Long = System.currentTimeMillis)
      extends UdSource.GraftSource {
    import java.sql.Timestamp
    import scala.collection.mutable
    import UdSource.SourceRecord

    private val segs = mutable.Map.empty[Int, mutable.ArrayBuffer[Seg]]
    private val lastData = mutable.Map.empty[Int, Long] // wall ms of last data advance
    private val lastHb = mutable.Map.empty[Int, Long]   // wall ms of last heartbeat
    private val maxSeen = mutable.Map.empty[Int, Long]  // max event-time ms served

    override def partitions: Seq[Int] = inner.partitions

    override def latestOffset(p: Int): Long = synchronized {
      val ss = segs.getOrElseUpdate(p, mutable.ArrayBuffer.empty)
      val covered = ss.collect { case d: DataSeg => d.innerUntil }.lastOption.getOrElse(0L)
      val innerLat = inner.latestOffset(p)
      val now = clock()
      if (innerLat > covered) {
        ss += DataSeg(covered, innerLat)
        lastData(p) = now
      } else if (maxSeen.contains(p) &&
          now - lastData.getOrElse(p, now) >= thresholdMs &&
          now - lastHb.getOrElse(p, 0L) >= stepIntervalMs) {
        val t = maxSeen(p) + incrementByMs
        maxSeen(p) = t // consecutive heartbeats keep the watermark flowing
        val outerOff = ss.map(_.len).sum
        ss += HbSeg(SourceRecord(outerOff, p, keys = Seq.empty,
          value = Array.emptyByteArray, eventTime = new Timestamp(t),
          headers = Map(HeartbeatCol -> "true")))
        lastHb(p) = now
      }
      ss.map(_.len).sum
    }

    override def read(p: Int, from: Long, until: Long): Iterator[SourceRecord] =
      synchronized {
        val ss = segs.getOrElse(p, mutable.ArrayBuffer.empty)
        var outer = 0L
        val out = mutable.ArrayBuffer.empty[SourceRecord]
        ss.foreach { s =>
          val lo = math.max(from, outer)
          val hi = math.min(until, outer + s.len)
          if (hi > lo) s match {
            case DataSeg(f, _) =>
              inner.read(p, f + (lo - outer), f + (hi - outer)).foreach { r =>
                maxSeen(p) = math.max(maxSeen.getOrElse(p, Long.MinValue),
                  r.eventTime.getTime)
                out += r.copy(offset = outer + (r.offset - f))
              }
            case HbSeg(rec) => out += rec
          }
          outer += s.len
        }
        out.iterator
      }

    override def ack(p: Int, upTo: Long): Unit = {
      val innerAck = synchronized {
        val ss = segs.getOrElse(p, mutable.ArrayBuffer.empty)
        var outer = 0L
        var acked = 0L
        ss.foreach { s =>
          s match {
            case DataSeg(f, u) =>
              if (upTo >= outer + s.len) acked = u
              else if (upTo > outer) acked = f + (upTo - outer)
            case _ => ()
          }
          outer += s.len
        }
        acked
      }
      inner.ack(p, innerAck)
    }

    /** Heartbeats are not backlog. */
    override def pending: Long = inner.pending
  }
}
