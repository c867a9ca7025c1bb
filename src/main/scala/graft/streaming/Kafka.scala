package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Kafka source (SURVEY S3) and sink (K3) — the reference's most-used real
  * connector (numaflow `rust/extns/numaflow-kafka/src/source.rs`,
  * `sink.rs`; specs `kafka_source.go` / `kafka_sink.go`; e2e
  * `test/kafka-e2e/`).
  *
  * Spark ships a first-class Kafka connector (`format("kafka")`), so the
  * engine's job is exactly the reference's spec surface: map the source /
  * sink configs onto connector options, and decode/encode between Kafka's
  * wire frame (key/value bytes + topic/partition/offset/timestamp/headers)
  * and the engine's message columns. The decode/encode projections are
  * pure column expressions, so the same code path is exercised in tests by
  * a MemoryStream carrying Kafka-shaped rows — no broker needed; offsets,
  * consumer-group balancing, and exactly-once-to-Kafka come from the
  * connector + checkpoint.
  *
  * NOTE: the connector jar (spark-sql-kafka) is not on this sandbox's
  * classpath; `source`/`sink` are the one-line format wiring and are
  * exercised by plan-construction tests up to provider resolution.
  */
object Kafka {

  /** Source spec (kafka_source.go: brokers, topic, consumerGroup +
    * tuning). `maxOffsetsPerTrigger` is the engine's readBatchSize analog
    * (reference default 500/read — const.go:185). */
  final case class SourceConf(
      brokers: String,
      topics: String,
      consumerGroup: Option[String] = None,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Option[Long] = None,
      includeHeaders: Boolean = true,
      failOnDataLoss: Boolean = false)

  /** Sink spec (kafka_sink.go: brokers, topic). */
  final case class SinkConf(
      brokers: String,
      topic: String,
      checkpointLocation: String)

  /** Spec → connector options (the reconciler's decorate step, done as a
    * pure function so it is unit-testable without a broker). */
  def sourceOptions(c: SourceConf): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> c.brokers,
      "subscribe" -> c.topics,
      "startingOffsets" -> c.startingOffsets,
      "includeHeaders" -> c.includeHeaders.toString,
      "failOnDataLoss" -> c.failOnDataLoss.toString) ++
      c.consumerGroup.map("kafka.group.id" -> _) ++
      c.maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString)

  def sinkOptions(c: SinkConf): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> c.brokers,
      "topic" -> c.topic,
      "checkpointLocation" -> c.checkpointLocation)

  /** Kafka frame → engine message columns: keys = [utf8(key)] (numaflow
    * uses the Kafka key as the message key — source.rs), value stays
    * opaque bytes, eventTime = broker timestamp (a source transformer
    * reassigns it when the payload carries the real event time — T1),
    * headers to map<string,string>, (partition, offset) retained as the
    * ack/dedup identity. */
  def decode(raw: DataFrame): DataFrame =
    raw.select(
      when(col("key").isNull, array().cast("array<string>"))
        .otherwise(array(col("key").cast("string"))).as("keys"),
      col("value"),
      col("timestamp").as("eventTime"),
      coalesce(
        map_from_entries(transform(col("headers"),
          h => struct(h.getField("key"), h.getField("value").cast("string")))),
        map().cast("map<string,string>")).as("headers"),
      col("topic"), col("partition"), col("offset"))

  /** Engine columns → Kafka producer frame (key/value binary). */
  def encode(df: DataFrame, keyCol: String, valueCol: String): DataFrame =
    df.select(
      col(keyCol).cast("string").cast("binary").as("key"),
      col(valueCol).cast("binary").as("value"))

  /** Streaming read wired through the connector (requires the
    * spark-sql-kafka jar on the classpath at runtime). */
  def source(spark: SparkSession, c: SourceConf): DataFrame =
    decode(spark.readStream.format("kafka").options(sourceOptions(c)).load())

  /** Kafka source with idle-watermark heartbeats (reference
    * `pipeline_types.go:626-665`: a quiet source must not stall windowed
    * reduces downstream). Built-in connectors can't be wrapped in
    * [[IdleSource.IdleHeartbeatSource]] (that decorator is for GraftSource
    * SPI implementations), so the built-in path uses the rate-heartbeat
    * UNION (SURVEY §7.2): one wall-clock tick row per `stepIntervalSecs`
    * rides the same stream through `withWatermark`, keeping the source's
    * watermark moving while every topic partition is silent.
    *
    * NOTE on granularity: Spark's watermark is per-SOURCE (max observed
    * event time minus delay), not per-partition like the reference's — a
    * single silent partition of an otherwise active topic never stalls a
    * Spark watermark, so one untagged tick per step is exactly enough;
    * per-partition heartbeat keys would add rows without changing the
    * watermark math. What DOES stall is a wholly idle source, or an idle
    * branch under the min-of-sources fan-in policy — both covered by this
    * union (IdleSourceUnionSpec proves the fan-in case end to end).
    *
    * Usage: assign the watermark on `eventTime` downstream, then call
    * [[IdleSource.dropHeartbeats]](df, "eventTime") BEFORE any
    * aggregation (the helper's predicate is pushdown-pinned above the
    * watermark). Live ingest only — replays advance their own watermark
    * (see [[IdleSource.withHeartbeats]]'s restriction); for a
    * replay-safe variant use [[sourceWithReplaySafeIdleWm]]. */
  def sourceWithIdleWm(spark: SparkSession, c: SourceConf,
                       stepIntervalSecs: Int = 1, lagSecs: Int = 0): DataFrame =
    IdleSource.withHeartbeats(spark, source(spark, c), "eventTime",
      stepIntervalSecs, lagSecs)

  /** Kafka source with REPLAY-SAFE idle-watermark heartbeats — lifts
    * [[sourceWithIdleWm]]'s live-ingest restriction: heartbeat event
    * times derive from the PERSISTED per-partition max event time (the
    * [[IdleSource.IdleHeartbeatSource]] technique, realized for the
    * built-in connector via keyed state —
    * [[IdleSource.withStatefulHeartbeats]] keyed on the Kafka
    * `partition` column), advanced `incrementByMs` per `stepIntervalMs`
    * of idleness past `thresholdMs`. A fully idle topic still advances
    * the watermark (the max survives in the state store), and a replay
    * advances from replayed event times, never wall-clock. Same usage
    * contract: watermark downstream, [[IdleSource.dropHeartbeats]]
    * before aggregation. */
  def sourceWithReplaySafeIdleWm(spark: SparkSession, c: SourceConf,
      thresholdMs: Long = 10000L, stepIntervalMs: Long = 1000L,
      incrementByMs: Long = 1000L): DataFrame =
    IdleSource.withStatefulHeartbeats(source(spark, c), "eventTime",
      Seq("partition"), thresholdMs, stepIntervalMs, incrementByMs)

  /** Streaming write wired through the connector. */
  def sink(df: DataFrame, c: SinkConf, keyCol: String, valueCol: String): DataStreamWriter[Row] =
    encode(df, keyCol, valueCol).writeStream.format("kafka").options(sinkOptions(c))
}
