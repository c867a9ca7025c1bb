package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Built-in sources with no Spark analog (SURVEY §2.1).
  *
  * S1 Generator: synthetic load source — `rpu` messages per tick, JSON
  * payload {"id","value","padding"}, round-robin keys key-0..key-{n-1},
  * optional event-time jitter to simulate out-of-order arrival (numaflow
  * `rust/numaflow-core/src/source/generator.rs:52-135`, spec
  * `generator_source.go:23-54`). Implemented over Spark's rate source so
  * backpressure/offsets/recovery come from the engine.
  */
object Generator {

  /** Streaming generator: rows (key, eventTime, value, payload).
    *
    * @param rpu        rows per second (generator rpu/duration collapsed)
    * @param keyCount   round-robin key cardinality
    * @param msgSize    payload padding size (valueBlob analog)
    * @param jitterSecs max event-time jitter in seconds (out-of-orderness)
    */
  def stream(spark: SparkSession, rpu: Int, keyCount: Int,
             msgSize: Int = 8, jitterSecs: Double = 0): DataFrame =
    decorate(spark.readStream.format("rate").option("rowsPerSecond", rpu).load(),
      keyCount, msgSize, jitterSecs)

  /** Batch generator with identical schema (for tests/oracles). */
  def batch(spark: SparkSession, rows: Long, keyCount: Int,
            msgSize: Int = 8, jitterSecs: Double = 0): DataFrame = {
    decorate(spark.range(rows).withColumn("timestamp", current_timestamp())
        .withColumnRenamed("id", "value"),
      keyCount, msgSize, jitterSecs)
  }

  private def decorate(rate: DataFrame, keyCount: Int, msgSize: Int,
                       jitterSecs: Double): DataFrame =
    rate
      .withColumn("key", concat(lit("key-"), pmod(col("value"), lit(keyCount))))
      // jitter subtracts 0..jitter randomly: late-ish, out-of-order events
      .withColumn("eventTime",
        col("timestamp") - make_dt_interval(lit(0), lit(0), lit(0),
          rand(42) * lit(jitterSecs)))
      .withColumn("payload", to_json(struct(
        sha1(col("value").cast("string")).as("id"),
        col("value"),
        rpad(lit(""), msgSize, "x").as("padding"))))
      .select("key", "eventTime", "value", "payload")
}
