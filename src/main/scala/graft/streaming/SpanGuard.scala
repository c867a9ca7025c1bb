package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Ingest-time contamination guard: every ARRIVING doc is checked for
  * verbatim w-token span overlap against the settled corpus's persisted
  * artifacts ([[graft.ops.Dedup.writeSpanTable]]) — the streaming twin of
  * `Dedup.bloomIncrementalSpansFromTable`, extending the reference's
  * ingest-time exact-id dedup (X2, windowed `MessageID` dedup at the ISB
  * write) to substring-level contamination.
  *
  * Same scale posture as the batch form: the bloom sidecar loads once
  * and broadcasts; the probe runs map-side inside codegen on each
  * micro-batch, so a clean stream never shuffles its span universe; the
  * settled table joins stream-static with no exchange on the settled
  * side. Cross-batch repeats of a pair collapse via
  * `dropDuplicatesWithinWatermark` — state is bounded by the watermark
  * horizon, exactly the X2 contract.
  */
object SpanGuard {

  /** @param stream streaming frame with (idCol: long, textCol, tsCol);
    *               MUST already carry `withWatermark(tsCol, …)`
    * @return streaming (new_id, old_id) collision pairs, append mode */
  def collisions(stream: DataFrame, table: String, bloomPath: String,
                 idCol: String, textCol: String, tsCol: String,
                 w: Int = 15): DataFrame = {
    val spark = stream.sparkSession
    val bc = spark.sparkContext.broadcast(Dedup.readBloom(bloomPath))
    stream
      .select(col(idCol).as("new_id"), col(tsCol),
        explode(Dedup.shingleArray(col(textCol), w)).as("shingle"))
      .where(graft.functions.BloomProbe(xxhash64(col("shingle")), bc))
      .join(spark.table(table), "shingle") // stream-static: settled never moves
      .select(col("new_id"), col("old_id"), col(tsCol))
      .dropDuplicatesWithinWatermark("new_id", "old_id")
      .select("new_id", "old_id")
  }

  /** `foreachBatch` sink running the full admission loop per micro-batch
    * ([[graft.ops.Dedup.admitCrawl]]): detect collisions against the
    * artifacts, hand them to `onCollisions` (DLQ, metrics, a delta of
    * rejected ids — caller's choice), and extend table + sidecar with the
    * clean docs so the NEXT micro-batch collides against them too. The
    * streaming form of the recurring-crawl production loop. */
  def admitSink(table: String, bloomPath: String, idCol: String,
                textCol: String, w: Int = 15,
                expectedSpans: Long = 4L << 20, fpp: Double = 0.01,
                onCollisions: DataFrame => Unit = _ => ())
      : (DataFrame, Long) => Unit = (batch, batchId) => {
    // foreachBatch is at-least-once: a marker next to the sidecar skips
    // batches the artifacts already absorbed, so a checkpoint-replayed
    // batch is not re-reported (and not re-admitted). A crash BETWEEN
    // extension and marker write replays once into admitCrawl, whose
    // self-pair filter keeps the replay benign (duplicate span rows,
    // never a false rejection).
    val marker = new java.io.File(bloomPath + ".batchid")
    val last =
      if (marker.exists) java.nio.file.Files.readString(marker.toPath).trim.toLong
      else -1L
    if (batchId > last) {
      val collisions = Dedup.admitCrawl(batch.sparkSession, table, bloomPath,
        batch, idCol, textCol, w, expectedSpans, fpp)
      try onCollisions(collisions) finally collisions.unpersist()
      java.nio.file.Files.writeString(marker.toPath, batchId.toString)
      ()
    }
  }
}
