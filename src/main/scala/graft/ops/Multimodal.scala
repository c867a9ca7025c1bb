package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / frame-
  * sample stages.
  *
  * The Spark-side shape is real and tested — schema, partitioning, batch
  * iteration — but the actual media decoding is STUBBED (no codec
  * libraries in this container): `decodeFeatures` derives a deterministic
  * fake feature vector from the bytes. Swapping in a real decoder changes
  * only the function body marked below; the pipeline plumbing (binary
  * column in, fixed-width float vector out, per-partition batching to
  * amortize decoder init) is exactly what a real decoder needs.
  */
object Multimodal {

  /** Typed media record: opaque payload + metadata, the engine's analog of
    * the reference's opaque `value: Bytes` + headers/metadata groups. */
  final case class MediaRecord(id: Long, media: Array[Byte], mime: String,
                               source: String, n_bytes: Long)
  final case class MediaFeatures(id: Long, n_bytes: Long, features: Array[Float])

  /** Pack a text corpus into media records (the test stand-in for reading
    * real image/audio bytes; a production job would read binaryFile or
    * parquet-with-binary directly). */
  def pack(docs: DataFrame, idCol: String, payloadCol: String): DataFrame =
    docs.select(
      col(idCol).as("id"),
      to_binary(col(payloadCol), lit("utf-8")).as("media"),
      lit("text/plain").as("mime"),
      col("source"),
      length(col(payloadCol)).cast("long").as("n_bytes"))

  /** Decode + feature-extract over partition-batched records.
    *
    * STUB DECODER: features = [n_bytes, first_byte, last_byte, byte_sum %
    * 1009] — deterministic so tests and oracles can verify the plumbing.
    * A real implementation replaces `fakeDecode` with the codec call and
    * keeps everything else (this is also where a per-partition decoder
    * handle would be initialized once and reused).
    */
  def decodeFeatures(media: Dataset[Row])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // real decoder init would go here, once per partition
      it.map { rec =>
        MediaFeatures(rec.id, rec.n_bytes, fakeDecode(rec.media))
      }
    }
  }

  /** STUB for the codec: deterministic features from raw bytes. */
  private def fakeDecode(bytes: Array[Byte]): Array[Float] = {
    val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
    Array(
      bytes.length.toFloat,
      if (bytes.nonEmpty) (bytes(0) & 0xff).toFloat else 0f,
      if (bytes.nonEmpty) (bytes(bytes.length - 1) & 0xff).toFloat else 0f,
      (sum % 1009).toFloat)
  }

  /** One resized record: id + fixed-length resampled payload. */
  final case class Resized(id: Long, resized: Array[Byte])

  /** Resize/resample stage: nearest-neighbor byte resampling to a fixed
    * `outLen` (index i ← byte ⌊i·len/outLen⌋). STUB for a real image
    * resize — a codec-backed implementation replaces the sampling body and
    * keeps the per-partition batching (decoder handles init once per
    * partition, same seam as decodeFeatures). */
  def resample(media: Dataset[Row], outLen: Int)(implicit spark: SparkSession): Dataset[Resized] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // real resize library init would go here, once per partition
      it.map { rec =>
        val len = rec.media.length
        val out =
          if (len == 0) Array.empty[Byte]
          else Array.tabulate(outLen)(i => rec.media((i.toLong * len / outLen).toInt))
        Resized(rec.id, out)
      }
    }
  }

  /** Frame sampling: slice the payload into `n` fixed-offset chunks
    * (expression-only stand-in for video frame extraction; `substring`
    * works on binary). Returns (id, frame_idx, frame_bytes). */
  def frameSample(media: DataFrame, n: Int): DataFrame = {
    val chunk = (col("n_bytes") / n).cast("int")
    media.select(col("id"), col("n_bytes"),
        posexplode(transform(sequence(lit(0), lit(n - 1)),
          i => substring(col("media"), (i * chunk + 1).cast("int"), greatest(chunk, lit(1))))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_bytes")
      .select("id", "frame_idx", "frame_bytes")
  }
}
