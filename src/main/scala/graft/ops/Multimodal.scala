package graft.ops

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * Image decoding is REAL: JDK `javax.imageio.ImageIO` (PNG/BMP/GIF/JPEG
  * readers ship with the JDK — zero extra dependencies). Payloads no
  * registered reader recognizes (plain text, exotic codecs) fall back to
  * deterministic byte-derived features, so the operator is total over
  * arbitrary binary columns. The per-partition `mapPartitions` seam
  * initializes decoder state once per partition (ImageIO's disk cache is
  * disabled there — decode stays in-memory on executors).
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

  /** Pixel-count cap for decode. Headers declaring more pixels than this
    * (decompression bombs — a 60-byte BMP can declare 2^30×2^30) are
    * rejected BEFORE the full-image allocation, so a crafted header cannot
    * OOM an executor. 64M px ≈ 256 MB ARGB, comfortably within an executor
    * task's headroom. */
  val MaxDecodePixels: Long = 64L * 1024 * 1024

  /** Real ImageIO decode; `None` when no registered reader recognizes the
    * bytes (magic-byte sniffing), the header declares more than
    * [[MaxDecodePixels]], or the payload is truncated/corrupt. Dimensions
    * are read from the stream header via the reader BEFORE the pixel
    * decode, so the bomb guard costs no allocation. Total: never throws. */
  private def tryDecode(bytes: Array[Byte]): Option[BufferedImage] =
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      if (iis == null) None
      else try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, true, true)
            val w = reader.getWidth(0).toLong
            val h = reader.getHeight(0).toLong
            if (w <= 0 || h <= 0 || w * h > MaxDecodePixels) None
            else Option(reader.read(0))
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Exact integer channel sums over the whole image, via bulk per-row
    * `getRGB` (one color-model conversion per row fetch instead of one per
    * pixel — the per-pixel overload is the slow path on large images). */
  private def channelSums(img: BufferedImage): (Long, Long, Long) = {
    val w = img.getWidth; val h = img.getHeight
    val row = new Array[Int](w)
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val p = row(x)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    (sr, sg, sb)
  }

  /** Decode + feature-extract over partition-batched records.
    *
    * Records whose declared `mime` starts with `image/` AND decode (real ImageIO)
    * → `[width, height, meanR, meanG, meanB]`; everything else →
    * deterministic byte-derived fallback `[n_bytes, first_byte, last_byte,
    * byte_sum % 1009]` so the operator is total over opaque binary columns
    * (the reference likewise treats `value` as opaque bytes,
    * message.rs:107). Gating on the mime column (not payload sniffing)
    * keeps non-image records — e.g. a text document whose bytes happen to
    * parse as an image — on the stable 4-wide contract. */
  def decodeFeatures(media: Dataset[Row])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      ImageIO.setUseCache(false) // once per partition: in-memory decode on executors
      it.map { rec =>
        val decoded =
          if (rec.mime != null && rec.mime.startsWith("image/")) tryDecode(rec.media)
          else None
        val feats = decoded match {
          case Some(img) =>
            val (w, h) = (img.getWidth, img.getHeight)
            val (sr, sg, sb) = channelSums(img)
            val n = (w.toLong * h).toFloat
            Array(w.toFloat, h.toFloat, sr / n, sg / n, sb / n)
          case None => byteFeatures(rec.media)
        }
        MediaFeatures(rec.id, rec.n_bytes, feats)
      }
    }
  }

  /** Fallback features for payloads ImageIO cannot decode: deterministic
    * byte stats, so tests and oracles can verify the plumbing on any
    * binary column. */
  private def byteFeatures(bytes: Array[Byte]): Array[Float] = {
    val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
    Array(
      bytes.length.toFloat,
      if (bytes.nonEmpty) (bytes(0) & 0xff).toFloat else 0f,
      if (bytes.nonEmpty) (bytes(bytes.length - 1) & 0xff).toFloat else 0f,
      (sum % 1009).toFloat)
  }

  /** Exact per-image decode stats: integer channel sums (oracle-friendly —
    * no float rounding) plus dimensions; `decoded=false` rows carry -1s. */
  final case class DecodeStats(id: Long, decoded: Boolean, width: Int, height: Int,
                               sum_r: Long, sum_g: Long, sum_b: Long)

  def decodeStats(media: Dataset[Row])(implicit spark: SparkSession): Dataset[DecodeStats] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.map { rec =>
        tryDecode(rec.media) match {
          case Some(img) =>
            val (sr, sg, sb) = channelSums(img)
            DecodeStats(rec.id, decoded = true, img.getWidth, img.getHeight, sr, sg, sb)
          case None => DecodeStats(rec.id, decoded = false, -1, -1, -1L, -1L, -1L)
        }
      }
    }
  }

  /** Deterministic 24-bit BMP (BITMAPINFOHEADER, bottom-up rows, BGR,
    * 4-byte row alignment) wrapping raw pixel bytes: payload byte j is
    * pixel-data byte j (row padding excluded); short payloads pad with
    * `pad`. Gives tests and oracle queries a REAL image container whose
    * decoded pixels are an exact, SQL-computable function of the input
    * bytes. */
  def bmpFromBytes(payload: Array[Byte], w: Int, h: Int, pad: Byte = 'A'): Array[Byte] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val dataSize = rowSize * h
    val out = new Array[Byte](54 + dataSize)
    def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte; out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'; le32(2, 54 + dataSize); le32(10, 54); le32(14, 40)
    le32(18, w); le32(22, h); out(26) = 1; out(28) = 24; le32(34, dataSize)
    le32(38, 2835); le32(42, 2835)
    var row = 0
    while (row < h) {
      var j = 0
      while (j < w * 3) {
        val src = row * w * 3 + j
        out(54 + row * rowSize + j) = if (src < payload.length) payload(src) else pad
        j += 1
      }
      row += 1
    }
    out
  }

  /** One resized image: dimensions + exact integer channel sums over the
    * nearest-neighbor-sampled pixels. */
  final case class ResizeStats(id: Long, width: Int, height: Int,
                               sum_r: Long, sum_g: Long, sum_b: Long)

  /** Real image resize: ImageIO decode + nearest-neighbor sampling
    * (dst(x,y) ← src(⌊x·sw/dw⌋, ⌊y·sh/dh⌋) — deterministic, no
    * platform-dependent interpolation). Undecodable payloads → -1 row. */
  def resizeImage(media: Dataset[Row], outW: Int, outH: Int)
                 (implicit spark: SparkSession): Dataset[ResizeStats] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.map { rec =>
        tryDecode(rec.media) match {
          case Some(img) =>
            val (sw, sh) = (img.getWidth, img.getHeight)
            val srcRow = new Array[Int](sw)
            var sr = 0L; var sg = 0L; var sb = 0L
            var y = 0
            while (y < outH) {
              img.getRGB(0, y * sh / outH, sw, 1, srcRow, 0, sw) // one bulk row fetch per output row
              var x = 0
              while (x < outW) {
                val p = srcRow(x * sw / outW)
                sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                x += 1
              }
              y += 1
            }
            ResizeStats(rec.id, outW, outH, sr, sg, sb)
          case None => ResizeStats(rec.id, -1, -1, -1L, -1L, -1L)
        }
      }
    }
  }

  /** One (image, channel, bin) histogram cell. */
  final case class ChannelBin(id: Long, channel: String, bin: Long, n: Long)

  /** Per-channel intensity histogram over the FULL decoded pixel grid
    * (8 equal-width bins per channel by default: bin = v·bins >> 8) —
    * the color-profile feature behind screenshot/photo/diagram routing
    * and near-constant-image triage (one saturated bin = a blank or
    * solid-color asset). Row-local typed seam like [[resizeImage]]:
    * real ImageIO decode, exact integer counts, zero shuffle; empty
    * bins are NOT emitted (both engines agree on the sparse form).
    * Undecodable payloads → one ("undecodable", -1, -1) marker row. */
  def channelHist(media: Dataset[Row], bins: Int = 8)
                 (implicit spark: SparkSession): Dataset[ChannelBin] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.flatMap { rec =>
        tryDecode(rec.media) match {
          case Some(img) =>
            val w = img.getWidth; val h = img.getHeight
            val row = new Array[Int](w)
            val cnt = Array.ofDim[Long](3, bins)
            var y = 0
            while (y < h) {
              img.getRGB(0, y, w, 1, row, 0, w)
              var x = 0
              while (x < w) {
                val p = row(x)
                cnt(0)((((p >> 16) & 0xff) * bins) >> 8) += 1
                cnt(1)((((p >> 8) & 0xff) * bins) >> 8) += 1
                cnt(2)(((p & 0xff) * bins) >> 8) += 1
                x += 1
              }
              y += 1
            }
            val chans = Array("r", "g", "b")
            for {
              c <- (0 until 3).iterator; b <- (0 until bins).iterator
              if cnt(c)(b) > 0
            } yield ChannelBin(rec.id, chans(c), b.toLong, cnt(c)(b))
          case None =>
            Iterator(ChannelBin(rec.id, "undecodable", -1L, -1L))
        }
      }
    }
  }

  /** Perceptual hash record: -1 for undecodable payloads. */
  final case class PHash(id: Long, phash: Long)

  /** Average-hash perceptual fingerprint (the classic aHash image-dedup
    * signature): decode, nearest-neighbor sample to `hw`×`hh`, per-pixel
    * integer gray = r+g+b (channel-order independent), then bit p set
    * iff its gray strictly exceeds the mean — compared in EXACT integers
    * as `hw·hh·gray > Σgray`, so the hash is bit-reproducible and a SQL
    * oracle can replay it from the deterministic BMP bytes. Bits pack
    * LSB-first in row-major pixel order (p = y·hw + x), hw·hh ≤ 63.
    *
    * Near-duplicate images (re-encodes, small edits) collide or differ
    * in few bits; downstream exact/Hamming grouping is the same shape as
    * the simhash dedup family. Row-local, zero shuffle, streamable. */
  def avgHash(media: Dataset[Row], hw: Int, hh: Int)
             (implicit spark: SparkSession): Dataset[PHash] = {
    require(hw * hh <= 63, "hash must fit a BIGINT")
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.map { rec =>
        tryDecode(rec.media) match {
          case Some(img) =>
            val (sw, sh) = (img.getWidth, img.getHeight)
            val srcRow = new Array[Int](sw)
            val grays = new Array[Long](hw * hh)
            var y = 0
            while (y < hh) {
              img.getRGB(0, y * sh / hh, sw, 1, srcRow, 0, sw)
              var x = 0
              while (x < hw) {
                val p = srcRow(x * sw / hw)
                grays(y * hw + x) =
                  ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
                x += 1
              }
              y += 1
            }
            val total = grays.sum
            var bits = 0L
            var i = 0
            while (i < grays.length) {
              if (hw.toLong * hh * grays(i) > total) bits |= (1L << i)
              i += 1
            }
            PHash(rec.id, bits)
          case None => PHash(rec.id, -1L)
        }
      }
    }
  }

  /** Integer-exact PCM stats for one audio payload (all stats are exact
    * integers, so the operator is oracle-checkable end to end). */
  final case class PcmStats(id: Long, n_samples: Long, min_s: Int, max_s: Int,
                            sum_s: Long, sum_abs: Long)

  /** Audio half of the multimodal family: interpret the payload as
    * little-endian signed 16-bit PCM samples (the WAV/raw-PCM wire
    * format; a trailing odd byte is ignored, an empty payload yields the
    * zero row) and fold exact integer sample stats — count, min, max,
    * sum, sum of absolute values. Same per-partition typed seam as the
    * image decoders; row-local, zero shuffle, streamable. */
  def pcmStats(media: Dataset[Row])(implicit spark: SparkSession): Dataset[PcmStats] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { rec =>
        val b = rec.media
        val n = b.length / 2
        var i = 0
        var mn = Int.MaxValue; var mx = Int.MinValue
        var sum = 0L; var sabs = 0L
        while (i < n) {
          val s = ((b(2 * i) & 0xff) | (b(2 * i + 1) << 8)).toShort.toInt
          if (s < mn) mn = s
          if (s > mx) mx = s
          sum += s; sabs += math.abs(s)
          i += 1
        }
        if (n == 0) PcmStats(rec.id, 0L, 0, 0, 0L, 0L)
        else PcmStats(rec.id, n.toLong, mn, mx, sum, sabs)
      }
    }
  }

  final case class PcmEnergy(id: Long, n_frames: Long, peak_frame: Int,
                             peak_energy: Long, total_energy: Long)

  /** Windowed frame energy over int16 PCM: the payload splits into
    * fixed `frameLen`-sample frames (tail under a full frame drops) and
    * each frame's energy is its exact integer Σ s² — the voice-activity
    * / loudness profile every audio-curation pass starts from (silence
    * trimming, clipping detection, segment selection). Reports the peak
    * frame (ties → earliest), its energy, and the total. Same typed
    * per-partition seam as [[pcmStats]]: byte decode is genuinely
    * non-Catalyst, everything downstream is exact integers (≤ 2³⁶ per
    * frame at frameLen 64, no overflow anywhere near 2⁶³). */
  def pcmFrameEnergy(media: Dataset[Row], frameLen: Int = 64)
                    (implicit spark: SparkSession): Dataset[PcmEnergy] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { rec =>
        val b = rec.media
        val nFrames = b.length / 2 / frameLen
        var f = 0
        var peakF = 0; var peakE = -1L; var total = 0L
        while (f < nFrames) {
          var i = 0; var e = 0L
          while (i < frameLen) {
            val o = 2 * (f * frameLen + i)
            val s = ((b(o) & 0xff) | (b(o + 1) << 8)).toShort.toLong
            e += s * s
            i += 1
          }
          if (e > peakE) { peakE = e; peakF = f }
          total += e
          f += 1
        }
        if (nFrames == 0) PcmEnergy(rec.id, 0L, 0, 0L, 0L)
        else PcmEnergy(rec.id, nFrames.toLong, peakF, peakE, total)
      }
    }
  }

  /** One resized record: id + fixed-length resampled payload. */
  final case class Resized(id: Long, resized: Array[Byte])

  /** Byte-level resample stage: nearest-neighbor byte resampling to a
    * fixed `outLen` (index i ← byte ⌊i·len/outLen⌋). For opaque non-image
    * payloads (audio PCM, arbitrary binary); REAL image resize with pixel
    * semantics is `resizeImage` above. */
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

  /** Keyframe selection over sampled frames: the frame whose byte-sum
    * DELTA vs the previous frame is largest (scene-change proxy — a
    * real pipeline swaps the byte sum for a decoded-luma sum, same
    * shape). Frame stats are row-local; the argmax is a per-id window
    * over n rows. Deterministic: (delta desc, frame_idx) tie-break;
    * frame 0 has no predecessor and never wins. */
  def keyFrames(media: DataFrame, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byteSum = aggregate(
      transform(split(col("f"), ""), c => ascii(c).cast("long")),
      lit(0L), (a, x) => a + x)
    val w = Window.partitionBy("id").orderBy("frame_idx")
    frameSample(media, n)
      .withColumn("f", col("frame_bytes").cast("string"))
      .withColumn("bsum", byteSum)
      .withColumn("delta", abs(col("bsum") - lag("bsum", 1).over(w)))
      .where(col("delta").isNotNull)
      .withColumn("__rn", row_number().over(
        Window.partitionBy("id").orderBy(col("delta").desc, col("frame_idx"))))
      .where(col("__rn") === 1)
      .select(col("id"), col("frame_idx").as("key_frame"), col("bsum"), col("delta"))
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

  /** One voice-activity segment: a maximal run of consecutive
    * above-average-energy frames. */
  final case class VadSegment(id: Long, seg: Int, f0: Int, f1: Int,
                              n_frames: Long, energy: Long)

  /** Energy-threshold voice-activity detection over int16 PCM: frames
    * ([[pcmFrameEnergy]]'s exact Σs² windows) are ACTIVE when their
    * energy exceeds the payload's mean frame energy — compared as the
    * integer cross-product e·nFrames > total, so no float threshold
    * exists for a borderline frame to straddle — and consecutive active
    * frames merge into segments (the silence-trimming / speech-span
    * selection pass audio curation starts from). Emits one row per
    * segment with its frame span and exact energy; an all-flat payload
    * (every frame at the mean) has no active frames and emits nothing.
    *
    * The adaptive threshold makes the operator self-calibrating per
    * payload — no corpus pass, no tuning constant — and keeps it
    * row-local: decode, threshold, and run-merge all happen inside one
    * typed mapPartitions over the record, zero shuffle, streamable. */
  def pcmVadSegments(media: Dataset[Row], frameLen: Int = 64)
                    (implicit spark: SparkSession): Dataset[VadSegment] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.flatMap { rec =>
        val b = rec.media
        val nFrames = b.length / 2 / frameLen
        val e = new Array[Long](nFrames)
        var total = 0L
        var f = 0
        while (f < nFrames) {
          var i = 0; var acc = 0L
          while (i < frameLen) {
            val o = 2 * (f * frameLen + i)
            val s = ((b(o) & 0xff) | (b(o + 1) << 8)).toShort.toLong
            acc += s * s
            i += 1
          }
          e(f) = acc; total += acc
          f += 1
        }
        val segs = scala.collection.mutable.ArrayBuffer.empty[VadSegment]
        var start = -1
        var segE = 0L
        var seg = 0
        var g = 0
        while (g <= nFrames) {
          val active = g < nFrames && e(g) * nFrames > total
          if (active) {
            if (start < 0) { start = g; segE = 0L }
            segE += e(g)
          } else if (start >= 0) {
            segs += VadSegment(rec.id, seg, start, g - 1, (g - start).toLong, segE)
            seg += 1; start = -1
          }
          g += 1
        }
        segs
      }
    }
  }
}
