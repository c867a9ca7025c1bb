package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** Golden-value coverage for the REAL ImageIO decode path: exact channel
  * sums for a known BMP payload, nearest-neighbor resize offsets, the
  * corrupt/truncated/non-image fallbacks, the decompression-bomb guard,
  * and a real PNG round-trip through `ImageIO.write`. Tier-1 analog of the
  * reference's construct-message-assert tests (message.rs:702+). */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  implicit val s: org.apache.spark.sql.SparkSession = spark

  private def mediaDF(rows: (Long, Array[Byte], String)*) =
    rows.toSeq.toDF("id", "media", "mime")
      .withColumn("source", lit("test"))
      .withColumn("n_bytes", length(col("media")).cast("long"))

  test("bmpFromBytes -> decodeStats: channel sums are an exact function of the payload") {
    // payload byte j -> pixel-data byte j; channel = j mod 3 (BGR order)
    val payload = (0 until 48).map(_.toByte).toArray
    val bmp = Multimodal.bmpFromBytes(payload, 4, 4)
    val out = Multimodal.decodeStats(mediaDF((1L, bmp, "image/bmp"))).collect().head
    val expB = (0 until 48 by 3).sum.toLong // 0+3+...+45
    val expG = (1 until 48 by 3).sum.toLong
    val expR = (2 until 48 by 3).sum.toLong
    assert(out.decoded && out.width == 4 && out.height == 4)
    assert((out.sum_r, out.sum_g, out.sum_b) === ((expR, expG, expB)))
  }

  test("bmpFromBytes pads short payloads with 'A' and respects row alignment") {
    // w=5 -> rowSize 16 (15 data bytes + 1 alignment byte per row, excluded
    // from payload indexing); 10-byte payload, rest 'A' (=65)
    val payload = Array.tabulate[Byte](10)(i => (i + 1).toByte)
    val bmp = Multimodal.bmpFromBytes(payload, 5, 2)
    val out = Multimodal.decodeStats(mediaDF((1L, bmp, "image/bmp"))).collect().head
    assert(out.decoded && out.width == 5 && out.height == 2)
    // 30 pixel bytes: j<10 -> j+1, else 65; channel = j mod 3 (B,G,R)
    val v = (0 until 30).map(j => if (j < 10) j + 1 else 65)
    assert(out.sum_b === (0 until 30 by 3).map(v).sum.toLong)
    assert(out.sum_g === (1 until 30 by 3).map(v).sum.toLong)
    assert(out.sum_r === (2 until 30 by 3).map(v).sum.toLong)
  }

  test("resizeImage samples nearest-neighbor pixels at fixed bottom-up offsets") {
    val payload = (0 until 48).map(_.toByte).toArray
    val bmp = Multimodal.bmpFromBytes(payload, 4, 4)
    val out = Multimodal.resizeImage(mediaDF((1L, bmp, "image/bmp")), 2, 2).collect().head
    // image pixels (0,0),(2,0),(0,2),(2,2); bottom-up rows => payload
    // offsets 36,42,12,18 (+0 B, +1 G, +2 R)
    val offs = Seq(36, 42, 12, 18)
    assert(out.width == 2 && out.height == 2)
    assert(out.sum_b === offs.map(o => payload(o).toLong).sum)
    assert(out.sum_g === offs.map(o => payload(o + 1).toLong).sum)
    assert(out.sum_r === offs.map(o => payload(o + 2).toLong).sum)
  }

  test("corrupt, truncated, and non-image payloads fall back to -1 rows") {
    val good = Multimodal.bmpFromBytes(Array.fill[Byte](48)(7), 4, 4)
    val truncated = good.take(30) // header cut mid-BITMAPINFOHEADER
    val corrupt = good.clone(); corrupt(0) = 'X' // magic bytes broken
    val text = "just some plain text".getBytes("UTF-8")
    val rows = Multimodal.decodeStats(mediaDF(
        (1L, truncated, "image/bmp"), (2L, corrupt, "image/bmp"),
        (3L, text, "text/plain"), (4L, Array.empty[Byte], "application/octet-stream")))
      .collect().map(r => r.id -> r.decoded).toMap
    assert(rows === Map(1L -> false, 2L -> false, 3L -> false, 4L -> false))
  }

  test("decompression-bomb header is rejected before decode") {
    // 54-byte BMP header declaring 65536x65536 (4G pixels) with no pixel
    // data: the dimension guard must return an undecoded row, not OOM.
    val bomb = Multimodal.bmpFromBytes(Array.empty[Byte], 1, 1)
    def le32(off: Int, v: Int): Unit = {
      bomb(off) = (v & 0xff).toByte; bomb(off + 1) = ((v >> 8) & 0xff).toByte
      bomb(off + 2) = ((v >> 16) & 0xff).toByte; bomb(off + 3) = ((v >> 24) & 0xff).toByte
    }
    le32(18, 65536); le32(22, 65536)
    val out = Multimodal.decodeStats(mediaDF((1L, bomb, "image/bmp"))).collect().head
    assert(!out.decoded)
  }

  test("real PNG via ImageIO.write round-trips with exact channel sums") {
    val img = new BufferedImage(3, 2, BufferedImage.TYPE_INT_RGB)
    var rgb = Seq.empty[(Int, Int, Int)]
    for (y <- 0 until 2; x <- 0 until 3) {
      val (r, g, b) = (10 * (y * 3 + x) + 1, 10 * (y * 3 + x) + 2, 10 * (y * 3 + x) + 3)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
      rgb :+= ((r, g, b))
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    val out = Multimodal.decodeStats(mediaDF((1L, bos.toByteArray, "image/png"))).collect().head
    assert(out.decoded && out.width == 3 && out.height == 2)
    assert(out.sum_r === rgb.map(_._1).sum.toLong)
    assert(out.sum_g === rgb.map(_._2).sum.toLong)
    assert(out.sum_b === rgb.map(_._3).sum.toLong)
  }

  test("pcmStats: little-endian signed int16, odd tail ignored, empty is the zero row") {
    // samples: [0x0001]=1, [0xFF7F]=32767, [0x0080]=-32768, [0xFFFF]=-1;
    // a 9th byte (odd tail) must be ignored.
    val payload = Array[Byte](0x01, 0x00, 0xff.toByte, 0x7f, 0x00, 0x80.toByte,
      0xff.toByte, 0xff.toByte, 0x42)
    val rows = Multimodal.pcmStats(mediaDF(
        (1L, payload, "audio/pcm"), (2L, Array.empty[Byte], "audio/pcm")))
      .collect().map(r => r.id -> r).toMap
    val p = rows(1L)
    assert(p.n_samples === 4L)
    assert(p.min_s === -32768 && p.max_s === 32767)
    assert(p.sum_s === (1L + 32767L - 32768L - 1L))
    assert(p.sum_abs === (1L + 32767L + 32768L + 1L))
    val z = rows(2L)
    assert(z.n_samples === 0L && z.min_s === 0 && z.max_s === 0 &&
      z.sum_s === 0L && z.sum_abs === 0L)
  }

  test("pcmFrameEnergy: exact frame sums, earliest peak tie, partial frame drops") {
    // frameLen 2: frames [1, 2] e=5, [3, -4] e=25, [3, 4] e=25 (tie →
    // frame 1 wins), trailing lone sample drops.
    def le(s: Int): Seq[Byte] =
      Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)
    val payload = (Seq(1, 2, 3, -4, 3, 4).flatMap(le) :+ 0x42.toByte).toArray
    val rows = Multimodal.pcmFrameEnergy(mediaDF(
        (1L, payload, "audio/pcm"),
        (2L, le(7).toArray, "audio/pcm")), frameLen = 2) // 1 sample < frame
      .collect().map(r => r.id -> r).toMap
    val p = rows(1L)
    assert(p.n_frames === 3L)
    assert(p.peak_frame === 1 && p.peak_energy === 25L)
    assert(p.total_energy === (5L + 25L + 25L))
    val z = rows(2L)
    assert(z.n_frames === 0L && z.peak_energy === 0L && z.total_energy === 0L)
  }

  test("decodeFeatures is mime-gated: image/* decodes, text keeps the 4-wide byte contract") {
    val bmp = Multimodal.bmpFromBytes((0 until 48).map(_.toByte).toArray, 4, 4)
    val feats = Multimodal.decodeFeatures(mediaDF(
        (1L, bmp, "image/bmp"),
        (2L, bmp, "text/plain"))) // same bytes, non-image mime -> byte stats
      .collect().map(r => r.id -> r.features).toMap
    assert(feats(1L).length === 5)
    assert(feats(1L)(0) === 4f && feats(1L)(1) === 4f)
    assert(feats(2L).length === 4)
    assert(feats(2L)(0) === bmp.length.toFloat)
  }

  test("avgHash: golden bits, identical payloads collide, garbage is -1") {
    // pixel p bright (all channels 255) iff p in {0, 5}; BMP rows are
    // bottom-up so image pixel (x, y) maps to payload row 3-y.
    val bright = Set(0, 5)
    val payload = new Array[Byte](48)
    for (p <- 0 until 16; c <- 0 until 3) {
      val (x, y) = (p % 4, p / 4)
      payload((3 - y) * 12 + 3 * x + c) = if (bright(p)) 0xff.toByte else 0x00
    }
    val bmp = Multimodal.bmpFromBytes(payload, 4, 4)
    val out = Multimodal.avgHash(mediaDF(
        (1L, bmp, "image/bmp"),
        (2L, bmp, "image/bmp"),
        (3L, "not an image".getBytes, "image/bmp")), hw = 4, hh = 4)
      .collect().map(r => r.id -> r.phash).toMap
    // two bright pixels of 16: each bright gray 765, total 1530;
    // 16*765 > 1530 only for the bright ones -> bits 0 and 5.
    assert(out(1L) === ((1L << 0) | (1L << 5)))
    assert(out(2L) === out(1L))
    assert(out(3L) === -1L)
  }
}
