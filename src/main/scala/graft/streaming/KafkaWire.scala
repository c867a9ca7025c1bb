package graft.streaming

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp
import java.util.zip.CRC32C

import graft.streaming.UdSource.{GraftSource, SourceRecord}

/** Socket-level KAFKA transport — the engine's own implementation of the
  * (public, documented) Kafka wire protocol subset the S3 source / K3
  * sink need: `ApiVersions` v0, `Metadata` v1, `ListOffsets` v1,
  * `Produce` v3 and `Fetch` v4 carrying **v2 record batches** (magic 2:
  * zigzag-varint records, batch-level CRC32C over everything after the
  * crc field). Zero dependencies beyond the JDK — the spark-sql-kafka
  * connector jar is absent and unfetchable here, so [[Kafka]]'s
  * `format("kafka")` wiring stays the real-cluster binding while THIS
  * client gives the Kafka path live-TCP evidence (KafkaWireSpec drives
  * produce → metadata → list-offsets → fetch → replay against an
  * in-process stub broker speaking the same frames), completing the
  * wire-client program: NATS, JetStream, SQS, Pulsar, Kafka.
  *
  * Protocol notes (kafka.apache.org/protocol):
  *  - Frame: INT32 size, then request header v1 (api_key INT16,
  *    api_version INT16, correlation_id INT32, client_id
  *    NULLABLE_STRING); response: INT32 size, correlation_id INT32,
  *    body. The chosen API versions are all pre-flexible (no compact
  *    encodings / tagged fields), which real brokers still serve.
  *  - Record batch v2: baseOffset INT64, batchLength INT32 (bytes after
  *    the field), partitionLeaderEpoch INT32, magic INT8 = 2, crc INT32
  *    (CRC32C of attributes..end — the leader-mutable prefix is
  *    excluded by design), then attributes/deltas/timestamps/producer
  *    fields/recordCount and the varint-framed records (zigzag lengths
  *    and deltas, nullable key as length −1, header array).
  *  - Offsets are the LOG's: fetch(from) replays from any retained
  *    offset, so the source's ack is a local floor (Spark checkpoints
  *    own the progress — the same economics as the JetStream adapter;
  *    consumer-group offset commit is deliberately out of scope, as the
  *    reference's group management is server-side rebalancing the Spark
  *    model replaces with checkpointed offsets). */
object KafkaWire {

  // ---- binary primitives (big-endian, the Kafka convention) ----

  private[graft] final class W {
    private val buf = new java.io.ByteArrayOutputStream(256)
    def i8(v: Int): this.type = { buf.write(v & 0xff); this }
    def i16(v: Int): this.type = { buf.write((v >>> 8) & 0xff); buf.write(v & 0xff); this }
    def i32(v: Int): this.type = { i16(v >>> 16); i16(v) }
    def i64(v: Long): this.type = { i32((v >>> 32).toInt); i32(v.toInt) }
    def raw(b: Array[Byte]): this.type = { buf.write(b, 0, b.length); this }
    def str(s: String): this.type = { val b = s.getBytes(UTF_8); i16(b.length); raw(b) }
    def nstr(s: String): this.type = if (s == null) i16(-1) else str(s)
    /** BYTES field: INT32 length (−1 = null) + raw. */
    def bytesF(b: Array[Byte]): this.type =
      if (b == null) i32(-1) else { i32(b.length); raw(b) }
    /** Zigzag varint/varlong (the record-framing integers). */
    def varlong(v: Long): this.type = {
      var x = (v << 1) ^ (v >> 63)
      while ((x & ~0x7fL) != 0) { buf.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      buf.write(x.toInt); this
    }
    def varint(v: Int): this.type = varlong(v.toLong)
    def result: Array[Byte] = buf.toByteArray
    def size: Int = buf.size
  }

  private[graft] object R {
    def i8(b: ByteBuffer): Int = b.get().toInt
    def i16(b: ByteBuffer): Int = b.getShort().toInt
    def i32(b: ByteBuffer): Int = b.getInt()
    def i64(b: ByteBuffer): Long = b.getLong()
    def str(b: ByteBuffer): String = {
      val n = i16(b); val a = new Array[Byte](n); b.get(a); new String(a, UTF_8)
    }
    def nstr(b: ByteBuffer): String = {
      val n = i16(b)
      if (n < 0) null
      else { val a = new Array[Byte](n); b.get(a); new String(a, UTF_8) }
    }
    def bytesF(b: ByteBuffer): Array[Byte] = {
      val n = i32(b)
      if (n < 0) null else { val a = new Array[Byte](n); b.get(a); a }
    }
    def varlong(b: ByteBuffer): Long = {
      var x = 0L; var shift = 0; var c = 0
      do { c = b.get() & 0xff; x |= (c & 0x7fL) << shift; shift += 7 }
      while ((c & 0x80) != 0)
      (x >>> 1) ^ -(x & 1) // un-zigzag
    }
    def varint(b: ByteBuffer): Int = varlong(b).toInt
  }

  final case class Record(offset: Long, timestamp: Long,
                          key: Array[Byte], value: Array[Byte])

  // ---- record batch v2 ----

  private[graft] object Batch {
    val Magic: Byte = 2
    /** attributes bits 0–2: compression codec (protocol enum). Only
      * none/gzip are implemented — gzip is the one codec the JDK ships
      * (snappy/lz4/zstd jars are absent and unfetchable here); a real
      * cluster negotiating another codec fails loudly in decode. */
    val CodecNone = 0
    val CodecGzip = 1

    private def gzip(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream(b.length / 2 + 64)
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close()
      bos.toByteArray
    }

    private def gunzip(b: Array[Byte]): Array[Byte] = {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b))
      val out = new java.io.ByteArrayOutputStream(b.length * 4 + 64)
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    }

    def encode(baseOffset: Long, baseTs: Long,
               records: Seq[(Array[Byte], Array[Byte])],
               codec: Int = CodecNone): Array[Byte] = {
      require(records.nonEmpty, "empty record batch")
      require(codec == CodecNone || codec == CodecGzip,
        s"unsupported codec $codec (none/gzip only)")
      val recs = new W // the records array — the span compression covers
      records.zipWithIndex.foreach { case ((k, v), i) =>
        val r = new W
        r.i8(0)          // record attributes
        r.varlong(0L)    // timestampDelta
        r.varint(i)      // offsetDelta
        if (k == null) r.varint(-1) else { r.varint(k.length); r.raw(k) }
        if (v == null) r.varint(-1) else { r.varint(v.length); r.raw(v) }
        r.varint(0)      // headers
        val rb = r.result
        recs.varint(rb.length); recs.raw(rb)
      }
      val body = new W // attributes .. records (the crc-covered span)
      body.i16(codec)                   // attributes: codec in bits 0-2
      body.i32(records.length - 1)      // lastOffsetDelta
      body.i64(baseTs)                  // baseTimestamp
      body.i64(baseTs)                  // maxTimestamp (uniform stamps)
      body.i64(-1L); body.i16(-1); body.i32(-1) // producer id/epoch/baseSeq
      body.i32(records.length)          // recordCount stays UNcompressed
      body.raw(if (codec == CodecGzip) gzip(recs.result) else recs.result)
      val covered = body.result
      val crc = new CRC32C(); crc.update(covered)
      val out = new W
      out.i64(baseOffset)
      out.i32(4 + 1 + 4 + covered.length) // batchLength: epoch+magic+crc+covered
      out.i32(0)                          // partitionLeaderEpoch
      out.i8(Magic)
      out.i32(crc.getValue.toInt)
      out.raw(covered)
      out.result
    }

    /** Decode every batch in a record set; CRC32C and magic verified. */
    def decode(recordSet: Array[Byte]): Seq[Record] = {
      val b = ByteBuffer.wrap(recordSet)
      val out = Seq.newBuilder[Record]
      while (b.remaining() >= 12) {
        val baseOffset = R.i64(b)
        val batchLength = R.i32(b)
        require(batchLength <= b.remaining(), "truncated record batch")
        val batchEnd = b.position() + batchLength
        R.i32(b) // partitionLeaderEpoch (excluded from the crc by design)
        val magic = R.i8(b)
        require(magic == Magic, s"unsupported magic $magic (record batch v2 only)")
        val crcStored = R.i32(b)
        val covered = new Array[Byte](batchEnd - b.position())
        b.mark(); b.get(covered); b.reset()
        val crc = new CRC32C(); crc.update(covered)
        require(crc.getValue.toInt == crcStored,
          "CRC32C mismatch: record batch corrupted in transit")
        val attributes = R.i16(b)
        val codec = attributes & 0x7
        require(codec == CodecNone || codec == CodecGzip,
          s"unsupported compression codec $codec (none/gzip only)")
        R.i32(b) // lastOffsetDelta
        val baseTs = R.i64(b)
        R.i64(b); R.i64(b); R.i16(b); R.i32(b) // maxTs, pid, epoch, baseSeq
        val n = R.i32(b)
        // compression covers ONLY the records array — recordCount and
        // everything before it stay plain (the documented v2 layout)
        val rb = if (codec == CodecGzip) {
          val packed = new Array[Byte](batchEnd - b.position())
          b.get(packed)
          ByteBuffer.wrap(gunzip(packed))
        } else b
        var i = 0
        while (i < n) {
          val len = R.varint(rb)
          val end = rb.position() + len
          R.i8(rb) // record attributes
          val tsDelta = R.varlong(rb)
          val offDelta = R.varint(rb)
          val kl = R.varint(rb)
          val key = if (kl < 0) null else { val a = new Array[Byte](kl); rb.get(a); a }
          val vl = R.varint(rb)
          val value = if (vl < 0) null else { val a = new Array[Byte](vl); rb.get(a); a }
          val nh = R.varint(rb)
          var h = 0
          while (h < nh) { // skip headers (opaque at this layer)
            val hk = R.varint(rb); rb.position(rb.position() + hk)
            val hv = R.varint(rb); if (hv > 0) rb.position(rb.position() + hv)
            h += 1
          }
          require(rb.position() == end, "record length mismatch")
          out += Record(baseOffset + offDelta, baseTs + tsDelta, key, value)
          i += 1
        }
        b.position(batchEnd)
      }
      out.result()
    }
  }

  // ---- connection + request/response ----

  private[graft] object Api {
    val Produce = 0; val Fetch = 1; val ListOffsets = 2; val Metadata = 3
    val SaslHandshake = 17; val ApiVersions = 18; val SaslAuthenticate = 36
  }

  /** @param saslPlain (username, password) — when set, every
    *   (re)connection authenticates with SASL/PLAIN (SaslHandshake v1 +
    *   SaslAuthenticate v0, the framed flow) before any other request,
    *   exactly the broker-side contract of `sasl.mechanism=PLAIN`. No
    *   TLS in this client, so as in any PLAIN-over-plaintext deployment
    *   the credential rides unencrypted — documented in the conformance
    *   matrix; the reference's Kafka source delegates the same choice to
    *   its client config.
    * @param saslScramSha256 (username, password) — SCRAM-SHA-256
    *   challenge-response instead (`sasl.mechanism=SCRAM-SHA-256`): the
    *   password never crosses the wire and the broker proves itself
    *   back (mutual auth via the v= signature — [[Scram]], RFC-vector
    *   pinned). Mutually exclusive with saslPlain. */
  final class Conn(host: String, port: Int, clientId: String = "graft-wire",
                   saslPlain: Option[(String, String)] = None,
                   socketFactory: (String, Int) => Socket = Tls.plain,
                   saslScramSha256: Option[(String, String)] = None)
      extends AutoCloseable {
    require(saslPlain.isEmpty || saslScramSha256.isEmpty,
      "configure at most one SASL mechanism")
    @volatile private var socket: Socket = _
    @volatile private var in: DataInputStream = _
    @volatile private var out: DataOutputStream = _
    @volatile private var closed = false

    private var corr = 0

    /** One request/response on the CURRENT socket, no redial — the SASL
      * exchange must complete on the connection it authenticates. */
    private def rawCall(apiKey: Int, version: Int)(body: W => Unit): ByteBuffer = {
      corr += 1
      val myCorr = corr
      val w = new W
      w.i16(apiKey).i16(version).i32(myCorr).nstr(clientId)
      body(w)
      val frame = w.result
      out.writeInt(frame.length); out.write(frame); out.flush()
      val size = in.readInt()
      val resp = new Array[Byte](size); in.readFully(resp)
      val b = ByteBuffer.wrap(resp)
      val gotCorr = R.i32(b)
      require(gotCorr == myCorr, s"correlation id mismatch: $gotCorr != $myCorr")
      b
    }

    /** SaslHandshake v1: negotiate `mechanism`; ≥ v1 means subsequent
      * SASL tokens flow as framed SaslAuthenticate requests (v0 sends
      * raw tokens; not spoken here). */
    private def saslHandshake(mechanism: String): Unit = {
      val h = rawCall(Api.SaslHandshake, 1)(w => w.str(mechanism))
      val herr = R.i16(h)
      val n = R.i32(h)
      val mechs = (0 until n).map(_ => R.str(h))
      require(herr == 0,
        s"SaslHandshake error $herr (broker offers: ${mechs.mkString(",")})")
    }

    /** One framed SASL token round-trip → the server's auth_bytes. */
    private def saslRound(token: Array[Byte], what: String): Array[Byte] = {
      val a = rawCall(Api.SaslAuthenticate, 0)(w => w.bytesF(token))
      val aerr = R.i16(a)
      val msg = R.nstr(a)
      require(aerr == 0, s"$what failed ($aerr): $msg")
      R.bytesF(a)
    }

    /** SASL/PLAIN: the single token [authzid=ε] NUL user NUL pass. */
    private def saslAuthenticate(user: String, pass: String): Unit = {
      saslHandshake("PLAIN")
      saslRound(("\u0000" + user + "\u0000" + pass).getBytes(UTF_8),
        "SASL authentication")
      ()
    }

    /** SCRAM-SHA-256: client-first → server-first → client-final →
      * server-final, each riding a framed SaslAuthenticate; the final
      * v= is VERIFIED (mutual auth — a broker that cannot produce the
      * server signature does not know the password — [[Scram]],
      * RFC-vector pinned). */
    private def scramAuthenticate(user: String, pass: String): Unit = {
      saslHandshake("SCRAM-SHA-256")
      val client = new Scram.Client(user, pass)
      val serverFirst = new String(
        saslRound(client.clientFirst.getBytes(UTF_8), "SCRAM server-first"),
        UTF_8)
      val (clientFinal, expectedSig) = client.clientFinal(serverFirst)
      val serverFinal = new String(
        saslRound(clientFinal.getBytes(UTF_8), "SCRAM authentication"), UTF_8)
      client.verifyServerFinal(serverFinal, expectedSig)
    }

    private def connect(): Unit = {
      // a close() racing a reconnect must not leak a fresh socket
      if (closed) throw new java.io.IOException("Conn closed")
      socket = socketFactory(host, port)
      try {
        in = new DataInputStream(new BufferedInputStream(socket.getInputStream))
        out = new DataOutputStream(new BufferedOutputStream(socket.getOutputStream))
        // authenticate EVERY connection (initial and redial) before any
        // other request — the broker rejects everything else with
        // SaslAuthenticationFailed otherwise
        saslPlain.foreach { case (u, p) => saslAuthenticate(u, p) }
        saslScramSha256.foreach { case (u, p) => scramAuthenticate(u, p) }
      } catch {
        // a rejected SASL exchange throws out of the constructor (or the
        // redial): close rather than leak the connected socket
        case t: Throwable =>
          try socket.close() catch { case _: java.io.IOException => () }
          throw t
      }
    }
    connect()

    private def call(apiKey: Int, version: Int)(body: W => Unit): ByteBuffer =
      synchronized {
        corr += 1
        val myCorr = corr
        val w = new W
        w.i16(apiKey).i16(version).i32(myCorr).nstr(clientId)
        body(w)
        val frame = w.result
        def once(): ByteBuffer = {
          out.writeInt(frame.length); out.write(frame); out.flush()
          val size = in.readInt()
          val resp = new Array[Byte](size); in.readFully(resp)
          val b = ByteBuffer.wrap(resp)
          // compare against the CAPTURED id: a redial may have spent
          // further ids on its SASL exchange before this replay
          val gotCorr = R.i32(b)
          require(gotCorr == myCorr, s"correlation id mismatch: $gotCorr != $myCorr")
          b
        }
        try once()
        catch {
          // Broker death mid-call: redial and replay THIS request once.
          // Safe for the read APIs (metadata/offsets/fetch are
          // idempotent); a produce replay can double-append when the
          // broker died after appending but before the receipt — the
          // documented at-least-once window of every acks-based client
          // without idempotent-producer support.
          case _: java.io.IOException if !closed =>
            try socket.close() catch { case _: java.io.IOException => () }
            connect()
            once()
        }
      }

    /** ApiVersions v0 → api_key → (min, max); the handshake asserts the
      * broker serves the versions this client speaks. */
    def apiVersions(): Map[Int, (Int, Int)] = {
      val b = call(Api.ApiVersions, 0)(_ => ())
      val err = R.i16(b); require(err == 0, s"ApiVersions error $err")
      val n = R.i32(b)
      (0 until n).map { _ =>
        val k = R.i16(b); val lo = R.i16(b); val hi = R.i16(b); k -> (lo, hi)
      }.toMap
    }

    /** Metadata v1 for one topic → partition ids (single-broker subset:
      * the stub IS the leader for everything it reports). */
    def partitionsOf(topic: String): Seq[Int] = {
      val b = call(Api.Metadata, 1) { w => w.i32(1); w.str(topic) }
      val nb = R.i32(b) // brokers
      (0 until nb).foreach { _ => R.i32(b); R.str(b); R.i32(b); R.nstr(b) }
      R.i32(b) // controller id
      val nt = R.i32(b); require(nt == 1, s"expected 1 topic, got $nt")
      val terr = R.i16(b); require(terr == 0, s"topic error $terr")
      val name = R.str(b); require(name == topic, s"topic mismatch $name")
      R.i8(b) // is_internal
      val np = R.i32(b)
      (0 until np).map { _ =>
        val perr = R.i16(b); require(perr == 0, s"partition error $perr")
        val p = R.i32(b)
        R.i32(b) // leader
        val nr = R.i32(b); (0 until nr).foreach(_ => R.i32(b))
        val ni = R.i32(b); (0 until ni).foreach(_ => R.i32(b))
        p
      }
    }

    /** ListOffsets v1: timestamp −1 = log-end (the high watermark). */
    def logEndOffset(topic: String, partition: Int): Long = {
      val b = call(Api.ListOffsets, 1) { w =>
        w.i32(-1) // replica_id: consumer
        w.i32(1); w.str(topic)
        w.i32(1); w.i32(partition); w.i64(-1L)
      }
      val nt = R.i32(b); require(nt == 1, s"ListOffsets topics $nt")
      R.str(b)
      val np = R.i32(b); require(np == 1, s"ListOffsets partitions $np")
      R.i32(b)
      val err = R.i16(b); require(err == 0, s"ListOffsets error $err")
      R.i64(b) // timestamp
      R.i64(b) // offset
    }

    /** Produce v3, acks=-1: blocks for the broker's base-offset receipt
      * (publish CONFIRMED — the at-least-once half the K3 sink needs). */
    def produce(topic: String, partition: Int,
                records: Seq[(Array[Byte], Array[Byte])],
                baseTs: Long = System.currentTimeMillis(),
                codec: Int = Batch.CodecNone): Long = {
      val set = Batch.encode(0L, baseTs, records, codec)
      val b = call(Api.Produce, 3) { w =>
        w.nstr(null) // transactional_id
        w.i16(-1)    // acks: full ISR
        w.i32(30000) // timeout
        w.i32(1); w.str(topic)
        w.i32(1); w.i32(partition); w.bytesF(set)
      }
      val nt = R.i32(b); require(nt == 1, s"Produce topics $nt")
      R.str(b)
      val np = R.i32(b); require(np == 1, s"Produce partitions $np")
      R.i32(b)
      val err = R.i16(b); require(err == 0, s"Produce error $err")
      val baseOffset = R.i64(b)
      R.i64(b) // log_append_time
      R.i32(b) // throttle
      baseOffset
    }

    /** Fetch v4 → (highWatermark, records from `offset`). */
    def fetch(topic: String, partition: Int, offset: Long,
              maxBytes: Int = 1 << 20): (Long, Seq[Record]) = {
      val b = call(Api.Fetch, 4) { w =>
        w.i32(-1)      // replica_id
        w.i32(0)       // max_wait_ms: poll
        w.i32(0)       // min_bytes
        w.i32(maxBytes)
        w.i8(0)        // isolation: read-uncommitted
        w.i32(1); w.str(topic)
        w.i32(1); w.i32(partition); w.i64(offset); w.i32(maxBytes)
      }
      R.i32(b) // throttle
      val nt = R.i32(b); require(nt == 1, s"Fetch topics $nt")
      R.str(b)
      val np = R.i32(b); require(np == 1, s"Fetch partitions $np")
      R.i32(b)
      val err = R.i16(b); require(err == 0, s"Fetch error $err")
      val hw = R.i64(b)
      R.i64(b) // last_stable_offset
      val na = R.i32(b); require(na <= 0, "aborted txns unsupported")
      val set = R.bytesF(b)
      val recs = if (set == null || set.isEmpty) Seq.empty
        else Batch.decode(set).filter(_.offset >= offset)
      (hw, recs)
    }

    def close(): Unit = { closed = true; socket.close() }
  }

  /** S3 over the wire client: one topic-partition as a [[GraftSource]].
    * The log's own offsets are the source offsets (replay from any
    * retained position — the JetStream adapter economics); ack keeps a
    * local floor for lag accounting, progress lives in the engine's
    * checkpoint. */
  final class Source(conn: Conn, topic: String, partition: Int = 0)
      extends GraftSource {
    @volatile private var ackedTo = 0L
    def partitions: Seq[Int] = Seq(partition)
    def latestOffset(p: Int): Long = conn.logEndOffset(topic, partition)
    def read(p: Int, from: Long, until: Long): Iterator[SourceRecord] = {
      val out = Seq.newBuilder[SourceRecord]
      var cur = from
      var progress = true
      while (cur < until && progress) {
        val (_, recs) = conn.fetch(topic, partition, cur)
        val take = recs.filter(r => r.offset >= cur && r.offset < until)
        progress = take.nonEmpty
        take.foreach { r =>
          out += SourceRecord(r.offset, partition,
            if (r.key == null) Seq.empty else Seq(new String(r.key, UTF_8)),
            r.value, new Timestamp(r.timestamp))
          cur = math.max(cur, r.offset + 1)
        }
      }
      out.result().iterator
    }
    def ack(p: Int, upTo: Long): Unit = ackedTo = math.max(ackedTo, upTo)
    def pending: Long = math.max(latestOffset(partition) - ackedTo, 0L)
  }
}
