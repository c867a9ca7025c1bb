package graft

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{KafkaWire, Scram}
import graft.streaming.KafkaWire.{Api, Batch, R, W}

/** The Kafka wire-protocol subset, end-to-end over a real loopback TCP
  * socket: an in-process stub broker speaks ApiVersions v0 / Metadata v1
  * / ListOffsets v1 / Produce v3 / Fetch v4 with v2 record batches, and
  * [[KafkaWire]] drives produce → metadata → log-end → fetch → replay
  * against it — S3/K3's live-socket proof (`format("kafka")` stays the
  * real-cluster binding; the connector jar is absent here). The stub
  * ITSELF re-verifies every produced batch's CRC32C and decodes the
  * varint records before appending, so a framing bug cannot round-trip
  * silently; the layout pins below additionally check the v2 batch
  * fields against an independent bit-level CRC32C. */
class KafkaWireSpec extends AnyFunSuite {


  private def crc32cRef(bytes: Array[Byte]): Long = {
    var crc = 0xffffffffL
    bytes.foreach { b =>
      crc ^= (b & 0xffL)
      var k = 0
      while (k < 8) {
        crc = if ((crc & 1L) != 0) (crc >>> 1) ^ 0x82f63b78L else crc >>> 1
        k += 1
      }
    }
    (crc ^ 0xffffffffL) & 0xffffffffL
  }

  /** Loopback stub: one in-memory log per (topic, partition); one thread
    * per connection; the shared log synchronized on the broker. With
    * `sasl` set, the stub enforces the broker-side SASL/PLAIN contract:
    * SaslHandshake v1 → framed SaslAuthenticate, and ANY other request
    * on an unauthenticated connection closes it (the real broker's
    * behavior in a SASL listener). */
  private final class KafkaStubBroker(sasl: Option[(String, String)] = None,
                                      scram: Option[(String, String)] = None)
      extends AutoCloseable {
    // fixed server-side SCRAM parameters (a real broker stores these
    // per-user in ZooKeeper/KRaft; the verification algebra is what
    // matters here)
    private val ScramSaltB64 = "c3R1Yi1zYWx0LTEyMzQ1Ng==" // "stub-salt-123456"
    private val ScramIterations = 4096
    @volatile private var server = new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
    val port: Int = server.getLocalPort
    // (topic, partition) -> append log of (timestamp, key, value)
    private val logs = scala.collection.mutable.Map
      .empty[(String, Int), scala.collection.mutable.ArrayBuffer[KafkaWire.Record]]
    private val liveConns =
      new java.util.concurrent.CopyOnWriteArrayList[java.net.Socket]()
    @volatile private var closed = false

    /** Chaos hook: drop the listener AND every live connection, keeping
      * the logs — the disk of a crashed broker. */
    def kill(): Unit = {
      server.close()
      liveConns.forEach(s => try s.close() catch { case _: java.io.IOException => () })
      liveConns.clear()
    }

    /** Rebind the SAME port (the restarted broker clients redial). */
    def restart(): Unit = {
      server = WireTestUtil.rebind(port)
      startAcceptor()
    }

    def logSize(topic: String, p: Int): Int =
      synchronized(logs.get((topic, p)).map(_.length).getOrElse(0))

    private def log(topic: String, p: Int) = synchronized(
      logs.getOrElseUpdate((topic, p),
        scala.collection.mutable.ArrayBuffer.empty[KafkaWire.Record]))

    private def handle(apiKey: Int, version: Int, body: ByteBuffer, resp: W): Unit =
      apiKey match {
        case Api.ApiVersions =>
          require(version == 0, s"stub: ApiVersions v$version")
          resp.i16(0).i32(4)
          resp.i16(Api.Produce).i16(0).i16(3)
          resp.i16(Api.Fetch).i16(0).i16(4)
          resp.i16(Api.ListOffsets).i16(0).i16(1)
          resp.i16(Api.Metadata).i16(0).i16(1)
        case Api.Metadata =>
          require(version == 1, s"stub: Metadata v$version")
          val nt = R.i32(body); require(nt == 1)
          val topic = R.str(body)
          resp.i32(1).i32(0).str("127.0.0.1").i32(port).nstr(null) // broker 0
          resp.i32(0) // controller
          resp.i32(1) // topics
          resp.i16(0).str(topic).i8(0)
          resp.i32(1) // partitions
          resp.i16(0).i32(0).i32(0) // err, partition 0, leader 0
          resp.i32(1).i32(0)        // replicas [0]
          resp.i32(1).i32(0)        // isr [0]
        case Api.ListOffsets =>
          require(version == 1, s"stub: ListOffsets v$version")
          R.i32(body) // replica
          val nt = R.i32(body); require(nt == 1)
          val topic = R.str(body)
          val np = R.i32(body); require(np == 1)
          val p = R.i32(body)
          val ts = R.i64(body); require(ts == -1L, "stub: latest only")
          resp.i32(1).str(topic).i32(1)
          resp.i32(p).i16(0).i64(-1L).i64(log(topic, p).length.toLong)
        case Api.Produce =>
          require(version == 3, s"stub: Produce v$version")
          R.nstr(body); R.i16(body); R.i32(body) // txn, acks, timeout
          val nt = R.i32(body); require(nt == 1)
          val topic = R.str(body)
          val np = R.i32(body); require(np == 1)
          val p = R.i32(body)
          val set = R.bytesF(body)
          // decode = CRC32C + magic + varint framing verified broker-side
          val recs = Batch.decode(set)
          val l = log(topic, p)
          val base = synchronized {
            val b = l.length.toLong
            recs.foreach(r => l += KafkaWire.Record(b + (r.offset - recs.head.offset),
              r.timestamp, r.key, r.value))
            b
          }
          resp.i32(1).str(topic).i32(1)
          resp.i32(p).i16(0).i64(base).i64(-1L)
          resp.i32(0) // throttle
        case Api.Fetch =>
          require(version == 4, s"stub: Fetch v$version")
          R.i32(body); R.i32(body); R.i32(body); R.i32(body); R.i8(body)
          val nt = R.i32(body); require(nt == 1)
          val topic = R.str(body)
          val np = R.i32(body); require(np == 1)
          val p = R.i32(body)
          val off = R.i64(body); R.i32(body)
          val l = log(topic, p)
          val hw = l.length.toLong
          resp.i32(0) // throttle
          resp.i32(1).str(topic).i32(1)
          resp.i32(p).i16(0).i64(hw).i64(hw).i32(0)
          val slice = synchronized(l.drop(off.toInt).toList)
          if (slice.isEmpty) resp.i32(-1) // null record set
          else {
            // one batch per record: preserves per-record timestamps and
            // exercises the client's multi-batch record-set decode
            val setW = new W
            slice.foreach(r =>
              setW.raw(Batch.encode(r.offset, r.timestamp, Seq((r.key, r.value)))))
            resp.bytesF(setW.result)
          }
        case other => throw new IllegalStateException(s"stub: api $other")
      }

    private def startAcceptor(): Unit = {
      val srv = server
      val acceptor = new Thread(() => {
        try while (!closed) {
          val s = srv.accept()
          liveConns.add(s)
          val t = new Thread(() => {
            val in = new DataInputStream(new BufferedInputStream(s.getInputStream))
            val out = new DataOutputStream(new BufferedOutputStream(s.getOutputStream))
            var authed = sasl.isEmpty && scram.isEmpty // per-connection
            val offered =
              (if (sasl.isDefined) Seq("PLAIN") else Nil) ++
                (if (scram.isDefined) Seq("SCRAM-SHA-256") else Nil)
            var negotiated: String = null
            // SCRAM per-connection exchange state
            var scramFirstBare: String = null
            var scramServerFirst: String = null
            try while (!closed) {
              val size = in.readInt()
              val frame = new Array[Byte](size); in.readFully(frame)
              val b = ByteBuffer.wrap(frame)
              val apiKey = R.i16(b); val version = R.i16(b)
              val corr = R.i32(b); R.nstr(b) // client id
              val resp = new W
              resp.i32(corr)
              apiKey match {
                case Api.SaslHandshake =>
                  require(version == 1, s"stub: SaslHandshake v$version")
                  val mech = R.str(b)
                  // err 33 = UNSUPPORTED_SASL_MECHANISM; list what we serve
                  if (offered.contains(mech)) { negotiated = mech; resp.i16(0) }
                  else resp.i16(33)
                  resp.i32(offered.size); offered.foreach(resp.str)
                case Api.SaslAuthenticate if negotiated == "SCRAM-SHA-256" =>
                  require(version == 0, s"stub: SaslAuthenticate v$version")
                  val msg = new String(R.bytesF(b), UTF_8)
                  val (user, pass) = scram.get
                  if (scramServerFirst == null) {
                    // client-first: gs2 "n,," + bare
                    require(msg.startsWith("n,,"), s"stub: expected n,, gs2: $msg")
                    scramFirstBare = msg.stripPrefix("n,,")
                    val attrs = scramFirstBare.split(",").map(kv =>
                      kv.charAt(0) -> kv.substring(2)).toMap
                    if (attrs('n') != Scram.saslName(user))
                      resp.i16(58).nstr("unknown user").bytesF(Array.empty[Byte])
                    else {
                      scramServerFirst = s"r=${attrs('r')}stubSrvNonce," +
                        s"s=$ScramSaltB64,i=$ScramIterations"
                      resp.i16(0).nstr(null)
                        .bytesF(scramServerFirst.getBytes(UTF_8))
                    }
                  } else {
                    // client-final: verify the proof with the server-side
                    // algebra (StoredKey only — the password-equivalent a
                    // real broker stores), answer with the v= signature
                    val pIdx = msg.lastIndexOf(",p=")
                    val withoutProof = msg.substring(0, pIdx)
                    val proof = java.util.Base64.getDecoder
                      .decode(msg.substring(pIdx + 3))
                    val salted = Scram.saltedPassword(pass, ScramSaltB64,
                      ScramIterations)
                    val storedKey = Scram.h(Scram.clientKey(salted))
                    val authMsg = (scramFirstBare + "," + scramServerFirst +
                      "," + withoutProof).getBytes(UTF_8)
                    val clientSig = Scram.hmac(storedKey, authMsg)
                    val recoveredKey = proof.zip(clientSig)
                      .map { case (x, y) => (x ^ y).toByte }
                    if (java.util.Arrays.equals(Scram.h(recoveredKey), storedKey)) {
                      authed = true
                      val v = java.util.Base64.getEncoder.encodeToString(
                        Scram.hmac(Scram.serverKey(salted), authMsg))
                      resp.i16(0).nstr(null).bytesF(s"v=$v".getBytes(UTF_8))
                    } else
                      resp.i16(58).nstr("invalid proof").bytesF(Array.empty[Byte])
                  }
                case Api.SaslAuthenticate =>
                  require(version == 0, s"stub: SaslAuthenticate v$version")
                  val parts = new String(R.bytesF(b), UTF_8).split("\u0000", -1)
                  require(parts.length == 3, "stub: malformed PLAIN token")
                  if (sasl.contains((parts(1), parts(2)))) {
                    authed = true
                    resp.i16(0).nstr(null).bytesF(Array.empty[Byte])
                  } else // err 58 = SASL_AUTHENTICATION_FAILED
                    resp.i16(58).nstr("invalid credentials").bytesF(Array.empty[Byte])
                case _ =>
                  // a SASL listener closes unauthenticated connections
                  require(authed, "stub: request before SASL auth")
                  handle(apiKey, version, b, resp)
              }
              val rb = resp.result
              out.writeInt(rb.length); out.write(rb); out.flush()
            } catch { case _: java.io.IOException => () }
            finally {
              // covers the auth-violation require too: the broker CUTS
              // an unauthenticated connection — leaving the socket open
              // would park the client forever on its response read
              try s.close() catch { case _: java.io.IOException => () }
            }
          }, "kafka-stub-conn")
          t.setDaemon(true)
          t.start()
        } catch { case _: java.io.IOException => () }
      }, "kafka-stub-acceptor")
      acceptor.setDaemon(true)
      acceptor.start()
    }
    startAcceptor()

    def close(): Unit = { closed = true; kill() }
  }

  test("record batch v2 layout pins: magic, batchLength, independent CRC32C") {
    val batch = Batch.encode(7L, 1234L,
      Seq(("k".getBytes(UTF_8), "v".getBytes(UTF_8)), (null, Array[Byte](0, 1))))
    val b = ByteBuffer.wrap(batch)
    assert(b.getLong(0) === 7L)                       // baseOffset
    assert(b.getInt(8) === batch.length - 12)         // batchLength covers the rest
    assert(b.getInt(12) === 0)                        // partitionLeaderEpoch
    assert(batch(16) === 2.toByte)                    // magic v2
    val crcStored = b.getInt(17) & 0xffffffffL
    val covered = java.util.Arrays.copyOfRange(batch, 21, batch.length)
    assert(crcStored === crc32cRef(covered),
      "batch CRC32C != independent bit-level CRC32C of attributes..end")
    // and a round-trip decode reproduces the records
    val recs = Batch.decode(batch)
    assert(recs.map(_.offset) === Seq(7L, 8L))
    assert(new String(recs.head.key, UTF_8) === "k")
    assert(recs(1).key === null)
    assert(recs(1).value.toSeq === Seq[Byte](0, 1))
  }

  test("a corrupted record batch is rejected by the checksum on decode") {
    val batch = Batch.encode(0L, 1L, Seq((null, "payload".getBytes(UTF_8))))
    batch(batch.length - 1) = (batch(batch.length - 1) ^ 0x20).toByte
    val e = intercept[IllegalArgumentException](Batch.decode(batch))
    assert(e.getMessage.contains("CRC32C"))
  }

  test("produce → metadata → log-end → fetch, binary-safe, over a live socket") {
    val broker = new KafkaStubBroker
    val conn = new KafkaWire.Conn("127.0.0.1", broker.port)
    try {
      val vs = conn.apiVersions()
      assert(vs(Api.Produce)._2 >= 3 && vs(Api.Fetch)._2 >= 4)
      assert(conn.partitionsOf("t.docs") === Seq(0))
      val binary = Array.tabulate(256)(i => i.toByte)
      val base1 = conn.produce("t.docs", 0,
        Seq(("k0".getBytes(UTF_8), "a".getBytes(UTF_8)), (null, binary)), baseTs = 111L)
      val base2 = conn.produce("t.docs", 0,
        Seq(("k2".getBytes(UTF_8), "c".getBytes(UTF_8))), baseTs = 222L)
      assert(base1 === 0L && base2 === 2L) // broker-assigned, receipt-confirmed
      assert(conn.logEndOffset("t.docs", 0) === 3L)
      val (hw, recs) = conn.fetch("t.docs", 0, 0L)
      assert(hw === 3L)
      assert(recs.map(_.offset) === Seq(0L, 1L, 2L))
      assert(recs(1).key === null)
      assert(recs(1).value.toSeq === binary.toSeq)
      assert(recs(2).timestamp === 222L)
      // replay from an arbitrary retained offset — the log IS the state
      val (_, tail) = conn.fetch("t.docs", 0, 2L)
      assert(tail.map(r => new String(r.value, UTF_8)) === Seq("c"))
    } finally { conn.close(); broker.close() }
  }

  test("the GraftSource adapter reads, replays, and reports lag over the wire") {
    val broker = new KafkaStubBroker
    val conn = new KafkaWire.Conn("127.0.0.1", broker.port)
    try {
      conn.produce("t.src", 0, (0 until 5).map(i =>
        (s"k$i".getBytes(UTF_8), s"v$i".getBytes(UTF_8))), baseTs = 1000L)
      val src = new KafkaWire.Source(conn, "t.src")
      assert(src.latestOffset(0) === 5L)
      val first = src.read(0, 0L, 3L).toList
      assert(first.map(_.offset) === Seq(0L, 1L, 2L))
      assert(first.map(_.keys.head) === Seq("k0", "k1", "k2"))
      src.ack(0, 3L)
      assert(src.pending === 2L)
      // a restart re-reads the same window bit-for-bit (log-backed replay)
      val again = src.read(0, 1L, 3L).toList
      assert(again.map(r => new String(r.value, UTF_8)) === Seq("v1", "v2"))
    } finally { conn.close(); broker.close() }
  }

  test("gzip batches: codec bit set, records span compressed, decode round-trips") {
    val records = (0 until 40).map(i =>
      (s"key$i".getBytes(UTF_8), (s"value$i " * 8).getBytes(UTF_8)))
    val plain = Batch.encode(0L, 777L, records)
    val packed = Batch.encode(0L, 777L, records, Batch.CodecGzip)
    // attributes (bits 0-2) carry the codec; repetitive records compress
    val attrOff = 8 + 4 + 4 + 1 + 4
    assert((plain(attrOff + 1) & 0x7) === Batch.CodecNone)
    assert((packed(attrOff + 1) & 0x7) === Batch.CodecGzip)
    assert(packed.length < plain.length,
      s"gzip should shrink repetitive records (${packed.length} vs ${plain.length})")
    // recordCount stays OUTSIDE the compressed span (the documented layout)
    val cntOff = attrOff + 2 + 4 + 8 + 8 + 8 + 2 + 4
    val cnt = java.nio.ByteBuffer.wrap(packed, cntOff, 4).getInt
    assert(cnt === 40)
    // decode reproduces the plain decode exactly
    val a = Batch.decode(plain); val b = Batch.decode(packed)
    assert(a.map(_.offset) === b.map(_.offset))
    assert(a.map(_.timestamp) === b.map(_.timestamp))
    assert(a.zip(b).forall { case (x, y) =>
      x.key.toSeq == y.key.toSeq && x.value.toSeq == y.value.toSeq })
    // the CRC covers the COMPRESSED bytes — flipping one packed byte dies
    val corrupt = packed.clone(); corrupt(packed.length - 1) =
      (corrupt(packed.length - 1) ^ 1).toByte
    val e = intercept[IllegalArgumentException](Batch.decode(corrupt))
    assert(e.getMessage.contains("CRC32C"))
    // an unimplemented codec fails loudly, never silently misparses:
    // set codec=4 (zstd) and re-stamp the CRC over attributes..end so
    // only the codec check can fire (crc sits at bytes 17-20)
    val badCodec = plain.clone()
    badCodec(attrOff + 1) = (badCodec(attrOff + 1) | 4).toByte
    val covered = java.util.Arrays.copyOfRange(badCodec, attrOff, badCodec.length)
    val c2 = new java.util.zip.CRC32C(); c2.update(covered)
    java.nio.ByteBuffer.wrap(badCodec).putInt(17, c2.getValue.toInt)
    val e2 = intercept[IllegalArgumentException](Batch.decode(badCodec))
    assert(e2.getMessage.contains("codec"))
  }

  test("gzip produce travels the wire: the stub broker decodes and fetch replays") {
    val broker = new KafkaStubBroker
    val conn = new KafkaWire.Conn("127.0.0.1", broker.port)
    try {
      conn.produce("t.gz", 0, (0 until 6).map(i =>
          (s"k$i".getBytes(UTF_8), (s"payload$i " * 4).getBytes(UTF_8))),
        baseTs = 555L, codec = Batch.CodecGzip)
      assert(conn.logEndOffset("t.gz", 0) === 6L)
      val (hw, recs) = conn.fetch("t.gz", 0, 0L)
      assert(hw === 6L)
      assert(recs.map(r => new String(r.key, UTF_8)) ===
        (0 until 6).map(i => s"k$i"))
      assert(new String(recs(3).value, UTF_8) === "payload3 " * 4)
    } finally { conn.close(); broker.close() }
  }

  test("chaos: broker dies mid-consume, restarts, and the SAME source refetches " +
      "from the committed offset with no loss") {
    val broker = new KafkaStubBroker
    val conn = new KafkaWire.Conn("127.0.0.1", broker.port)
    try {
      conn.produce("t.chaos", 0, (0 until 6).map(i =>
        (s"k$i".getBytes(UTF_8), s"v$i".getBytes(UTF_8))), baseTs = 1L)
      val src = new KafkaWire.Source(conn, "t.chaos")
      val first = src.read(0, 0L, 3L).toList
      assert(first.map(_.offset) === Seq(0L, 1L, 2L))
      src.ack(0, 3L) // the engine's committed position
      // kill every socket out from under the live connection, then
      // bring the broker back on the same port with the log intact
      broker.kill()
      broker.restart()
      // the SAME Conn/Source instance resumes from the committed offset:
      // the first call inside read() hits the dead socket, redials, and
      // replays — no records lost, none duplicated past the offset floor
      val resumed = src.read(0, 3L, 6L).toList
      assert(resumed.map(_.offset) === Seq(3L, 4L, 5L))
      assert(resumed.map(r => new String(r.value, UTF_8)) === Seq("v3", "v4", "v5"))
      assert(src.latestOffset(0) === 6L)
      // and produce keeps working on the recovered socket
      conn.produce("t.chaos", 0,
        Seq(("k6".getBytes(UTF_8), "v6".getBytes(UTF_8))), baseTs = 2L)
      assert(src.read(0, 6L, 7L).toList.map(_.offset) === Seq(6L))
    } finally { conn.close(); broker.close() }
  }

  test("SASL/PLAIN: authenticated round-trip; auth survives a broker-death " +
      "redial; unauthenticated connections are cut") {
    val broker = new KafkaStubBroker(sasl = Some(("svc-graft", "s3cr3t")))
    val conn = new KafkaWire.Conn("127.0.0.1", broker.port,
      saslPlain = Some(("svc-graft", "s3cr3t")))
    try {
      val base = conn.produce("t.sasl", 0,
        Seq(("k".getBytes(UTF_8), "v".getBytes(UTF_8))), baseTs = 1L)
      assert(base === 0L)
      // redial path re-authenticates: kill + restart, then the replayed
      // request must pass SASL again on the fresh socket (and the
      // correlation check must tolerate the SASL exchange's spent ids)
      broker.kill(); broker.restart()
      val (_, recs) = conn.fetch("t.sasl", 0, 0L)
      assert(recs.map(r => new String(r.value, UTF_8)) === Seq("v"))
      // a connection that skips SASL is cut by the broker on its first
      // ordinary request (the SASL-listener contract)
      val bare = new KafkaWire.Conn("127.0.0.1", broker.port)
      try intercept[java.io.IOException](bare.apiVersions())
      finally bare.close()
    } finally { conn.close(); broker.close() }
  }

  test("SASL/PLAIN: wrong password fails loudly at connect") {
    val broker = new KafkaStubBroker(sasl = Some(("svc-graft", "s3cr3t")))
    try {
      val e = intercept[IllegalArgumentException](
        new KafkaWire.Conn("127.0.0.1", broker.port,
          saslPlain = Some(("svc-graft", "wrong"))))
      assert(e.getMessage.contains("SASL authentication failed"))
    } finally broker.close()
  }

  test("SCRAM-SHA-256: full challenge-response against a verifying stub — " +
      "proof checked server-side, v= signature checked client-side, then " +
      "an authed produce→fetch round-trip; re-auth survives a redial") {
    val broker = new KafkaStubBroker(scram = Some(("svc-graft", "pencil")))
    val conn = new KafkaWire.Conn("127.0.0.1", broker.port,
      saslScramSha256 = Some(("svc-graft", "pencil")))
    try {
      val base = conn.produce("t.scram", 0,
        Seq(("k".getBytes(UTF_8), "v".getBytes(UTF_8))), baseTs = 1L)
      assert(base === 0L)
      broker.kill(); broker.restart()
      // the redial re-runs the whole SCRAM exchange (fresh nonces)
      val (_, recs) = conn.fetch("t.scram", 0, 0L)
      assert(recs.map(r => new String(r.value, UTF_8)) === Seq("v"))
    } finally { conn.close(); broker.close() }
  }

  test("SCRAM-SHA-256: wrong password fails at the proof, loudly") {
    val broker = new KafkaStubBroker(scram = Some(("svc-graft", "pencil")))
    try {
      val e = intercept[IllegalArgumentException](
        new KafkaWire.Conn("127.0.0.1", broker.port,
          saslScramSha256 = Some(("svc-graft", "crayon"))))
      assert(e.getMessage.contains("SCRAM authentication failed"))
    } finally broker.close()
  }
}
