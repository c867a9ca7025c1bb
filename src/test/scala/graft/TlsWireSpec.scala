package graft

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.nio.file.Files

import graft.streaming.{NatsWire, SigV4, SqsWire, Tls}
import org.scalatest.funsuite.AnyFunSuite

/** TLS for the wire clients, proven on a real loopback TLS listener
  * (conformance-matrix TLS column): a self-signed keypair is generated
  * by `keytool` at test time, a stub NATS broker serves the text
  * protocol over an SSLServerSocket, and [[NatsWire]] runs a full
  * subscribe → publish → MSG round-trip through
  * [[Tls.socketFactory]] — the SAME injectable seam Kafka, Pulsar, and
  * JetStream clients take. Negative paths are loud: a client that does
  * not trust the cert fails at handshake, and the SQS HTTPS test covers
  * the HttpsURLConnection trust-injection variant. */
class TlsWireSpec extends AnyFunSuite {

  // ---- one self-signed keypair per suite run, via the JDK's keytool ----
  private lazy val (keystore, truststore, storePass) = {
    val dir = Files.createTempDirectory("graft-tls")
    val ks = dir.resolve("server.p12").toString
    val cert = dir.resolve("server.crt").toString
    val ts = dir.resolve("trust.p12").toString
    val pw = "graft-test"
    def run(args: String*): Unit = {
      val p = new ProcessBuilder(("keytool" +: args): _*)
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(), UTF_8)
      require(p.waitFor() == 0, s"keytool ${args.head} failed:\n$out")
    }
    // SAN is mandatory: HttpsURLConnection's hostname verification (and
    // any modern stack) ignores the CN — a SAN-less cert fails with "No
    // subject alternative names present" even when the CA is trusted
    run("-genkeypair", "-alias", "graft", "-keyalg", "RSA", "-keysize", "2048",
      "-validity", "1", "-dname", "CN=localhost",
      "-ext", "SAN=dns:localhost,ip:127.0.0.1", "-keystore", ks,
      "-storetype", "PKCS12", "-storepass", pw, "-keypass", pw)
    run("-exportcert", "-alias", "graft", "-keystore", ks,
      "-storepass", pw, "-file", cert)
    // a separate truststore with the cert as a trustedCertEntry — the
    // PKIX trust manager ignores private-key entries, so trusting the
    // keystore directly would NOT work
    run("-importcert", "-alias", "graft", "-file", cert, "-keystore", ts,
      "-storetype", "PKCS12", "-storepass", pw, "-noprompt")
    (ks, ts, pw)
  }

  /** Minimal NATS-ish broker over an SSLServerSocket: INFO → CONNECT/SUB
    * (tracked) → PUB routed to matching SUBs → PING answered. */
  private final class TlsNatsStub extends AutoCloseable {
    private val server = Tls.serverContext(keystore, storePass)
      .getServerSocketFactory.createServerSocket(0)
    val port: Int = server.getLocalPort
    private val subs = new java.util.concurrent.CopyOnWriteArrayList[
      (String, java.io.OutputStream, String)]()
    @volatile private var closed = false

    private def readLine(in: java.io.InputStream): String = {
      val sb = new java.lang.StringBuilder(64)
      var c = in.read()
      while (c != -1 && c != '\r') { sb.append(c.toChar); c = in.read() }
      if (c == -1) throw new java.io.EOFException()
      in.read()
      sb.toString
    }

    private val acceptor = new Thread(() => {
      try while (!closed) {
        val sock = server.accept()
        val t = new Thread(() => {
          try {
            val in = new java.io.BufferedInputStream(sock.getInputStream)
            val out = new java.io.BufferedOutputStream(sock.getOutputStream)
            out.write("INFO {\"server_id\":\"tls-stub\",\"tls_required\":true}\r\n"
              .getBytes(ISO_8859_1)); out.flush()
            while (!closed) {
              val line = readLine(in)
              val parts = line.split(" ")
              parts(0) match {
                case "PING" => out.synchronized {
                  out.write("PONG\r\n".getBytes(ISO_8859_1)); out.flush() }
                case "SUB" => subs.add((parts(1), out, parts(2)))
                case "PUB" =>
                  val n = parts.last.toInt
                  val body = new Array[Byte](n)
                  var off = 0
                  while (off < n) {
                    val r = in.read(body, off, n - off); require(r >= 0); off += r
                  }
                  in.read(); in.read()
                  subs.forEach { case (s, o, sid) =>
                    if (s == parts(1)) o.synchronized {
                      o.write(s"MSG ${parts(1)} $sid $n\r\n".getBytes(ISO_8859_1))
                      o.write(body); o.write("\r\n".getBytes(ISO_8859_1)); o.flush()
                    }
                  }
                case _ => ()
              }
            }
          } catch { case _: java.io.IOException => () }
          finally { try sock.close() catch { case _: java.io.IOException => () } }
        }, "tls-stub-conn")
        t.setDaemon(true); t.start()
      } catch { case _: java.io.IOException => () }
    }, "tls-stub-acceptor")
    acceptor.setDaemon(true)
    acceptor.start()

    def close(): Unit = { closed = true; server.close() }
  }

  test("full NATS round-trip over TLS 1.3: subscribe, publish, MSG — the " +
      "socket-factory seam every wire client shares") {
    val broker = new TlsNatsStub
    try {
      val factory = Tls.socketFactory(
        Tls.clientContext(Some(truststore -> storePass)))
      val sub = new NatsWire.Subscription("localhost", broker.port, "tls.subj",
        socketFactory = factory)
      try {
        NatsWire.publish("localhost", broker.port, "tls.subj",
          Seq("over-tls".getBytes(ISO_8859_1)), socketFactory = factory)
        val deadline = System.currentTimeMillis() + 5000
        var got = sub.drain()
        while (got.isEmpty && System.currentTimeMillis() < deadline) {
          Thread.sleep(20); got = sub.drain()
        }
        assert(got.map(new String(_, ISO_8859_1)) == Seq("over-tls"))
      } finally sub.close()
    } finally broker.close()
  }

  test("a client that does not trust the broker cert fails AT HANDSHAKE") {
    val broker = new TlsNatsStub
    try {
      // default JDK CAs: the self-signed cert is not among them
      val untrusting = Tls.socketFactory(Tls.clientContext(None))
      intercept[javax.net.ssl.SSLHandshakeException](
        untrusting("localhost", broker.port))
    } finally broker.close()
  }

  test("SQS over HTTPS with an injected trust (HttpsURLConnection seam); " +
      "the default trust refuses the self-signed endpoint") {
    val ctx = Tls.serverContext(keystore, storePass)
    val server = com.sun.net.httpserver.HttpsServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.setHttpsConfigurator(new com.sun.net.httpserver.HttpsConfigurator(ctx))
    server.createContext("/", { exchange =>
      exchange.getRequestBody.readAllBytes()
      val resp = ("<ReceiveMessageResponse><ReceiveMessageResult><Message>" +
        "<MessageId>m1</MessageId><ReceiptHandle>r1</ReceiptHandle>" +
        "<Body>tls-body</Body></Message>" +
        "</ReceiveMessageResult></ReceiveMessageResponse>").getBytes(UTF_8)
      exchange.sendResponseHeaders(200, resp.length)
      exchange.getResponseBody.write(resp)
      exchange.close()
    })
    server.start()
    // localhost in the URL: HttpsURLConnection hostname-verifies against
    // the certificate's SAN (dns:localhost above)
    val url = s"https://localhost:${server.getAddress.getPort}/123/q"
    try {
      val clientCtx = Tls.clientContext(Some(truststore -> storePass))
      val wire = new SqsWire(url,
        credentials = Some(SigV4.Credentials("AKIDEXAMPLE", "secret")),
        clock = () => java.time.Instant.parse("2015-08-30T12:36:00Z"),
        sslSocketFactory = Some(clientCtx.getSocketFactory))
      val got = wire.receive(1)
      assert(got.map(m => new String(m._3, UTF_8)) == Seq("tls-body"))
      // default trust: self-signed endpoint refused, loudly
      val bare = new SqsWire(url)
      intercept[javax.net.ssl.SSLHandshakeException](bare.receive(1))
    } finally server.stop(0)
  }
}
