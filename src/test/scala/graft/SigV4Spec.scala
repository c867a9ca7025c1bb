package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.streaming.{SigV4, SqsWire}
import org.scalatest.funsuite.AnyFunSuite

/** External conformance for the SigV4 implementation — the
  * WireConformanceSpec method: golden values from the PUBLISHED
  * specification's own worked example (the IAM ListUsers request and
  * the derived-key chain), not a self-consistent round-trip. Then a
  * signed end-to-end: SqsWire with credentials against an in-process
  * stub that independently recomputes the expected signature over the
  * exact bytes it received. */
class SigV4Spec extends AnyFunSuite {

  private val DocsSecret = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"

  test("derived signing key matches the specification's published hex") {
    // the documented worked example: 20150830 / us-east-1 / iam
    val key = SigV4.signingKey(DocsSecret, "20150830", "us-east-1", "iam")
    assert(SigV4.hex(key) ==
      "c4afb1cc5771d871763a393e44b703571b55cc28424d1a5e86da6ed3c154a4b9")
  }

  test("canonical request + string to sign + signature reproduce the " +
      "published IAM ListUsers example") {
    val emptyPayloadHash = SigV4.sha256Hex(Array.empty[Byte])
    assert(emptyPayloadHash ==
      "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855")
    val canon = SigV4.canonicalRequest(
      method = "GET", path = "/",
      query = Seq("Action" -> "ListUsers", "Version" -> "2010-05-08"),
      headers = Map(
        "content-type" -> "application/x-www-form-urlencoded; charset=utf-8",
        "host" -> "iam.amazonaws.com",
        "x-amz-date" -> "20150830T123600Z"),
      payloadHash = emptyPayloadHash)
    assert(SigV4.sha256Hex(canon.getBytes(UTF_8)) ==
      "f536975d06c0309214f805bb90ccff089219ecd68b2577efef23edd43b7e1a59",
      s"canonical request drifted from the published form:\n$canon")
    val sts = SigV4.stringToSign("20150830T123600Z",
      "20150830/us-east-1/iam/aws4_request", canon)
    val key = SigV4.signingKey(DocsSecret, "20150830", "us-east-1", "iam")
    assert(SigV4.hex(SigV4.hmacSha256(key, sts)) ==
      "5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
  }

  test("signRequest produces the published Authorization header end-to-end") {
    val headers = SigV4.signRequest(
      method = "GET", url = "https://iam.amazonaws.com/",
      query = Seq("Action" -> "ListUsers", "Version" -> "2010-05-08"),
      extraHeaders = Map(
        "content-type" -> "application/x-www-form-urlencoded; charset=utf-8"),
      payload = Array.empty[Byte],
      creds = SigV4.Credentials("AKIDEXAMPLE", DocsSecret),
      region = "us-east-1", service = "iam",
      at = java.time.Instant.parse("2015-08-30T12:36:00Z"))
    assert(headers("x-amz-date") == "20150830T123600Z")
    assert(headers("Authorization") ==
      "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/iam/" +
        "aws4_request, SignedHeaders=content-type;host;x-amz-date, " +
        "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
  }

  test("uriEncode follows the strict RFC 3986 rule (unreserved set, " +
      "uppercase hex, optional slash passthrough)") {
    assert(SigV4.uriEncode("AZaz09-._~") == "AZaz09-._~")
    assert(SigV4.uriEncode("a b+c") == "a%20b%2Bc")
    assert(SigV4.uriEncode("/path/x", encodeSlash = false) == "/path/x")
    assert(SigV4.uriEncode("/path/x") == "%2Fpath%2Fx")
    assert(SigV4.uriEncode("é") == "%C3%A9") // multi-byte UTF-8
  }

  test("canonical URI double-encodes path segments (the non-S3 rule)") {
    // a path with a space canonicalizes to %2520 (encode twice), and an
    // unreserved-only path is untouched — the reason the published IAM
    // vector (path "/") stays valid
    val canon = SigV4.canonicalRequest("GET", "/a b/q", Seq.empty,
      Map("host" -> "example.com"), SigV4.sha256Hex(Array.empty[Byte]))
    assert(canon.linesIterator.toSeq(1) == "/a%2520b/q")
    val plain = SigV4.canonicalRequest("GET", "/123456789012/graft-q",
      Seq.empty, Map("host" -> "example.com"),
      SigV4.sha256Hex(Array.empty[Byte]))
    assert(plain.linesIterator.toSeq(1) == "/123456789012/graft-q")
  }

  test("session token is signed along and emitted as x-amz-security-token") {
    val headers = SigV4.signRequest(
      method = "POST", url = "https://sqs.us-east-1.amazonaws.com/1/q",
      query = Seq.empty, extraHeaders = Map.empty,
      payload = "Action=ReceiveMessage".getBytes(UTF_8),
      creds = SigV4.Credentials("AKIDEXAMPLE", DocsSecret, Some("TOKEN")),
      region = "us-east-1", service = "sqs",
      at = java.time.Instant.parse("2015-08-30T12:36:00Z"))
    assert(headers("x-amz-security-token") == "TOKEN")
    assert(headers("Authorization").contains(
      "SignedHeaders=host;x-amz-date;x-amz-security-token"))
  }

  test("SqsWire signs ReceiveMessage and SendMessageBatch over the exact " +
      "wire bytes (stub recomputes the signature independently)") {
    val creds = SigV4.Credentials("AKIDEXAMPLE", DocsSecret)
    val at = java.time.Instant.parse("2015-08-30T12:36:00Z")
    val region = "us-east-1"
    @volatile var failures = List.empty[String]
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val port = server.getAddress.getPort
    val queueUrl = s"http://127.0.0.1:$port/123456789012/graft-q"
    server.createContext("/", { exchange =>
      val body = exchange.getRequestBody.readAllBytes()
      val auth = exchange.getRequestHeaders.getFirst("Authorization")
      val contentType = exchange.getRequestHeaders.getFirst("Content-Type")
      // recompute over what actually ARRIVED — any drift between the
      // signed bytes/headers and the sent ones breaks this equality
      val expected = SigV4.signRequest("POST", queueUrl, Seq.empty,
        Map("content-type" -> contentType), body, creds, region, "sqs", at)
      if (auth != expected("Authorization"))
        failures ::= s"signature mismatch:\n got $auth\n want ${expected("Authorization")}"
      if (exchange.getRequestHeaders.getFirst("x-amz-date") != "20150830T123600Z")
        failures ::= "x-amz-date header missing or wrong"
      val params = SqsWire.formDecode(new String(body, UTF_8))
      val resp = params("Action") match {
        case "ReceiveMessage" =>
          "<ReceiveMessageResponse><ReceiveMessageResult><Message>" +
            "<MessageId>m1</MessageId><ReceiptHandle>r1</ReceiptHandle>" +
            "<Body>hello</Body></Message>" +
            "</ReceiveMessageResult></ReceiveMessageResponse>"
        case "SendMessageBatch" =>
          "<SendMessageBatchResponse><SendMessageBatchResult>" +
            "</SendMessageBatchResult></SendMessageBatchResponse>"
        case other => s"<UnknownOperation>$other</UnknownOperation>"
      }
      val bytes = resp.getBytes(UTF_8)
      exchange.sendResponseHeaders(200, bytes.length)
      exchange.getResponseBody.write(bytes)
      exchange.close()
    })
    server.start()
    try {
      val wire = new SqsWire(queueUrl, credentials = Some(creds),
        region = region, clock = () => at)
      val got = wire.receive(1)
      assert(got.map(m => new String(m._3, UTF_8)) == Seq("hello"))
      wire.send(Seq("payload-1".getBytes(UTF_8)))
      assert(failures.isEmpty, failures.mkString("\n"))
    } finally server.stop(0)
  }
}
