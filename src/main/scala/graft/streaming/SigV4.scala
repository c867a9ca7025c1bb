package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

/** AWS Signature Version 4 request signing, implemented from the public
  * specification with JDK crypto only (HmacSHA256 + SHA-256) — the auth
  * half the [[SqsWire]] transport was missing (r14 verdict #5: the only
  * conformance-matrix auth gap implementable without external jars; the
  * reference's SQS source signs through the official SDK,
  * `rust/extns/numaflow-sqs/src/source.rs`).
  *
  * The algorithm (documented, stable since 2014):
  *  1. canonical request = method \n uri \n query \n canonical-headers
  *     \n signed-headers \n hex(sha256(payload)) — headers lowercased,
  *     trimmed, sorted; query params percent-encoded (RFC 3986
  *     unreserved set, uppercase hex) and sorted by name then value;
  *  2. string to sign = "AWS4-HMAC-SHA256" \n timestamp \n scope \n
  *     hex(sha256(canonical request)), scope =
  *     date/region/service/aws4_request;
  *  3. signing key = HMAC-chain "AWS4"+secret → date → region →
  *     service → "aws4_request";
  *  4. signature = hex(HMAC(signing key, string to sign)), carried in
  *     the Authorization header.
  *
  * SigV4Spec pins this against the specification's own published
  * worked-example vectors (the derived-key hex and the IAM ListUsers
  * request signature) — the WireConformanceSpec method: external golden
  * bytes, not a self-consistent round-trip. */
object SigV4 {

  final case class Credentials(accessKeyId: String, secretAccessKey: String,
                               sessionToken: Option[String] = None)

  private val Unreserved: Set[Char] =
    (('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '9') ++ "-._~").toSet

  /** RFC 3986 strict percent-encoding (uppercase hex), the SigV4 rule
    * for query names/values and non-slash path chars. */
  def uriEncode(s: String, encodeSlash: Boolean = true): String = {
    val b = new StringBuilder
    s.getBytes(UTF_8).foreach { byte =>
      val c = (byte & 0xff).toChar
      if (Unreserved(c) || (c == '/' && !encodeSlash)) b += c
      else b ++= f"%%${byte & 0xff}%02X"
    }
    b.toString
  }

  def sha256Hex(bytes: Array[Byte]): String =
    hex(java.security.MessageDigest.getInstance("SHA-256").digest(bytes))

  def hmacSha256(key: Array[Byte], data: String): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(UTF_8))
  }

  /** Step 3: the dated HMAC key chain. */
  def signingKey(secret: String, date: String, region: String,
                 service: String): Array[Byte] = {
    val kDate = hmacSha256(("AWS4" + secret).getBytes(UTF_8), date)
    val kRegion = hmacSha256(kDate, region)
    val kService = hmacSha256(kRegion, service)
    hmacSha256(kService, "aws4_request")
  }

  /** Step 1. `headers` must already contain every header to sign (at
    * minimum host and x-amz-date); `query` is (name, value) pairs,
    * UNencoded; `path` is the DECODED path (URI.getPath). The canonical
    * URI for non-S3 services is the path segments encoded TWICE (the
    * documented rule — S3 alone single-encodes); identity on the
    * unreserved-only paths every SQS queue URL uses, but a path with a
    * space must canonicalize to %2520, not %20. */
  def canonicalRequest(method: String, path: String,
                       query: Seq[(String, String)],
                       headers: Map[String, String],
                       payloadHash: String): String = {
    val canonPath =
      if (path.isEmpty) "/"
      else uriEncode(uriEncode(path, encodeSlash = false), encodeSlash = false)
    val canonQuery = query
      .map { case (k, v) => uriEncode(k) -> uriEncode(v) }
      .sorted.map { case (k, v) => s"$k=$v" }.mkString("&")
    val lower = headers.map { case (k, v) => k.toLowerCase -> v.trim }
    val names = lower.keys.toSeq.sorted
    val canonHeaders = names.map(n => s"$n:${lower(n)}\n").mkString
    val signedHeaders = names.mkString(";")
    s"$method\n$canonPath\n$canonQuery\n$canonHeaders\n$signedHeaders\n$payloadHash"
  }

  /** Step 2. `amzDate` = yyyyMMdd'T'HHmmss'Z'. */
  def stringToSign(amzDate: String, scope: String,
                   canonicalRequestText: String): String =
    s"AWS4-HMAC-SHA256\n$amzDate\n$scope\n" +
      sha256Hex(canonicalRequestText.getBytes(UTF_8))

  def hex(bytes: Array[Byte]): String = bytes.map(b => f"$b%02x").mkString

  def amzDate(instant: java.time.Instant): String =
    java.time.format.DateTimeFormatter
      .ofPattern("yyyyMMdd'T'HHmmss'Z'")
      .withZone(java.time.ZoneOffset.UTC)
      .format(instant)

  /** The full chain for one HTTP request: returns every header the
    * caller must set — x-amz-date, Authorization, and (for temporary
    * credentials) x-amz-security-token. `url` supplies host (with
    * non-default port, matching what the HTTP client sends) and path.
    * `extraHeaders` are signed along (content-type etc.). */
  def signRequest(method: String, url: String,
                  query: Seq[(String, String)],
                  extraHeaders: Map[String, String],
                  payload: Array[Byte],
                  creds: Credentials, region: String, service: String,
                  at: java.time.Instant): Map[String, String] = {
    val u = new java.net.URI(url)
    val defaultPort = if (u.getScheme == "https") 443 else 80
    val host =
      if (u.getPort == -1 || u.getPort == defaultPort) u.getHost
      else s"${u.getHost}:${u.getPort}"
    val ts = amzDate(at)
    val date = ts.take(8)
    val scope = s"$date/$region/$service/aws4_request"
    val tokenHeader =
      creds.sessionToken.map("x-amz-security-token" -> _).toMap
    val signed = extraHeaders ++ tokenHeader ++
      Map("host" -> host, "x-amz-date" -> ts)
    val canon = canonicalRequest(method, u.getPath, query, signed,
      sha256Hex(payload))
    val sts = stringToSign(ts, scope, canon)
    val key = signingKey(creds.secretAccessKey, date, region, service)
    val signature = hex(hmacSha256(key, sts))
    val signedNames = signed.keys.map(_.toLowerCase).toSeq.sorted.mkString(";")
    Map(
      "x-amz-date" -> ts,
      "Authorization" ->
        (s"AWS4-HMAC-SHA256 Credential=${creds.accessKeyId}/$scope, " +
          s"SignedHeaders=$signedNames, Signature=$signature")) ++ tokenHeader
  }
}
