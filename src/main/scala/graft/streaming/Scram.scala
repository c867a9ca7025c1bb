package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

/** SCRAM-SHA-256 client (RFC 5802 mechanics, SHA-256 parameters per
  * RFC 7677), JDK crypto only — the challenge-response half of the
  * Kafka SASL surface, where PLAIN-over-plaintext is the fallback and
  * SCRAM is what `sasl.mechanism=SCRAM-SHA-256` deployments actually
  * run. The password never crosses the wire: the client proves
  * possession of ClientKey via an XOR proof bound to both nonces, and
  * VERIFIES the server back (the v= signature) — mutual authentication
  * PLAIN cannot give.
  *
  * Pinned externally (ScramSpec) by the published RFC 7677 example
  * exchange — both independent outputs (the p= client proof AND the v=
  * server signature) must reproduce from the published salt/iteration
  * inputs, the SigV4Spec/WireConformanceSpec method.
  *
  * Channel binding: `n,,` (none) — GS2 header only; channel-binding
  * over TLS (SCRAM-…-PLUS) is out of scope, as in the reference's
  * client configs. */
object Scram {

  def hmac(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data)
  }

  def h(data: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(data)

  /** Hi(str, salt, i) = PBKDF2-HMAC-SHA256 (RFC 5802 §2.2). */
  def hi(password: String, salt: Array[Byte], iterations: Int): Array[Byte] = {
    val spec = new javax.crypto.spec.PBEKeySpec(
      password.toCharArray, salt, iterations, 256)
    javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(spec).getEncoded
  }

  def saltedPassword(password: String, saltB64: String, iterations: Int): Array[Byte] =
    hi(password, Base64.getDecoder.decode(saltB64), iterations)

  def clientKey(salted: Array[Byte]): Array[Byte] =
    hmac(salted, "Client Key".getBytes(UTF_8))
  def serverKey(salted: Array[Byte]): Array[Byte] =
    hmac(salted, "Server Key".getBytes(UTF_8))

  /** `=` and `,` are the only characters needing escape in saslnames
    * (RFC 5802 §5.1). */
  def saslName(user: String): String =
    user.replace("=", "=3D").replace(",", "=2C")

  private def attr(msg: String, key: Char): String =
    msg.split(",").collectFirst {
      case kv if kv.length >= 2 && kv.charAt(0) == key && kv.charAt(1) == '=' =>
        kv.substring(2)
    }.getOrElse(throw new IllegalArgumentException(
      s"SCRAM message missing '$key=': $msg"))

  /** One client exchange. `nonce` is injectable for the spec vectors;
    * production uses the random default. */
  final class Client(user: String, password: String,
                     nonce: String = randomNonce()) {

    val clientFirstBare: String = s"n=${saslName(user)},r=$nonce"
    /** GS2 header `n,,` = no channel binding. */
    val clientFirst: String = s"n,,$clientFirstBare"

    /** Process the server-first message → (client-final message, the
      * server signature that the server's final `v=` MUST equal). */
    def clientFinal(serverFirst: String): (String, String) = {
      val combined = attr(serverFirst, 'r')
      require(combined.startsWith(nonce),
        "server nonce does not extend the client nonce (MITM indicator)")
      val salted = saltedPassword(password,
        attr(serverFirst, 's'), attr(serverFirst, 'i').toInt)
      val ck = clientKey(salted)
      val withoutProof = s"c=biws,r=$combined" // biws = base64("n,,")
      val authMessage =
        s"$clientFirstBare,$serverFirst,$withoutProof".getBytes(UTF_8)
      val clientSig = hmac(h(ck), authMessage)
      val proof = ck.zip(clientSig).map { case (a, b) => (a ^ b).toByte }
      val serverSig = hmac(serverKey(salted), authMessage)
      (s"$withoutProof,p=${Base64.getEncoder.encodeToString(proof)}",
        Base64.getEncoder.encodeToString(serverSig))
    }

    /** Final step: the server must prove ITS knowledge of the password
      * derivative — reject a `v=` mismatch loudly. */
    def verifyServerFinal(serverFinal: String, expectedServerSigB64: String): Unit =
      require(attr(serverFinal, 'v') == expectedServerSigB64,
        "SCRAM server signature mismatch: peer does not know the password " +
          "(or the exchange was tampered with)")
  }

  def randomNonce(): String = {
    val bytes = new Array[Byte](18)
    new java.security.SecureRandom().nextBytes(bytes)
    Base64.getEncoder.encodeToString(bytes)
  }
}
