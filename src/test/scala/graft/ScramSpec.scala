package graft

import graft.streaming.Scram
import org.scalatest.funsuite.AnyFunSuite

/** External conformance for the SCRAM-SHA-256 client: the published
  * RFC 7677 example exchange (user "user", password "pencil", the
  * documented nonces/salt/iteration-count) must reproduce BOTH
  * independent outputs — the client proof `p=` and the server
  * signature `v=` — bit-for-bit. Two 32-byte MACs agreeing with the
  * published values pins the whole derivation chain
  * (Hi → ClientKey/StoredKey → AuthMessage → proof/verifier). */
class ScramSpec extends AnyFunSuite {

  private val ClientNonce = "rOprNGfwEbeRWgbNEkqO"
  private val ServerFirst =
    "r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0," +
      "s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"

  test("RFC 7677 example exchange reproduces bit-for-bit") {
    val c = new Scram.Client("user", "pencil", nonce = ClientNonce)
    assert(c.clientFirst == "n,,n=user,r=rOprNGfwEbeRWgbNEkqO")
    val (clientFinal, serverSig) = c.clientFinal(ServerFirst)
    assert(clientFinal ==
      "c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0," +
        "p=dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ=")
    assert(serverSig == "6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4=")
    // and the verifier accepts exactly that v=
    c.verifyServerFinal(s"v=$serverSig", serverSig)
    val e = intercept[IllegalArgumentException](
      c.verifyServerFinal("v=AAAA", serverSig))
    assert(e.getMessage.contains("server signature mismatch"))
  }

  test("a server nonce that does not extend the client nonce is rejected") {
    val c = new Scram.Client("user", "pencil", nonce = ClientNonce)
    val e = intercept[IllegalArgumentException](
      c.clientFinal("r=EVILnonce,s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"))
    assert(e.getMessage.contains("MITM"))
  }

  test("saslname escaping: '=' and ',' in usernames") {
    assert(Scram.saslName("a=b,c") == "a=3Db=2Cc")
    val c = new Scram.Client("a=b,c", "pw", nonce = "N")
    assert(c.clientFirstBare == "n=a=3Db=2Cc,r=N")
  }
}
