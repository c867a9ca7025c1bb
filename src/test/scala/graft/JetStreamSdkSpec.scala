package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.JetStreamSdk

/** Classpath gate for the real-SDK JetStream binding (S5). The build
  * ships no broker jars, so this spec is environment-adaptive, like the
  * Kafka wiring's runtime requirement: with io.nats:jnats present it
  * proves [[JetStreamSdk.bind]] reaches the SDK (failures are SDK-level,
  * i.e. connection errors, never reflective half-wiring); without it, it
  * proves the CLEAN failure mode — isAvailable false and a bind-time
  * IllegalStateException naming the missing dependency, not a mid-stream
  * NoClassDefFoundError. */
class JetStreamSdkSpec extends AnyFunSuite {

  test("binding is classpath-gated: clean absence or SDK-level reach") {
    if (!JetStreamSdk.isAvailable) {
      val e = intercept[IllegalStateException] {
        JetStreamSdk.bind("nats://127.0.0.1:4222", "st", "sub", "dur")
      }
      assert(e.getMessage.contains("io.nats:jnats"),
        s"absence must name the dependency: ${e.getMessage}")
      assert(e.getMessage.contains("JetStreamSource"),
        "absence must point at the injected-transport alternative")
    } else {
      // SDK present (not in this container, but on a user classpath):
      // resolution must succeed — any failure is a CONNECTION error from
      // the SDK (no server at this address), never an API-mismatch
      // IllegalStateException from the binding itself.
      val thrown = intercept[Throwable] {
        JetStreamSdk.bind("nats://127.0.0.1:1", "st", "sub", "dur")
      }
      assert(!thrown.isInstanceOf[IllegalStateException],
        s"with the SDK present the binding must resolve: $thrown")
    }
  }

  test("semantics stay covered by the injected transport regardless of SDK") {
    // The delivery contract (stream serves replay, ack floor on broker)
    // is the SAME object the injected-transport specs exercise — the SDK
    // binding only swaps the transport. Guard that Bound implements the
    // exact consumer trait the engine consumes.
    assert(classOf[graft.streaming.Connectors.JetStreamConsumer]
      .isAssignableFrom(classOf[JetStreamSdk.Bound]))
  }
}
