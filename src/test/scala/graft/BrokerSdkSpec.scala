package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{PulsarSdk, SqsSdk}

/** Classpath gates for the Pulsar and SQS real-SDK bindings (S6/S7,
  * K4/K5), same contract as JetStreamSdkSpec: absent SDK → clean
  * bind-time failure naming the dependency and the injected-transport
  * alternative; present SDK → resolution succeeds and failures are
  * SDK-level. Delivery SEMANTICS stay covered by the injected-transport
  * suites either way — the bindings implement those exact traits. */
class BrokerSdkSpec extends AnyFunSuite {

  test("pulsar binding is classpath-gated") {
    if (!PulsarSdk.isAvailable) {
      val e = intercept[IllegalStateException] {
        PulsarSdk.bind("pulsar://127.0.0.1:6650", "t", "sub")
      }
      assert(e.getMessage.contains("org.apache.pulsar:pulsar-client"), e.getMessage)
      assert(e.getMessage.contains("PulsarSource"))
    } else {
      val thrown = intercept[Throwable] {
        PulsarSdk.bind("pulsar://127.0.0.1:1", "t", "sub")
      }
      assert(!thrown.isInstanceOf[IllegalStateException],
        s"with the SDK present the binding must resolve: $thrown")
    }
  }

  test("sqs binding is classpath-gated") {
    if (!SqsSdk.isAvailable) {
      val e = intercept[IllegalStateException] {
        SqsSdk.bind("https://sqs.example.invalid/q")
      }
      assert(e.getMessage.contains("software.amazon.awssdk:sqs"), e.getMessage)
      assert(e.getMessage.contains("SqsSource"))
    } else {
      // client construction may still fail on missing region/credentials —
      // an SDK-level concern, never a reflective half-wiring one.
      try SqsSdk.bind("https://sqs.example.invalid/q")
      catch { case t: Throwable =>
        assert(!t.isInstanceOf[IllegalStateException], t.toString)
      }
    }
  }

  test("nats core binding is classpath-gated") {
    if (!graft.streaming.NatsCoreSdk.isAvailable) {
      val e = intercept[IllegalStateException] {
        graft.streaming.NatsCoreSdk.bind("nats://127.0.0.1:4222", "subj")
      }
      assert(e.getMessage.contains("io.nats:jnats"), e.getMessage)
      assert(e.getMessage.contains("NatsSource"))
    }
  }

  test("bindings implement the exact engine transport traits") {
    assert(classOf[graft.streaming.Connectors.PulsarConsumer]
      .isAssignableFrom(classOf[PulsarSdk.Bound]))
    assert(classOf[graft.streaming.Connectors.SqsClient]
      .isAssignableFrom(classOf[SqsSdk.Bound]))
    assert(classOf[graft.streaming.Connectors.NatsSubscription]
      .isAssignableFrom(classOf[graft.streaming.NatsCoreSdk.Bound]))
  }
}
