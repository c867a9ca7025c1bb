package graft

import java.util.concurrent.atomic.AtomicInteger
import scala.collection.mutable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Routing.TagCondition
import graft.streaming.Sinks
import graft.streaming.Sinks._

/** Sink semantics (SURVEY §2.7): retry backoff, fallback DLQ, onSuccess,
  * and the single-pass router — mirroring functional_test.go:177,305,322,339. */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def batch: DataFrame = Seq(
    (1L, "even", Seq("even")), (2L, "odd", Seq("odd")),
    (3L, "drop", Seq(graft.model.Tags.Drop))
  ).toDF("id", "label", "tags")

  test("retry succeeds after transient failures") {
    val attempts = new AtomicInteger(0)
    val flaky: Writer = (_, _) =>
      if (attempts.incrementAndGet() < 3) throw new RuntimeException("transient")
    Sinks.withRetry(flaky, RetryPolicy(intervalMs = 1, steps = 5))(batch, 0L)
    assert(attempts.get() === 3)
  }

  test("fallback sink receives the batch after retries exhaust") {
    var fellBack = false
    val failing: Writer = (_, _) => throw new RuntimeException("down")
    val fb: Writer = (df, _) => { fellBack = true; assert(df.count() === 3) }
    Sinks.withRetry(failing, RetryPolicy(intervalMs = 1, steps = 2),
      FailureFallback(fb))(batch, 0L)
    assert(fellBack)
  }

  test("onFailure=drop sheds the batch silently") {
    val failing: Writer = (_, _) => throw new RuntimeException("down")
    Sinks.withRetry(failing, RetryPolicy(intervalMs = 1, steps = 1),
      FailureDrop)(batch, 0L) // must not throw
  }

  test("onSuccess fires only after primary commits") {
    val order = mutable.Buffer[String]()
    val primary: Writer = (_, _) => order += "primary"
    val secondary: Writer = (_, _) => order += "secondary"
    Sinks.withOnSuccess(primary, secondary)(batch, 0L)
    assert(order.toSeq === Seq("primary", "secondary"))

    val failing: Writer = (_, _) => { order += "fail"; throw new RuntimeException() }
    intercept[RuntimeException] {
      Sinks.withOnSuccess(failing, secondary)(batch, 1L)
    }
    assert(order.toSeq === Seq("primary", "secondary", "fail")) // no 2nd secondary
  }

  test("router fans out once per edge, drops DROP-tagged rows") {
    val seen = mutable.Map[String, Seq[Long]]()
    def collectTo(name: String): Writer = (df, _) =>
      seen(name) = df.select("id").as[Long].collect().toSeq.sorted
    val router = Sinks.routerForeachBatch(Seq(
      Some(TagCondition(Seq("even"))) -> collectTo("even_sink"),
      Some(TagCondition(Seq("odd"))) -> collectTo("odd_sink"),
      None -> collectTo("all_sink")))
    router(batch, 42L)
    assert(seen("even_sink") === Seq(1L))
    assert(seen("odd_sink") === Seq(2L))
    assert(seen("all_sink") === Seq(1L, 2L)) // DROP row never reaches sinks
  }

  test("drift alarm stays quiet in-family, fires on a shifted batch") {
    // baseline: uniform over bins 0..3 (values 0..79, width 20)
    val baseline = Map(0L -> 0.25, 1L -> 0.25, 2L -> 0.25, 3L -> 0.25)
    val alarms = mutable.Buffer[(Long, Double)]()
    val alarm = Sinks.driftAlarm(baseline, "v", binWidth = 20L, nBins = 4,
      threshold = 0.5, onAlarm = (id, s) => { alarms += ((id, s)); () })
    // in-family batch: same uniform spread
    alarm((0L until 80L).toDF("v"), 1L)
    assert(alarms.isEmpty, s"uniform batch must not alarm: $alarms")
    // regression batch: everything collapses into bin 0 (truncated docs)
    alarm((0L until 80L).map(_ % 20).toDF("v"), 2L)
    assert(alarms.map(_._1) === Seq(2L), s"shifted batch must alarm: $alarms")
    assert(alarms.head._2 > 2.0, s"collapse to one bin scores high: $alarms")
  }

  test("quality gate splits clean rows from violations, naming fired rules") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (1L, Some(10L), "ok"),
      (2L, None, "ok"),        // null_qty fires
      (3L, Some(-5L), "ok"),   // qty_range fires
      (4L, Some(999L), "bad")  // qty_range AND domain fire
    ).toDF("id", "qty", "status")
    var clean: Seq[Long] = Nil
    var bad: Map[Long, Seq[String]] = Map.empty
    val gate = Sinks.qualityGatedSink(
      Seq("null_qty" -> col("qty").isNull,
        "qty_range" -> (col("qty") < 0 || col("qty") > 100),
        "domain" -> !col("status").isin("ok", "retry")),
      primary = (df, _) => clean = df.select("id").as[Long].collect().toSeq.sorted,
      dlq = (df, _) => bad = df.select("id", "violated_rules")
        .as[(Long, Seq[String])].collect().toMap)
    gate(rows, 7L)
    assert(clean === Seq(1L))
    assert(bad.keySet === Set(2L, 3L, 4L))
    assert(bad(2L) === Seq("null_qty"))
    assert(bad(3L) === Seq("qty_range"))
    assert(bad(4L) === Seq("qty_range", "domain"))
  }
}
