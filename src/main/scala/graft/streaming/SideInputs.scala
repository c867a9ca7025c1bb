package graft.streaming

import org.apache.spark.sql.DataFrame

/** Side inputs (SURVEY X4): a slowly-changing value computed centrally on
  * a schedule and broadcast to all vertices — the reference runs a
  * side-input manager pod that refreshes on a cron trigger and syncs the
  * value to every vertex via a KV store (numaflow
  * `pkg/apis/numaflow/v1alpha1/side_inputs.go:30-47`,
  * `rust/numaflow-sideinput/src/lib.rs:1-28`; e2e `test/sideinputs-e2e/`).
  *
  * Spark mapping: the natural refresh boundary is the micro-batch — a
  * [[SideInput]] re-computes its value at most once per `minIntervalMs`
  * when consulted from inside foreachBatch, and the fresh value reaches
  * executors through whatever the batch body does with it (a literal
  * column, a broadcast join against a small refreshed DataFrame, a closure
  * capture). Between refreshes every vertex sees the same value — the
  * reference's consistency contract.
  */
object SideInputs {

  /** Cron-refreshed value: `refresh` runs at most once per `minIntervalMs`
    * (0 = every consult, the per-micro-batch mode). Thread-safe. */
  final class SideInput[T](refresh: () => T, minIntervalMs: Long = 0) {
    @volatile private var value: Option[T] = None
    @volatile private var lastMs = Long.MinValue
    @volatile private var n = 0

    def get(): T = synchronized {
      val now = System.currentTimeMillis()
      if (value.isEmpty || now - lastMs >= minIntervalMs) {
        value = Some(refresh()); lastMs = now; n += 1
      }
      value.get
    }

    /** Number of refreshes so far (for tests/metrics). */
    def refreshCount: Int = n
  }

  /** Wrap a micro-batch writer so the body receives the current side-input
    * value each batch — the foreachBatch analog of the reference's
    * side-input file that UDF containers re-read per message batch. */
  def withSideInput[T](si: SideInput[T])(body: (DataFrame, Long, T) => Unit): Sinks.Writer =
    (df, id) => body(df, id, si.get())
}
