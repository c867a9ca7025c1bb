package graft.streaming

import scala.collection.mutable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.Pipeline._
import graft.ops.Routing

/** Compiles a PipelineSpec DAG into DataFrame plans.
  *
  * The reference runs each vertex as pods connected by JetStream buffers
  * (numaflow `pkg/reconciler`, SURVEY §3.1); here the whole DAG becomes ONE
  * lazy plan per sink: vertex boundaries are plan-operator boundaries, the
  * ISB hop is a shuffle (or nothing — Catalyst may fuse map vertices into
  * a single WholeStageCodegen span), and watermark plumbing is the
  * engine's. Works identically for batch DataFrames (tests/oracles) and
  * streaming ones (readStream/MemoryStream): the same spec compiles to
  * both, which is how pipeline semantics get oracle-checked in batch and
  * replayed in streaming.
  *
  * Fan-out: conditional edges become filtered children of the shared
  * vertex output (Catalyst reuses the subplan; for single-pass multi-sink
  * writes use Sinks.routerForeachBatch instead of N queries).
  * Fan-in: union with min-watermark semantics (Spark's
  * multipleWatermarkPolicy=min default, matching wm_fetcher.rs).
  */
object Compiler {

  private[graft] def durationMs(s: String): Long = {
    val i = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(s))
    i.days * 86400000L + i.microseconds / 1000L +
      i.months * 2592000000L // months ~30d; specs here use s/m/h only
  }

  /** Duration arithmetic for W6: watermark delay = maxDelay +
    * allowedLateness (Spark folds both into one withWatermark). */
  private[graft] def addDurations(a: String, b: String): String =
    s"${durationMs(a) + durationMs(b)} milliseconds"

  /** Apply the pipeline's compression field (compression.rs analog) to a
    * live session: the state-store codec is a runtime SQL conf and takes
    * effect for queries started after this call. The shuffle codec
    * (`spark.io.compression.codec`) is core SparkConf — it must go into
    * the session BUILDER via `spec.compression.conf` (one pipeline = one
    * deployed app, the reference's own granularity); if the running
    * session already disagrees, that is surfaced, not silently ignored.
    * Returns the confs now in force for the spec. */
  def applyCompression(spark: org.apache.spark.sql.SparkSession,
                       spec: PipelineSpec): Map[String, String] =
    spec.compression.codec.fold(Map.empty[String, String]) { c =>
      spark.conf.set("spark.sql.streaming.stateStore.compression.codec", c)
      // Default to Spark's ACTUAL default (lz4), not the requested codec:
      // an unset session really shuffles with lz4, and using `c` as the
      // fallback would mask exactly the mismatch this check exists for.
      val io = spark.sparkContext.getConf.get("spark.io.compression.codec", "lz4")
      if (io != c)
        System.err.println(s"[graft] pipeline requests shuffle codec '$c' but the " +
          s"session was built with '$io' — pass spec.compression.conf to the builder")
      Map("spark.sql.streaming.stateStore.compression.codec" -> c,
        "spark.io.compression.codec" -> io)
    }

  /** Compile the spec; returns the DataFrame feeding each sink vertex. */
  def compile(spec: PipelineSpec, streaming: Boolean = true): Map[String, DataFrame] = {
    val cache = mutable.Map[String, DataFrame]()

    def vertexOutput(name: String): DataFrame = cache.getOrElseUpdate(name, {
      val v = spec.byName(name)
      v match {
        case SourceV(_, input, _, transformer) =>
          transformer.fold(input)(t => t(input))
        case _ =>
          val in = inputOf(name)
          v match {
            case MapV(_, fn) => fn(in)
            case ReduceV(_, gb) => reduce(in, gb, sourceTs(name), streaming)
            case SinkV(_) => in
            case _: SourceV => in // unreachable
          }
      }
    })

    /** Union of all incoming edges, each filtered by its condition.
      * DROP-tagged messages are discarded BEFORE any forwarding —
      * conditional or not (forward.rs:9-28, message.rs:411-415); without
      * this an unconditional edge would leak dropped messages downstream.
      * Applied only when the vertex output carries a tags column;
      * Catalyst collapses the repeated filter across sibling edges. */
    def inputOf(name: String): DataFrame = {
      val ins = spec.incoming(name).map { e =>
        val parent = vertexOutput(e.from)
        val live =
          if (parent.columns.contains("tags")) Routing.dropTagged(parent)
          else parent
        e.condition.fold(live)(c => live.where(Routing.matches(col("tags"), c)))
      }
      require(ins.nonEmpty, s"vertex $name has no incoming edge")
      Routing.fanIn(ins)
    }

    /** Event-time column: taken from the (unique) upstream source. */
    def sourceTs(name: String): String = {
      def walk(n: String): Set[String] = spec.byName(n) match {
        case s: SourceV => Set(s.tsCol)
        case _ => spec.incoming(n).map(_.from).toSet.flatMap(walk)
      }
      val ts = walk(name)
      require(ts.size == 1, s"reduce $name needs exactly one event-time column, got $ts")
      ts.head
    }

    def reduce(in: DataFrame, gb: GroupBySpec, tsCol: String, streaming: Boolean): DataFrame = {
      val maxDelay = spec.watermark.maxDelay
      val delayed =
        if (streaming) in.withWatermark(tsCol, addDurations(maxDelay, gb.allowedLateness))
        else in
      gb.window match {
        case Fixed(len, _) =>
          graft.ops.Windows.fixed(delayed, tsCol, len, gb.keys, gb.aggs)
        case Sliding(len, slide, _) =>
          graft.ops.Windows.sliding(delayed, tsCol, len, slide, gb.keys, gb.aggs)
        case Session(timeout) =>
          graft.ops.Windows.session(delayed, tsCol, timeout, gb.keys, gb.aggs)
        case Accumulator(timeout) =>
          // W4: per-key global window, event-time-ordered release (the
          // stream-sorter contract); aggs don't apply — the raw ordered
          // stream IS the output (udf.go:150-154).
          if (streaming)
            AccumulatorWindow.sortedRows(delayed, gb.keys, tsCol,
              idleTimeout = durationMs(timeout))
          else if (gb.keys.nonEmpty)
            // batch analog: the end-of-input watermark releases every row,
            // so the operator degenerates to per-key event-time order —
            // one hash shuffle + in-partition sort, no state store.
            delayed.repartition(gb.keys.map(col): _*)
              .sortWithinPartitions((gb.keys :+ tsCol).map(col): _*)
          else
            // non-keyed accumulator forces a single partition, exactly the
            // reference's partitions=1 rule for non-keyed reduce
            // (edge_types.go:69-72).
            delayed.coalesce(1).sortWithinPartitions(col(tsCol))
      }
    }

    spec.vertices.collect { case SinkV(n) => n -> vertexOutput(n) }.toMap
  }

  /** Output mode for a reduce vertex: streaming:true windows fire early
    * (update), others emit once on close (append) — SURVEY W7. */
  def outputMode(gb: GroupBySpec): String = gb.window match {
    case Fixed(_, s)      => if (s) "update" else "append"
    case Sliding(_, _, s) => if (s) "update" else "append"
    case _                => "append"
  }

  /** MessageGraph analog (reference `rust/serving/src/app/tracker.rs`):
    * the set of sink vertices a request entering at `source` can reach —
    * the per-request path set an SSE stream must await. Derived from the
    * spec's edges, so callers no longer declare `paths` by hand.
    *
    * An edge whose condition can ONLY be satisfied by DROP-tagged
    * messages is unreachable: DROP-tagged messages are discarded before
    * forwarding (forward.rs:9-28, message.rs:411-415), so no message ever
    * matches such a condition on a live edge. Sinks reachable only
    * through one are excluded — an SSE stream must not wait on a branch
    * the DAG can never route to. */
  def servingPaths(spec: PipelineSpec, source: String): Set[String] = {
    def forwardable(e: Edge): Boolean = e.condition.forall { c =>
      c.operator match {
        // and: requiring the DROP tag means only discarded messages match.
        case "and" => !c.values.contains(graft.model.Tags.Drop)
        // or: dead only if EVERY alternative is the DROP tag.
        case "or"  => !(c.values.nonEmpty && c.values.forall(_ == graft.model.Tags.Drop))
        // not: matches untagged messages; always live.
        case _     => true
      }
    }
    val seen = mutable.Set[String]()
    def walk(n: String): Unit = if (seen.add(n))
      spec.outgoing(n).filter(forwardable).foreach(e => walk(e.to))
    walk(source)
    spec.vertices.collect { case SinkV(n) if seen(n) => n }.toSet
  }
}
