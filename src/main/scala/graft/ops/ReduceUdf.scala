package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Reduce UDF contract (SURVEY W8): the reference's aligned reduce UDFs
  * implement `Open / Append / Close` over a gRPC stream (numaflow proto
  * `reduce.v1.rs:36-38`; the e2e "sum" UDF,
  * `test/reduce-one-e2e/testdata/simple-keyed-reduce-pipeline.yaml:28-41`).
  *
  * The Spark-native form of that contract is `Aggregator[IN, BUF, OUT]`:
  * `zero` = Open, `reduce` = Append, `finish` = Close — plus `merge`,
  * which the reference does NOT have (one gRPC task owns a whole window)
  * and which is exactly why this form scales: merge enables map-side
  * partial aggregation, so a keyed window reduces locally on every
  * executor before one small shuffle, instead of streaming every row to a
  * single per-window owner like the reference.
  *
  * Registered through `functions.udaf`, an Aggregator drops into any
  * `groupBy(...).agg(...)` — including the windowed GroupBySpec aggs of
  * the pipeline DSL — alongside built-ins.
  */
object ReduceUdf {

  /** Buffer for [[meanAgg]]: exact running sum + count. */
  final case class SumCount(var sum: Double, var n: Long)

  /** The canonical custom reducer: arithmetic mean via sum/count — the
    * shape of the reference's example reduce UDFs (sum, counter). */
  val meanAgg: Aggregator[Double, SumCount, Double] =
    new Aggregator[Double, SumCount, Double] {
      def zero: SumCount = SumCount(0.0, 0L)                        // Open
      def reduce(b: SumCount, a: Double): SumCount = {              // Append
        b.sum += a; b.n += 1; b
      }
      def merge(l: SumCount, r: SumCount): SumCount = {             // partial-agg
        l.sum += r.sum; l.n += r.n; l
      }
      def finish(b: SumCount): Double =                             // Close
        if (b.n == 0) 0.0 else b.sum / b.n
      def bufferEncoder: Encoder[SumCount] = Encoders.product[SumCount]
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** [[meanAgg]] as an untyped column aggregate for groupBy().agg(...). */
  def mean(c: Column): Column = udaf(meanAgg).apply(c)
}
