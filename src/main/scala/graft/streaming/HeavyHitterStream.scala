package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming heavy hitters per group: a bounded Misra–Gries summary
  * (m counters) maintained per key — the live twin of the batch CMS
  * heavy-hitter pass (`agg_cms_hh`): which items are trending RIGHT NOW
  * per source/type, with state that cannot grow past m counters no
  * matter how adversarial the item distribution (the property that
  * makes the op safe against unbounded-cardinality keys at 100 TB/day,
  * where a plain streaming groupBy(item) would hold one state row per
  * distinct item forever).
  *
  * Per trigger the group's arrivals are pre-counted (an in-iterator
  * hash-agg, so the MG merge cost is per-DISTINCT-item, not per-row),
  * merged into the stored summary counter-wise, and the summary is
  * re-bounded: if more than m counters survive, the (size−m)-th
  * smallest count d is subtracted from ALL counters and ≤0 entries
  * drop — the mergeable-summaries batch generalization (Agarwal et al.
  * 2013) of classic one-at-a-time MG decrements.
  *
  * Guarantee (the law the spec checks): stored counts are LOWER bounds,
  * and the under-count is at most the total decremented mass D, which
  * the state tracks exactly — so `true_count ∈ [cnt, cnt + err]` for
  * every reported item, and any item with true frequency > D is
  * guaranteed present (D ≤ N/(m+1) by the standard argument, preserved
  * under merge). Arrival order and batch boundaries shift WHICH
  * below-threshold items linger, but never violate the bracket — the
  * honest contract for an order-sensitive sketch, stated in the output
  * (`err` column) rather than hidden.
  *
  * Output (update mode, on change): one row per surviving (group, item)
  * with its lower-bound count, the group's exact total n, and the
  * group's decrement mass err.
  */
object HeavyHitterStream {

  /** State: (counters item→cnt, exact total N, decremented mass D). */
  private type MgState = (Map[String, Long], Long, Long)

  def perGroup(stream: DataFrame, groupCol: String, itemCol: String,
               m: Int): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(col(groupCol).cast("string"), col(itemCol).cast("string"))
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[MgState, (String, String, Long, Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (g, rows, state) =>
          val (cur, n0, d0) = state.getOption.getOrElse((Map.empty[String, Long], 0L, 0L))
          val batch = rows.foldLeft(Map.empty[String, Long]) { case (acc, (_, it)) =>
            acc.updated(it, acc.getOrElse(it, 0L) + 1L)
          }
          val nb = batch.valuesIterator.sum
          val merged = batch.foldLeft(cur) { case (acc, (it, c)) =>
            acc.updated(it, acc.getOrElse(it, 0L) + c)
          }
          val (bounded, dec) =
            if (merged.size <= m) (merged, 0L)
            else {
              // subtract the (size-m)-th smallest count from everyone:
              // at most m counters stay positive, one batched decrement
              val d = merged.valuesIterator.toArray.sorted.apply(merged.size - m - 1)
              (merged.collect { case (it, c) if c > d => it -> (c - d) }, d)
            }
          if (nb == 0L) Iterator.empty
          else {
            val st = (bounded, n0 + nb, d0 + dec)
            state.update(st)
            bounded.toSeq.sortBy { case (it, c) => (-c, it) }.iterator
              .map { case (it, c) => (g, it, c, st._2, st._3) }
          }
      }
      .toDF(groupCol, itemCol, "cnt", "n_total", "err")
  }
}
