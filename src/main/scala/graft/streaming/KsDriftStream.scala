package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming distribution-drift alarm — the ingest-time twin of the
  * batch `drift_ks_time` query: each closing window's value histogram
  * is KS-tested against a FROZEN reference distribution, and windows
  * clearing the 5% bar emit `drifted = true`. Where [[JsDivStream]]
  * scores vocabulary drift bounded-symmetrically, this is the
  * metric-value form: D = max |F_w − F_ref| over the binned domain,
  * with the decision made on EXACT integers (the stat_ks discipline —
  * D's numerator |n_ref·cumW − n_w·cumRef| never becomes a float until
  * the reported d).
  *
  * Shape: the DriftStream pattern — values bin row-locally to the
  * reference's CLOSED dollar-bin domain (bins outside the reference
  * support clamp to the boundary bins, so out-of-range mass still
  * drifts the edge), two chained stateful aggregations pack
  * (window → bin map), and the KS fold runs over the DENSE literal
  * reference bins in ascending order via one aggregate() expression —
  * no partition-frame window on the stream, per-window state ≤ |bins|
  * cells. [[ksNumAgainst]] is the shared kernel the spec replays in
  * batch (stream ≡ batch to the bit). */
object KsDriftStream {

  /** Build the frozen dense reference: per dollar-bin counts covering
    * EVERY bin in [min..max] (zeros included — the fold needs a dense
    * ascending domain). Driver-side; |bins| bounded by the value range,
    * not the corpus. */
  def referenceFrom(history: DataFrame, valueCol: String,
                    maxBins: Int = 65536): Seq[(Long, Long)] = {
    val bins = history
      .select(((col(valueCol).cast("decimal(18,2)") * 100)
        .cast("long") / 100L).cast("long").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    require(bins.nonEmpty, "empty reference history")
    val lo = bins.keys.min; val hi = bins.keys.max
    // The dense [lo..hi] span becomes a typedlit literal inside the
    // aggregate() fold — one history outlier (a single $10M row among
    // cents-scale values) would otherwise inflate the plan by millions
    // of zero cells. Fail loudly instead of compiling a pathological
    // plan; callers with genuinely wide domains pass a larger maxBins
    // or pre-clamp the history the way windowedKs clamps stream values.
    require(hi - lo + 1 <= maxBins,
      s"reference bin span ${hi - lo + 1} exceeds maxBins=$maxBins " +
        s"(bins $lo..$hi): an outlier in the history would densify into " +
        "a multi-million-entry plan literal — clamp the history's value " +
        "range or raise maxBins explicitly")
    (lo to hi).map(b => b -> bins.getOrElse(b, 0L))
  }

  /** Exact KS numerator max_t |n_ref·cumW(t) − n_w·cumRef(t)| of a
    * packed (bin → count) map column against the dense reference — one
    * aggregate() fold in ascending bin order, integer state only.
    * D = numerator / (n_w · n_ref). */
  def ksNumAgainst(cur: Column, cc: Column,
                   reference: Seq[(Long, Long)]): Column = {
    val refTotal = reference.map(_._2).sum
    val entries = typedlit(reference.sortBy(_._1))
    val acc = aggregate(entries,
      struct(lit(0L).as("cw"), lit(0L).as("cr"), lit(0L).as("dmax")),
      (a, e) => {
        val cw = a.getField("cw") +
          coalesce(element_at(cur, e.getField("_1")), lit(0L))
        val cr = a.getField("cr") + e.getField("_2")
        val dnum = abs(lit(refTotal) * cw - cc * cr)
        struct(cw.as("cw"), cr.as("cr"),
          greatest(a.getField("dmax"), dnum).as("dmax"))
      })
    acc.getField("dmax")
  }

  /** @param reference dense (bin, count) histogram from
    *                  [[referenceFrom]].
    * @return per closed window: n values, 6dp D, and the exact-integer
    *         5% decision (D > 1.36·√((n+m)/(nm))). */
  def windowedKs(stream: DataFrame, tsCol: String, valueCol: String,
                 reference: Seq[(Long, Long)],
                 windowDur: String = "1 hour",
                 delay: String = "5 minutes"): DataFrame = {
    val refTotal = reference.map(_._2).sum
    val lo = reference.map(_._1).min
    val hi = reference.map(_._1).max
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val binned = stream
      .withWatermark(tsCol, delay)
      .select(col(tsCol),
        least(greatest(((col(valueCol).cast("decimal(18,2)") * 100)
          .cast("long") / 100L).cast("long"), lit(lo)), lit(hi)).as("bin"))
    val packed = binned
      .groupBy(window(col(tsCol), windowDur).as("w"), col("bin"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("w"))
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("bin"), col("n"))))).as("cur"),
        sum(col("n")).as("cc"))
    val dnum = ksNumAgainst(col("cur"), col("cc"), reference)
    packed.select(col("w.start").as("bucket"), col("cc").as("n_values"),
      (round(dnum.cast("double") /
        (col("cc").cast("double") * lit(refTotal.toDouble)) * 1000000)
        / 1000000).as("d"),
      // exact 5% decision: D² > 1.8496·(n+m)/(nm) ⇔
      // dnum²·10⁴ > 18496·n·m·(n+m)
      (d38(dnum) * d38(dnum) * 10000 >
        d38(col("cc")) * d38(lit(refTotal)) *
          d38(col("cc") + lit(refTotal)) * lit(18496L)).as("drifted"))
  }
}
