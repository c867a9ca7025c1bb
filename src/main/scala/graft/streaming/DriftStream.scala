package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Streaming embedding-distribution drift alarm — the ingest-time twin
  * of the batch `drift_cells` query: arriving vectors assign to the
  * FROZEN seed quantizer (map-side literal argmin, no training), each
  * closing window's cell histogram is chi-squared against the frozen
  * reference histogram, and windows whose statistic clears the caller's
  * critical value emit an alarm row — the retraining tripwire evaluated
  * as data lands instead of at the next batch audit.
  *
  * Fully declarative, no custom state: cell assignment is a row-local
  * projection, then TWO CHAINED stateful aggregations (the QuantileStream
  * pattern) — (window, cell) counts, packed per window — and the χ²
  * itself is a literal-folded expression over the reference cells, which
  * are FROZEN and therefore collected once at build time (the CusumStream
  * envelope convention). Non-time window functions are illegal on
  * streams, so per-window totals come from the packed array, not a
  * partition frame. Reference cells missing from a window count as 0
  * (the missing mass IS drift); the quantizer's cell set is closed, so
  * arriving cells are always a subset of the reference's.
  *
  * Exactness: identical per-cell term as the batch audit —
  * (n·O − r·c)² / (n·r·c) through [[graft.ops.Stats.chi2Term]]: every
  * count product in DECIMAL(38,0) (a BIGINT pairwise product of counts
  * wraps at ~9.2e18; the n·r·c triple product wraps first), the exact
  * difference squared in double — so a frozen-window replay of the
  * stream reproduces the batch statistic bit for bit (spec).
  *
  * Malformed vectors (wrong length → NULL cell from the quantizer) are
  * dropped BEFORE the histogram and do NOT count toward `cc`: a NULL
  * cell would otherwise reach map_from_entries as a null map key and
  * permanently fail the query (restart replays the same batch). Drift
  * in the malformed-vector RATE is a schema-quality signal, not an
  * embedding-distribution signal — monitor it separately. */
object DriftStream {

  /** @param reference frozen per-cell counts (cell → n_ref) — the
    *                  settled corpus histogram, collected driver-side.
    * @param threshold χ² alarm bar (df = |cells|−1; e.g. 11.07 ≈ 95%
    *                  at df 5, 14.07 at df 7). */
  /** The shared per-window cell histogram: (window, cell→count map,
    * window total) — chi² and PSI scoring both read this one shape. */
  private def packedWindows(stream: DataFrame, vecCol: String, tsCol: String,
                            k: Int, dim: Int, windowDur: String,
                            delay: String): DataFrame = stream
    .withWatermark(tsCol, delay)
    .withColumn("cell", Similarity.seedCellColumn(vecCol, k, dim))
    .where(col("cell").isNotNull) // malformed vectors: see scaladoc
    .groupBy(window(col(tsCol), windowDur).as("w"), col("cell"))
    .agg(count(lit(1)).as("n_cur"))
    .groupBy(col("w"))
    .agg(map_from_entries(sort_array(collect_list(
      struct(col("cell"), col("n_cur"))))).as("cur"),
      sum(col("n_cur")).as("cc"))

  def windowedAlarms(stream: DataFrame, vecCol: String, tsCol: String,
                     reference: Map[Int, Long], threshold: Double,
                     k: Int = 8, dim: Int = 64,
                     windowDur: String = "1 hour",
                     delay: String = "5 minutes"): DataFrame = {
    require(reference.nonEmpty, "empty reference histogram")
    val cr = reference.values.sum // frozen side total — a plan literal
    val packed = packedWindows(stream, vecCol, tsCol, k, dim, windowDur, delay)
    val n = lit(cr) + col("cc")
    def term(cell: Int, nRef: Long): Column = {
      val o = coalesce(element_at(col("cur"), lit(cell)), lit(0L))
      val r = lit(nRef) + o
      graft.ops.Stats.chi2Term(n, lit(nRef), r, lit(cr)) +
        graft.ops.Stats.chi2Term(n, o, r, col("cc"))
    }
    val chi2 = reference.toSeq.sortBy(_._1)
      .map { case (c, nr) => term(c, nr) }.reduce(_ + _)
    packed
      .withColumn("chi2", chi2)
      .where(col("chi2") > threshold)
      .select(col("w.start").as("bucket"), col("cc").as("n_vectors"),
        (round(col("chi2") * 10000) / 10000).as("chi2"))
  }

  /** PSI drift alarm — the log-odds-weighted companion to the chi²
    * alarm over the same packed window histograms (the batch drift_psi
    * twin): every closing window's smoothed cell shares score
    * Σ (p_cur − p_ref)·ln(p_cur/p_ref) over the FULL closed cell set
    * 0..k−1 (a cell absent from the window or the reference still
    * contributes — its smoothed term is nonzero whenever the totals
    * differ, the batch query's review-caught rule). The reference
    * shares are Scala-computed plan literals; the window shares are one
    * division per cell; terms fold in cell order. Common bars: 0.1 =
    * "monitor", 0.25 = "significant shift — retrain". */
  def windowedPsiAlarms(stream: DataFrame, vecCol: String, tsCol: String,
                        reference: Map[Int, Long], threshold: Double,
                        k: Int = 8, dim: Int = 64,
                        windowDur: String = "1 hour",
                        delay: String = "5 minutes"): DataFrame = {
    require(reference.nonEmpty, "empty reference histogram")
    val cr = reference.values.sum
    val packed = packedWindows(stream, vecCol, tsCol, k, dim, windowDur, delay)
    def term(cell: Int): Column = {
      val o = coalesce(element_at(col("cur"), lit(cell)), lit(0L))
      val pr = (reference.getOrElse(cell, 0L) + 1).toDouble / (cr + k).toDouble
      val pc = (o + 1L).cast("double") / (col("cc") + k).cast("double")
      (pc - lit(pr)) * log(pc / lit(pr))
    }
    val psi = (0 until k).map(term).reduce(_ + _)
    packed
      .withColumn("psi", psi)
      .where(col("psi") > threshold)
      .select(col("w.start").as("bucket"), col("cc").as("n_vectors"),
        (round(col("psi") * 1000000) / 1000000).as("psi"))
  }
}
