package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators beyond the reference's surface (SURVEY §2.9).
  *
  * The reference has no joins/sort/limit/analytics (all record-level compute
  * is UDF-delegated); our engine exposes Spark's relational algebra as
  * first-class engine operators. This file holds the ops that need actual
  * composition rather than a single built-in call.
  */
object Relational {

  /** As-of join: for every left row, the most recent right row with
    * `right.ts <= left.ts` within the same partition keys.
    *
    * Implemented as union + partitioned running `last(_, ignoreNulls)`
    * rather than a per-key lookup join: one shuffle on the partition keys,
    * one sort — the same cost profile as a sort-merge join, so it scales to
    * arbitrarily large fact tables (no per-row subquery, no broadcast of
    * the right side). Ties (equal ts) resolve to the right row, matching
    * ASOF-join >= semantics.
    *
    * @param valueCol single right-side column to carry (null when no right
    *                 row precedes the left row).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, partitionCols: Seq[String],
               tsCol: String, valueCol: String, as: String): DataFrame = {
    val leftCols = left.columns
    // side=0 sorts right rows before left rows at equal ts (inclusive >=).
    val l = left.withColumn("__side", lit(1)).withColumn("__v", lit(null).cast(right.schema(valueCol).dataType))
    val r = right.select(partitionCols.map(col) :+ col(tsCol) :+ col(valueCol).as("__v"): _*)
      .withColumn("__side", lit(0))
    val unioned = l.select((partitionCols :+ tsCol).map(col) ++ Seq(col("__side"), col("__v")) ++
      leftCols.filterNot(c => partitionCols.contains(c) || c == tsCol).map(col): _*)
      .unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(as, last(col("__v"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(col).toIndexedSeq :+ col(as): _*)
  }

  /** FORWARD as-of join: each left row picks the EARLIEST right value at
    * or after its timestamp — the label-join shape ("first outcome after
    * exposure") that the backward probe cannot express. Same
    * single-shuffle union machinery, mirrored: right rows sort AFTER
    * left rows at equal ts (inclusive <=), and a running `first` over
    * the FOLLOWING frame replaces the running `last`. */
  def asOfJoinForward(left: DataFrame, right: DataFrame,
                      partitionCols: Seq[String], tsCol: String,
                      valueCol: String, as: String): DataFrame = {
    val leftCols = left.columns
    val l = left.withColumn("__side", lit(0))
      .withColumn("__v", lit(null).cast(right.schema(valueCol).dataType))
    val r = right.select(partitionCols.map(col) :+ col(tsCol) :+
        col(valueCol).as("__v"): _*)
      .withColumn("__side", lit(1))
    val unioned = l.select((partitionCols :+ tsCol).map(col) ++
        Seq(col("__side"), col("__v")) ++
        leftCols.filterNot(c => partitionCols.contains(c) || c == tsCol).map(col): _*)
      .unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    unioned
      .withColumn(as, first(col("__v"), ignoreNulls = true).over(w))
      .where(col("__side") === 0)
      .select(leftCols.map(col).toIndexedSeq :+ col(as): _*)
  }

  /** STALENESS-BOUNDED backward as-of join: the feature-store contract —
    * each left row takes the most recent prior right value ONLY if it is
    * at most `maxStalenessUs` old, else null ("no feature" beats "a
    * feature from last month" in a training set; serving would fall back
    * to a default). Composed from the backward pass carrying the right
    * row's (ts, value) struct; the staleness compare runs in exact
    * integer microseconds, so no float boundary exists for an
    * exactly-at-tolerance row to straddle. Same one key-shuffle as
    * [[asOfJoin]]. */
  def asOfJoinTolerance(left: DataFrame, right: DataFrame,
                        partitionCols: Seq[String], tsCol: String,
                        valueCol: String, as: String,
                        maxStalenessUs: Long): DataFrame = {
    val packed = right.withColumn("__pk",
      struct(col(tsCol).as("t"), col(valueCol).as("v")))
    asOfJoin(left, packed, partitionCols, tsCol, "__pk", "__m")
      .withColumn(as, when(col("__m").isNotNull &&
        unix_micros(col(tsCol).cast("timestamp")) -
          unix_micros(col("__m").getField("t").cast("timestamp"))
          <= maxStalenessUs,
        col("__m").getField("v")))
      .drop("__m")
  }

  /** NEAREST as-of join: each left row takes the right value whose
    * timestamp is closest in EITHER direction — ties go backward (the
    * "sensor reading nearest the observation" probe that neither the
    * backward nor forward form expresses alone). Composed from one
    * backward and one forward pass over the same union machinery, each
    * carrying the right row's (ts, value) struct; the distance compare
    * runs in exact integer microseconds, so no float boundary exists
    * for an equidistant pair to straddle. Cost: two key-shuffles (one
    * per direction) on the same partitioning. */
  def asOfJoinNearest(left: DataFrame, right: DataFrame,
                      partitionCols: Seq[String], tsCol: String,
                      valueCol: String, as: String): DataFrame = {
    val packed = right.withColumn("__pk",
      struct(col(tsCol).as("t"), col(valueCol).as("v")))
    val back = asOfJoin(left, packed, partitionCols, tsCol, "__pk", "__b")
    val both = asOfJoinForward(back, packed, partitionCols, tsCol, "__pk", "__f")
    def us(c: Column) = unix_micros(c.cast("timestamp"))
    both.withColumn(as,
        when(col("__b").isNull, col("__f.v"))
          .when(col("__f").isNull, col("__b.v"))
          .when(us(col(tsCol)) - us(col("__b.t")) <=
            us(col("__f.t")) - us(col(tsCol)), col("__b.v"))
          .otherwise(col("__f.v")))
      .drop("__b", "__f")
  }

  /** Multi-column as-of join: the right payload travels as ONE struct
    * through the same union + running-`last` machinery (one shuffle, one
    * sort, regardless of column count), then unpacks to `<prefix>_<col>`.
    * This is the full point-in-time probe — "the entire latest right ROW
    * as of each left timestamp" — not just one value. */
  def asOfJoinMulti(left: DataFrame, right: DataFrame, partitionCols: Seq[String],
                    tsCol: String, valueCols: Seq[String], prefix: String): DataFrame = {
    require(valueCols.nonEmpty, "valueCols must be non-empty")
    val packed = right.withColumn("__pack", struct(valueCols.map(col): _*))
    val joined = asOfJoin(left, packed, partitionCols, tsCol, "__pack", "__asof")
    valueCols.foldLeft(joined) { (d, c) =>
      d.withColumn(s"${prefix}_$c", col(s"__asof.$c"))
    }.drop("__asof")
  }

  /** Top-k by explicit ordering. `orderBy(...).limit(k)` plans as
    * TakeOrderedAndProject: each partition keeps k rows, only k*partitions
    * reach the driver — no global sort, safe at any scale. Callers must
    * pass a total order (tie-broken) for deterministic results. */
  /** Cross-key interval-OVERLAP pairs (the interval join): every pair
    * of intervals from DIFFERENT keys with s₁<e₂ ∧ s₂<e₁, each pair
    * exactly once. The non-equi predicate becomes an EQUI join by
    * banding: each interval explodes to the hour buckets it covers,
    * pairs meet in ONE shuffle on the bucket, and the canonical-bucket
    * rule (b = hour(overlap start) — a bucket both sides provably
    * cover) dedupes pairs that share several buckets without a
    * distinct. Fan-out per interval = its length in hours (bounded by
    * the session/interval duration cap, never by table size); a hot
    * hour's pair count is real output, not join inefficiency. Emits
    * (k1, k2, o_start, o_end) with k1 < k2. */
  def intervalOverlapPairs(iv: DataFrame, keyCol: String, startCol: String,
                           endCol: String): DataFrame = {
    val b = iv.select(col(keyCol).as("k"), col(startCol).as("s"),
        col(endCol).as("e"))
      .withColumn("b", explode(sequence(
        date_trunc("hour", col("s")), date_trunc("hour", col("e")),
        expr("INTERVAL 1 HOUR"))))
    val l = b.select(col("k").as("k1"), col("s").as("s1"),
      col("e").as("e1"), col("b"))
    val r = b.select(col("k").as("k2"), col("s").as("s2"),
      col("e").as("e2"), col("b"))
    l.join(r, Seq("b"))
      .where(col("k1") < col("k2") &&
        col("s1") < col("e2") && col("s2") < col("e1"))
      .where(col("b") === date_trunc("hour", greatest(col("s1"), col("s2"))))
      .select(col("k1"), col("k2"),
        greatest(col("s1"), col("s2")).as("o_start"),
        least(col("e1"), col("e2")).as("o_end"))
  }

  def topK(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** One scored element of a per-key top-k buffer. */
  final case class Scored(score: Double, id: Long)

  /** Bounded top-k Aggregator: the buffer never exceeds k elements and
    * `merge` makes it a partial aggregate — each executor reduces its rows
    * to k before the shuffle. Ties break by ascending id (total order). */
  def topKAgg(k: Int): org.apache.spark.sql.expressions.Aggregator[Scored, Seq[Scored], Seq[Scored]] =
    new org.apache.spark.sql.expressions.Aggregator[Scored, Seq[Scored], Seq[Scored]] {
      private def trim(s: Seq[Scored]): Seq[Scored] =
        s.sortBy(x => (-x.score, x.id)).take(k)
      def zero: Seq[Scored] = Seq.empty
      def reduce(b: Seq[Scored], a: Scored): Seq[Scored] = trim(b :+ a)
      def merge(l: Seq[Scored], r: Seq[Scored]): Seq[Scored] = trim(l ++ r)
      def finish(b: Seq[Scored]): Seq[Scored] = b
      def bufferEncoder: org.apache.spark.sql.Encoder[Seq[Scored]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
      def outputEncoder: org.apache.spark.sql.Encoder[Seq[Scored]] = bufferEncoder
    }

  /** Grouped top-k: k best (scoreCol desc, idCol asc) rows PER KEY.
    *
    * The window-function formulation (`row_number over partitionBy`)
    * shuffles and sorts EVERY row; this aggregate keeps only k rows per
    * key per partition before the exchange (map-side partial top-k), so
    * shuffle volume is k × keys, independent of input size — the shape
    * that survives 100 TB. Returns (keyCols..., rank, id, score). */
  def topKPerKey(df: DataFrame, keyCols: Seq[String], scoreCol: String,
                 idCol: String, k: Int): DataFrame = {
    val agg = org.apache.spark.sql.functions.udaf(
      topKAgg(k), org.apache.spark.sql.Encoders.product[Scored])
    df.groupBy(keyCols.map(col): _*)
      .agg(agg(col(scoreCol).cast("double"), col(idCol).cast("long")).as("topk"))
      .select(keyCols.map(col) :+ posexplode(col("topk")): _*)
      .select(keyCols.map(col) ++ Seq((col("pos") + 1).cast("int").as("rank"),
        col("col.id").as(idCol), col("col.score").as(scoreCol)): _*)
  }

  /** Distribution drift between a reference and a current slice of the
    * same metric — the recurring-crawl health check (a new crawl whose
    * length/quality distribution shifts is the first sign of a scraper
    * or source regression). Chi-square-style per-bin contributions
    * ((p_cur − p_ref)² / p_ref) rather than PSI/KL: no logarithms, so
    * every arithmetic step is exact-integer counts followed by pinned-
    * order double ops — engine-exact, hash-checkable (libm's ln differs
    * in the last ulp across engines; a log-based score cannot hash).
    *
    * Scale shape: two filtered aggregates over fixed-width bins (map-side
    * partials; bins are the only shuffle key), one broadcastable
    * bin-level join. */
  def driftChi2(ref: DataFrame, cur: DataFrame, valueCol: String,
                binWidth: Long, nBins: Int): DataFrame = {
    def binned(df: DataFrame, n: String, p: String) = {
      val total = df.count().toDouble
      df.select(least(floor(col(valueCol) / binWidth), lit(nBins - 1)).cast("long").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as(n))
        .withColumn(p, col(n).cast("double") / total)
    }
    val r = binned(ref, "n_ref", "p_ref")
    val c = binned(cur, "n_cur", "p_cur")
    r.join(c, Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"),
        coalesce(col("p_ref"), lit(0.0)).as("p_ref"),
        coalesce(col("p_cur"), lit(0.0)).as("p_cur"))
      .withColumn("contrib",
        when(col("p_ref") === 0.0, lit(null))
          .otherwise((col("p_cur") - col("p_ref")) * (col("p_cur") - col("p_ref"))
            / col("p_ref")))
  }

  /** Expectation-suite validation: each rule is a frame of its own
    * VIOLATIONS (empty = healthy); the result is one row per rule with
    * the violation count — the contract-check gate a pipeline runs
    * before publishing a corpus snapshot. Rules stay declarative
    * DataFrames, so nulls/ranges/domains are plain filters and
    * referential integrity is a left-anti join; each rule aggregates to
    * ONE row (count pushes map-side), and independent rules run as
    * independent jobs. */
  def validateRules(rules: Seq[(String, DataFrame)]): DataFrame =
    rules.map { case (name, violations) =>
      violations.agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("rule"), col("n_violations"))
    }.reduce(_ unionByName _)

  /** Data-quality profile: per column, row count, null count, PORTABLE
    * KMV distinct estimate, and min/max (as strings, for a uniform
    * schema). One scan-and-aggregate pass per column — independent
    * columns profile as independent jobs (how warehouses actually run
    * profiling; at 100 TB they parallelize across the cluster and each
    * pass is a map-side-partial hash agg, never an EXPAND multiplying
    * the scan by the column count). The distinct estimate is
    * [[graft.functions.KmvDistinct]] on the md5 unit-hash family —
    * engine-exact, so the whole profile is hash-checkable, unlike
    * approx_count_distinct whose HLL is implementation-defined. */
  def profile(df: DataFrame, cols: Seq[String], k: Int = 128): DataFrame = {
    // ONE aggregation pass computing every column's five profile stats,
    // then stack() to the per-column row shape — the per-column
    // `df.agg(...).union` form re-scanned the table once PER COLUMN
    // (4 scans + 4 exchanges for lineitem; guide §6 scan elimination).
    // Same values: each aggregate sees exactly the rows it saw before,
    // and stack preserves the cols order the union produced.
    val aggs = cols.zipWithIndex.flatMap { case (c, i) => Seq(
      count(lit(1)).as(s"__n_$i"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$i"),
      graft.functions.KmvDistinct.onMd5(col(c), k).as(s"__d_$i"),
      min(col(c)).cast("string").as(s"__mn_$i"),
      max(col(c)).cast("string").as(s"__mx_$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.zipWithIndex.flatMap { case (c, i) => Seq(
      lit(c), col(s"__n_$i"), col(s"__nn_$i"), col(s"__d_$i"),
      col(s"__mn_$i"), col(s"__mx_$i"))
    }
    one.select(stack((lit(cols.size) +: stacked): _*)
      .as(Seq("col_name", "n", "n_null", "distinct_est", "min_s", "max_s")))
  }

  /** Type-2 slowly-changing dimension build: collapse a change-event
    * stream into validity intervals. For each key, consecutive rows (in
    * `orderCols` order) whose tracked attributes repeat are folded into
    * one row; each surviving row gets `valid_from` (its own timestamp)
    * and `valid_to` (the next change's timestamp, null while current).
    * The warehouse primitive for "what was this entity's state at time
    * t" — pairs with [[asOfJoin]], which probes the interval table this
    * operator builds.
    *
    * Shape: ONE shuffle on the key, then two window passes over the
    * already-co-located rows (lag to detect change, lead to close the
    * interval — same window spec, one exchange). `orderCols` must be a
    * deterministic total order per key (include a tiebreaker column);
    * otherwise interval boundaries are nondeterministic under retries. */
  def scd2(df: DataFrame, keyCols: Seq[String], tsCol: String,
           attrCols: Seq[String], orderCols: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
    val state = concat_ws("", attrCols.map(c => col(c).cast("string")): _*)
    df.withColumn("__changed",
        lag(state, 1).over(w).isNull || lag(state, 1).over(w) =!= state)
      .where(col("__changed"))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to",
        lead(col(tsCol), 1).over(
          Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)))
      .select((keyCols ++ attrCols).map(col) :+ col("valid_from") :+ col("valid_to"): _*)
  }

  /** Global 1-based rank over a deterministic total order WITHOUT a
    * single-task window (`row_number() over (order by …)` moves the
    * whole table onto one task): range-repartition + in-partition sort,
    * then zipWithIndex — range partition ids are ordered by key
    * regardless of boundary sampling, so the rank is deterministic.
    * One range shuffle, partition-parallel everywhere else (the
    * corpus_order shape, generalized to any sort order). */
  def withGlobalRank(df: DataFrame, order: Seq[Column],
                     rankCol: String = "rank"): DataFrame = {
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types
        .StructField(rankCol, org.apache.spark.sql.types.LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Exact `ntile(n)` over a deterministic total order, computed from
    * [[withGlobalRank]] plus a broadcast 1-row count — bit-identical to
    * SQL ntile's bucket-size rule (first `total mod n` buckets take one
    * extra row) but never a one-task WindowExec. */
  def ntileExact(df: DataFrame, n: Int, order: Seq[Column],
                 bucketCol: String): DataFrame = {
    // exact floor division on non-negative ints (the pageRank fdiv)
    def fdiv(a: Column, b: Column): Column = Stats.fdiv(a, b)
    val ranked = withGlobalRank(df, order, "__rank")
    val total = df.agg(count(lit(1)).as("__total"))
    val k = col("__rank") - 1 // 0-based position
    val q = fdiv(col("__total"), lit(n.toLong))
    val r = col("__total") % n
    ranked.crossJoin(broadcast(total))
      .withColumn(bucketCol,
        when(k < r * (q + 1), fdiv(k, q + 1) + 1)
          .otherwise(r + fdiv(k - r * (q + 1), q) + 1)
          .cast("int"))
      .drop("__rank", "__total")
  }
}
