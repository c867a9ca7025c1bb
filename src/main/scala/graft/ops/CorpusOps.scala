package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Corpus-assembly operators for training-data pipelines: deterministic
  * splits, stratified sampling, context chunking, and sequence packing.
  *
  * Everything keyed on data, nothing on randomness: the "random" number
  * for a row is a unit-interval hash of its id (first 8 md5 hex digits /
  * 2^32) — reproducible across runs, engines, and cluster sizes, and
  * stable under repartitioning, unlike rand(seed) whose draw depends on
  * partition layout. That property is what makes a 100 TB split
  * RESUMABLE: re-running assigns every doc the same way, so downstream
  * shards can be rebuilt incrementally.
  */
object CorpusOps {

  /** u(id) ∈ [0, 1): md5-derived, engine-portable unit hash. */
  def unitHash(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("double") / 4294967296.0

  /** Deterministic train/val/test assignment by cumulative weight over
    * the id hash. Weights need not sum to 1 — they are normalized. */
  def hashSplit(df: DataFrame, idCol: String,
                splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "positive split weights")
    val total = splits.map(_._2).sum
    val cuts = splits.scanLeft(0.0)(_ + _._2).tail.map(_ / total)
    val u = unitHash(col(idCol))
    val expr = splits.init.zip(cuts.init).foldRight(lit(splits.last._1): Column) {
      case (((name, _), cut), rest) => when(u < cut, name).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** k-anonymity audit: group the corpus by its quasi-identifier columns
    * and report each equivalence class's size, whether it meets the
    * anonymity threshold, and its re-identification risk (1/n) — the
    * governance gate run before a metadata-bearing corpus ships
    * (complements redact_pii, which handles the free text). One hash
    * aggregation with map-side partials; output is |classes| rows. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .select(quasiCols.map(col) ++ Seq(
        col("n"),
        (col("n") >= k).as("anonymous"),
        TimeSeries.portableRound6(lit(1.0) / col("n")).as("risk")): _*)

  /** l-diversity audit — k-anonymity's companion: a class of identical
    * quasi-identifiers is still unsafe if everyone in it shares the
    * SENSITIVE attribute (homogeneity attack: class size 50, all one
    * diagnosis — k-anonymous, zero privacy). Reports each class's size,
    * distinct sensitive values, and the ≥ l verdict. Same one-hash-agg
    * shape as [[kAnonymity]]; countDistinct plans as the standard
    * two-level expand-agg, both levels map-side partial. */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, l: Int): DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .select(quasiCols.map(col) ++ Seq(col("n"), col("n_sensitive"),
        (col("n_sensitive") >= l).as("diverse")): _*)

  /** t-closeness audit — the distribution leg of the privacy triad
    * (k-anonymity: class size; l-diversity: sensitive cardinality;
    * t-closeness: a class whose sensitive DISTRIBUTION diverges from
    * the corpus-wide one leaks by skew even when diverse). Reports each
    * class's total-variation distance ½·Σ|p_class − p_global| and the
    * ≤ t verdict. Every term is the exact integer cross-product
    * |c_v·N − g_v·n_class| (DECIMAL(38,0) — the products overflow a
    * BIGINT at petabyte class sizes), summed exactly; ONE double
    * division at the end, portably rounded, so the verdict compares a
    * deterministic value. The global distribution and row count
    * broadcast; the class×value grid is |classes|·|values| — the full
    * support, so absent values contribute their g_v·n term. */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, t: Double): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    // ONE corpus scan: the (quasi, sensitive) counts are the finest
    // aggregate — class sizes, the global sensitive distribution, and
    // the corpus total are all exact rollups of it (tiny, checkpointed
    // so the three rollups don't re-run the scan).
    val cv = df.groupBy((quasiCols.map(col) :+ col(sensitiveCol)): _*)
      .agg(count(lit(1)).as("c")).localCheckpoint()
    val tot = cv.agg(sum(col("c")).as("nn"))
    val gv = cv.groupBy(col(sensitiveCol)).agg(sum(col("c")).as("g"))
    val cls = cv.groupBy(quasiCols.map(col): _*).agg(sum(col("c")).as("n"))
    cls.crossJoin(broadcast(gv)).crossJoin(broadcast(tot))
      .join(cv, quasiCols :+ sensitiveCol, "left")
      .withColumn("term",
        abs(d38(coalesce(col("c"), lit(0L))) * d38(col("nn")) -
          d38(col("g")) * d38(col("n"))))
      .groupBy(quasiCols.map(col): _*)
      .agg(first(col("n")).as("n"), first(col("nn")).as("nn"),
        sum(col("term")).as("ts"))
      .select(quasiCols.map(col) ++ Seq(
        col("n"),
        TimeSeries.portableRound6(col("ts").cast("double") /
          (lit(2.0) * col("n").cast("double") * col("nn").cast("double")))
          .as("tv")): _*)
      .withColumn("close", col("tv") <= t)
  }

  /** Contribution bounding — the differential-privacy PREP step (and
    * the fourth leg of the governance family): cap every user's
    * contribution per partition key at `cap` rows so one user cannot
    * dominate an aggregate (bounded sensitivity is what a DP noise
    * stage calibrates against; it's also the robustness fix for
    * whale-user skew in plain analytics). Rows kept are the FIRST
    * `cap` by `orderCol` — deterministic, not sampled. Reports, per
    * key: raw vs bounded exact cent sums, events dropped, users
    * capped (a user crossing the cap contributes exactly one row with
    * rank cap+1 — counted without a second pass), and the kept
    * fraction.
    *
    * Scale shape: one row_number window partitioned by (user, key) —
    * per-user-per-key groups are small by construction (that's the
    * point of the cap), so no single window partition can be a whale;
    * then one hash-agg to |keys| rows. */
  def contributionBound(events: DataFrame, userCol: String, keyCol: String,
                        valueCol: String, orderCol: String,
                        cap: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol), col(keyCol)).orderBy(col(orderCol))
    val cents = (col(valueCol).cast("decimal(18,2)") * 100)
      .cast("decimal(38,0)")
    events
      .select(col(keyCol), cents.as("x"), row_number().over(w).as("rn"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col("x")).as("raw"),
        sum(when(col("rn") <= cap, col("x")).otherwise(lit(0).cast("decimal(38,0)"))).as("bounded"),
        sum(when(col("rn") > cap, 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("rn") === cap + 1, 1L).otherwise(0L)).as("n_users_capped"))
      .select(col(keyCol), col("n_events"),
        col("raw").cast("long").as("raw_cents"),
        col("bounded").cast("long").as("bounded_cents"),
        col("n_dropped"), col("n_users_capped"),
        TimeSeries.portableRound6(col("bounded").cast("double") /
          nullif(col("raw"), lit(0).cast("decimal(38,0)")).cast("double"))
          .as("kept_frac"))
  }

  /** Deterministic per-group sample of exactly min(k, |group|) rows:
    * rank by the md5 of the id within each group and keep rank ≤ k —
    * the distributed reservoir whose selection is a pure function of
    * the data (rerunnable, layout-independent, incremental: a re-run
    * over a grown group re-draws fairly, unlike a true reservoir whose
    * state depends on arrival order). The rank-≤-k filter triggers
    * WindowGroupLimit, so every partition prunes to k rows per group
    * MAP-SIDE before the shuffle — the agg_kmv_rollup lesson: per-group
    * state never exceeds k. */
  def samplePerGroup(df: DataFrame, idCol: String, groupCol: String,
                     k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("rn", row_number().over(w)).where(col("rn") <= k).drop("rn")
  }

  /** Weighted sample WITHOUT replacement (Efraimidis–Spirakis A-ES):
    * each row draws priority key ln(u(id))/w — monotone in the classic
    * u^(1/w) — and the k largest keys win, so inclusion odds scale with
    * the weight while staying a pure function of the data (rerunnable,
    * layout-independent, incremental like every sampler here). One scan;
    * the global top-k is TakeOrderedAndProject, never a sort — the 100 TB
    * cost is the scan itself. Keys round engine-portably before ranking
    * (ties break on id) so the selection boundary is deterministic
    * across engines; rows with non-positive weight never sample. */
  def sampleWeighted(df: DataFrame, idCol: String, weightCol: String,
                     k: Int): DataFrame =
    df.where(col(weightCol) > 0)
      .withColumn("skey",
        TimeSeries.portableRound6(
          log(unitHash(col(idCol))) / col(weightCol).cast("double")))
      .orderBy(col("skey").desc, col(idCol).asc)
      .limit(k)

  /** Class-BALANCED downsample: every label keeps exactly k = (min class
    * size) rows, chosen by md5 rank — the deterministic equal-frequency
    * training set a classifier head wants from a skewed pool (where
    * [[stratifiedSample]] keeps a RATE per stratum, this pins the exact
    * per-class count to the rarest class). k is read with one bounded
    * 1-row collect (the Retrieval sidecar contract), so the per-label
    * limit is a LITERAL — Spark plans the rank filter as
    * WindowGroupLimit and prunes to k rows per label map-side BEFORE the
    * shuffle; a column-valued cap would shuffle whole classes. */
  def balancedSample(df: DataFrame, idCol: String, labelCol: String): DataFrame = {
    val k = df.groupBy(col(labelCol)).agg(count(lit(1)).as("n"))
      .agg(min(col("n"))).head().getLong(0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(labelCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.select(col(idCol), col(labelCol))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= lit(k))
      .select(col(idCol), col(labelCol))
  }

  /** Stratified downsample: at most ~`perStratum` rows per stratum,
    * selected by id-hash threshold rate = min(1, perStratum / n_stratum).
    * Two passes (stratum counts, then the filter) but the counts table is
    * one row per stratum — broadcast, never a shuffle of the corpus. The
    * kept subset is a deterministic function of the data. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       perStratum: Long): DataFrame = {
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_stratum"))
    df.join(broadcast(counts), stratumCol)
      .where(unitHash(col(idCol)) < least(lit(1.0), lit(perStratum.toDouble) / col("n_stratum")))
      .drop("n_stratum")
  }

  /** Context-window chunking: split each doc's token stream into
    * consecutive chunks of `chunkTokens` (last chunk ragged). Pure
    * map-side explode — no shuffle; output rows carry (id, chunk_idx,
    * n_tokens, chunk_text). This is the prep step before packing/
    * tokenization in an LLM data pipeline. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            chunkTokens: Int): DataFrame = {
    val toks = split(col(textCol), " ")
    val nChunks = ceil(size(toks).cast("double") / chunkTokens).cast("int")
    // null text → null nChunks → empty index array (greatest() would turn
    // the null into one junk chunk; sequence with a negative bound counts
    // DOWN — both traps dodged by the explicit guard).
    val idxs = when(nChunks >= 1, sequence(lit(0), nChunks - 1))
      .otherwise(array().cast("array<int>"))
    df.select(col(idCol), toks.as("t"), explode(idxs).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        least(size(col("t")) - col("chunk_idx") * chunkTokens, lit(chunkTokens))
          .cast("long").as("n_tokens"),
        concat_ws(" ", slice(col("t"), col("chunk_idx") * chunkTokens + 1, lit(chunkTokens)))
          .as("chunk_text"))
  }

  /** Content-defined chunking (the FastCDC/rsync boundary rule lifted to
    * token streams): a chunk boundary falls after token i whenever the
    * md5 hash of the w-gram ENDING at i is ≡ 0 (mod `modulus`) — so
    * boundaries depend only on local content, and inserting or deleting
    * text reshifts at most the chunks it touches (fixed-size chunking
    * shifts every later chunk — the property that makes CDC the dedup-
    * storage and incremental-sync primitive). Expected chunk length ≈
    * `modulus` tokens. Returns (id, chunk_idx, start_tok, n_tokens,
    * chunk_hash).
    *
    * Pure map-side explode, no shuffle: boundary detection, chunk spans,
    * and chunk hashing are all array expressions over the token array —
    * the same scan shape as [[chunk]]. Chunk hashes feed chunk-level
    * dedup exactly like document fingerprints feed [[Dedup.exact]]. */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
                w: Int = 3, modulus: Int = 32): DataFrame = {
    // tokens HOISTED into their own column before any lambda: the
    // boundary filter references them once per position, and an inline
    // split(text) there re-tokenizes the doc once PER POSITION (the
    // WordShingles lesson — HOF lambdas evaluate interpreted, no
    // cross-lambda subexpression elimination). __t is multi-referenced
    // (sizes, boundary probe, chunk hash), so CollapseProject keeps it
    // materialized instead of re-inlining the split.
    val pre = df.withColumn("__t", split(col(textCol), " "))
    val toks = col("__t")
    val n = size(toks)
    // boundary i ∈ [w, n]: md5 of tokens[i-w+1 .. i] ≡ 0 (mod modulus)
    val bIdx = when(n >= w,
      filter(sequence(lit(w), n), i =>
        pmod(conv(substring(md5(to_binary(
          concat_ws(" ", slice(toks, i - (w - 1), lit(w))), lit("utf-8"))), 1, 8),
          16, 10), lit(modulus.toLong)) === 0))
      .otherwise(array().cast("array<int>"))
    // chunk starts: position 1 plus every boundary+1 that still lands
    // inside the doc (a boundary at the last token closes the final
    // chunk, it does not open an empty one). get() is 0-based and
    // null-safe out of bounds (ANSI element_at would throw).
    val starts = filter(
      concat(array(lit(1)), transform(bIdx, _ + 1)), s => s <= n)
    // every input column except the text survives (event time included),
    // so the operator drops straight into a streaming DAG.
    val keep = df.columns.filterNot(_ == textCol).map(col)
    pre.withColumn("__n", n).withColumn("__starts", starts)
      .select(keep.toIndexedSeq ++ Seq(col("__t"), col("__n"),
        explode(transform(col("__starts"), (s, j) => struct(
          j.as("chunk_idx"), s.as("start"),
          (coalesce(get(col("__starts"), j + 1), col("__n") + 1) - 1).as("end"))))
          .as("b")): _*)
      .select(keep.toIndexedSeq ++ Seq(col("b.chunk_idx").as("chunk_idx"),
        col("b.start").cast("long").as("start_tok"),
        (col("b.end") - col("b.start") + 1).cast("long").as("n_tokens"),
        md5(to_binary(concat_ws(" ",
          slice(col("__t"), col("b.start"), col("b.end") - col("b.start") + 1)),
          lit("utf-8"))).as("chunk_hash")): _*)
  }

  /** Domain-mixing weights: per-stratum resampling weight that reshapes
    * the corpus toward `targets` (target share of the final mix). weight =
    * target_share · total / n_stratum — the multiplier a sampler applies
    * to each doc of that stratum; strata absent from `targets` weigh 0.
    * All arithmetic happens on the one-row-per-stratum counts table; the
    * corpus itself is never reshuffled. */
  def mixWeights(df: DataFrame, stratumCol: String,
                 targets: Map[String, Double]): DataFrame = {
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
    // window over the unpartitioned counts table: one row per stratum,
    // so the single-partition window is a few dozen rows, not the corpus.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    counts
      .withColumn("total", sum(col("n")).over(w))
      .withColumn("weight",
        coalesce(element_at(typedLit(targets), col(stratumCol)), lit(0.0))
          * col("total") / col("n"))
      .select(col(stratumCol), col("n"), col("weight"))
  }

  /** Data-constrained epoch allocation (the Muennighoff question: "my
    * budget exceeds my unique supply — how many passes of each source?"):
    * split an integer token budget B across sources in proportion to
    * `weight`, with each source CAPPED at `maxRepeat` passes of its own
    * supply — alloc_i = min(maxRepeat·U_i, t·w_i) with the water level t
    * chosen so Σ alloc = B. Exact INTEGER waterfilling, closed form (no
    * iteration): sort sources by cap/weight ascending — the order they
    * saturate as t rises — and source j saturates iff its cap is below
    * its fair share of what's left after saturating every cheaper
    * source: cap_j · W_suffix(j) ≤ (B − C_prefix(j)) · w_j, tested in
    * DECIMAL(38,0) cross-multiplication (never a float water level).
    * Unsaturated sources then split the residual by weight with
    * largest-remainder rounding, so Σ alloc = B EXACTLY whenever
    * B ≤ Σ caps (otherwise every source caps and the shortfall is the
    * report's headline). Output: per source, supply / cap / alloc /
    * epochs = alloc/supply.
    *
    * Shape: one corpus hash-agg builds (source, U); everything after
    * runs windowed on the |sources| table — the mix_token_budget
    * discipline. The float appears only in the saturation-ORDER key
    * (a deterministic ratio; ties broken by source) and the final
    * epochs rounding. */
  def waterfillBudget(counts: DataFrame, srcCol: String,
                      budgetNum: Long, budgetDen: Long,
                      maxRepeat: Int): DataFrame = {
    require(budgetNum > 0 && budgetDen > 0 && maxRepeat > 0)
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def fdiv(a: Column, b: Column) = Stats.fdiv(a, b)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val ord = org.apache.spark.sql.expressions.Window
      .orderBy((col("cap").cast("double") / col("weight").cast("double")).asc,
        col(srcCol))
    val pre = ord.rowsBetween(Long.MinValue, -1)
    val staged = counts
      .withColumn("cap", col("available") * maxRepeat)
      .withColumn("b",
        fdiv(sum(col("available")).over(wAll) * budgetNum, lit(budgetDen)))
      .withColumn("cprev", coalesce(sum(col("cap")).over(pre), lit(0L)))
      .withColumn("wsuff",
        sum(col("weight")).over(wAll) -
          coalesce(sum(col("weight")).over(pre), lit(0L)))
      .withColumn("sat",
        col("cap").cast(d38) * col("wsuff").cast(d38) <=
          (col("b") - col("cprev")).cast(d38) * col("weight").cast(d38))
    val leveled = staged
      .withColumn("csat",
        coalesce(sum(when(col("sat"), col("cap"))).over(wAll), lit(0L)))
      .withColumn("wunsat",
        coalesce(sum(when(!col("sat"), col("weight"))).over(wAll), lit(0L)))
      .withColumn("residual", col("b") - col("csat"))
      .withColumn("base",
        when(col("sat"), col("cap"))
          .otherwise(fdiv(col("residual") * col("weight"), col("wunsat"))))
      .withColumn("rem",
        when(col("sat"), lit(-1L))
          .otherwise(pmod(col("residual") * col("weight"), col("wunsat"))))
    val wRem = org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col(srcCol))
    leveled
      .withColumn("leftover",
        col("residual") - sum(when(!col("sat"), col("base"))).over(wAll))
      .withColumn("bump",
        when(!col("sat") && row_number().over(wRem) <= col("leftover"), 1L)
          .otherwise(0L))
      .select(col(srcCol), col("available"), col("cap"),
        (col("base") + col("bump")).as("alloc"),
        TimeSeries.portableRound6(
          (col("base") + col("bump")).cast("double") /
            col("available").cast("double")).as("epochs"))
  }

  /** Apply mixing weights as a DETERMINISTIC resampler — the missing
    * half of [[mixWeights]]: each doc of a stratum with weight w emits
    * n_copies = ⌊w⌋ + [u(id) < frac(w)] rows' worth of presence
    * (stochastic rounding on the unit hash), so downsampling (w < 1)
    * and upsampling (w > 1) fall out of one rule and E[n_copies] = w
    * exactly. Determinism makes the resample reproducible across
    * retries/engines — the same property the split/sample ops pin.
    * Weights join back broadcast (strata-count rows); the corpus is
    * scanned once, never shuffled. */
  def applyMixture(df: DataFrame, idCol: String, stratumCol: String,
                   targets: Map[String, Double]): DataFrame = {
    val w = mixWeights(df, stratumCol, targets)
      .select(col(stratumCol), col("weight"))
    df.join(broadcast(w), stratumCol)
      .withColumn("n_copies",
        (floor(col("weight")) +
          when(unitHash(col(idCol)) < col("weight") - floor(col("weight")), 1)
            .otherwise(0)).cast("long"))
      .where(col("n_copies") > 0)
      .select(col(idCol), col(stratumCol), col("n_copies"))
  }

  case class PackedDoc(id: Long, n_tokens: Long)
  case class PackedBin(bin_key: Long, bin_idx: Int, ids: Seq[Long], total_tokens: Long)

  /** Greedy sequence packing: assign docs to bins of at most `binTokens`
    * tokens (first-fit in deterministic id order), the step that turns
    * chunked docs into fixed-budget training sequences.
    *
    * Distribution contract: packing is per PARTITION KEY (`pmod(id, numBins)`
    * shards), each shard packed independently in sorted-id order inside one
    * task via mapPartitions — embarrassingly parallel, deterministic, no
    * global sort. Cross-shard bin fill is slightly less tight than a global
    * greedy pass, which cannot exist at 100 TB anyway (it is inherently
    * sequential); per-shard waste is bounded by one doc per bin.
    * Docs longer than `binTokens` get a bin of their own (they would be
    * chunked upstream by [[chunk]]).
    */
  def packGreedy(docs: Dataset[PackedDoc], binTokens: Long,
                 numShards: Int = 32): Dataset[PackedBin] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(d => math.floorMod(d.id, numShards.toLong))
      .flatMapGroups { (shard, it) =>
        val sorted = it.toArray.sortBy(_.id)
        val bins = scala.collection.mutable.ArrayBuffer.empty[(Long, List[Long])]
        // first-fit over open bins; docs arrive in id order so the result
        // is a pure function of the shard's contents.
        sorted.foreach { d =>
          bins.indexWhere(_._1 + d.n_tokens <= binTokens) match {
            case -1 => bins += ((d.n_tokens, List(d.id)))
            case i  => val (tot, ids) = bins(i); bins(i) = (tot + d.n_tokens, d.id :: ids)
          }
        }
        bins.iterator.zipWithIndex.map { case ((tot, ids), i) =>
          PackedBin(shard, i, ids.sorted, tot)
        }
      }
  }

  /** NEXT-fit sequence packing: like [[packGreedy]] but only the latest
    * bin stays open — a doc that does not fit CLOSES it and opens bin
    * idx+1. Slightly looser fill than first-fit, but the bin assignment
    * is a prefix fold over (shard, id-order, n_tokens) alone, so the
    * whole packing is expressible as a sequential recurrence — the
    * variant an external SQL engine can replay row for row, which makes
    * it hash-checkable end to end (first-fit's open-bin list is not).
    * Same distribution contract: independent per-shard folds, one task
    * each, no global sort. */
  def packNextFit(docs: Dataset[PackedDoc], binTokens: Long,
                  numShards: Int = 32): Dataset[PackedBin] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(d => math.floorMod(d.id, numShards.toLong))
      .flatMapGroups { (shard, it) =>
        val sorted = it.toArray.sortBy(_.id)
        val bins = scala.collection.mutable.ArrayBuffer.empty[(Long, List[Long])]
        sorted.foreach { d =>
          bins.lastOption match {
            case Some((tot, ids)) if tot + d.n_tokens <= binTokens =>
              bins(bins.length - 1) = (tot + d.n_tokens, d.id :: ids)
            case _ => bins += ((d.n_tokens, List(d.id)))
          }
        }
        bins.iterator.zipWithIndex.map { case ((tot, ids), i) =>
          PackedBin(shard, i, ids.sorted, tot)
        }
      }
  }

  /** Token-budget shard assignment: docs fill shards in `idCol` order
    * (ids must be unique), doc d landing in shard
    * floor(tokens_before_d / budget) — the GLOBAL running token total.
    * Returns (idCol, n_tokens, shard). This is the output-sharding step
    * of corpus assembly: contiguous id ranges per shard, every shard
    * within one document of the budget.
    *
    * Scale shape — a distributed prefix sum, NOT a global window (a
    * `sum over (order by id)` with no partition key moves the whole
    * corpus onto ONE task): range-repartition + sort on id (the ONLY
    * wide shuffle), a P-row partial-total aggregate collected driver-side
    * (P = partitions — bounded by cluster size, not data), offsets
    * broadcast back, and a per-partition running fold. The fold is
    * `mapPartitions` by design: prefix sum is genuinely order-dependent
    * imperative logic, and the declarative alternative (a window keyed on
    * the partition id) costs a SECOND full-corpus shuffle because Spark
    * cannot see that rows are already co-located by that key. The input
    * is cached so both passes see identical partition ids. */
  def shardByTokenBudget(docs: DataFrame, idCol: String, textCol: String,
                         budget: Long, partitions: Int = 0): DataFrame =
    shardByBudget(docs.select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).as("n_tokens")),
      idCol, budget, partitions)

  /** Core of [[shardByTokenBudget]], over any per-doc cost table
    * (idCol, n_tokens) — whitespace tokens, BPE tokens
    * ([[Bpe.encodeTokenCounts]]), byte sizes: the budget semantics and
    * the distributed prefix-sum shape are cost-agnostic. */
  def shardByBudget(counts: DataFrame, idCol: String,
                    budget: Long, partitions: Int = 0): DataFrame = {
    require(budget > 0, "positive token budget")
    val spark = counts.sparkSession
    import spark.implicits._
    val p = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    val toks = counts
      .select(col(idCol), col(counts.columns(1)).cast("long").as("n_tokens"))
      .repartitionByRange(p, col(idCol))
      .sortWithinPartitions(idCol)
      .withColumn("pid", spark_partition_id())
      .persist()
    val partials = toks.groupBy("pid").agg(sum("n_tokens").as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = { // offset(pid) = total tokens in all partitions before it
      var acc = 0L
      partials.map { case (pid, t) => val o = (pid, acc); acc += t; o }.toMap
    }
    val bcOff = spark.sparkContext.broadcast(offsets)
    toks.as[(Long, Long, Int)].mapPartitions { it =>
      var acc = -1L // offset of the first row's partition, lazily resolved
      it.map { case (id, n, pid) =>
        if (acc < 0) acc = bcOff.value(pid)
        val shard = acc / budget
        acc += n
        (id, n, shard)
      }
    }.toDF(idCol, "n_tokens", "shard")
  }

  /** Corpus snapshot diff — the delta between two versions of a corpus
    * (yesterday's crawl vs today's): every id classified as `added`,
    * `removed`, `changed`, or `unchanged` by comparing an md5 content
    * digest over `digestCols`. The engine's version-control primitive:
    * incremental re-processing downstream (re-embed only `added ∪
    * changed`, purge `removed` from indexes) keys off this table.
    *
    * Shape: digests are map-side (one md5 per row, no payload ever
    * shuffles — only id + 32-byte digest), then ONE full outer join on
    * the id. At 100 TB both snapshots live as id-bucketed tables, making
    * the join zero-exchange; unbucketed it is the unavoidable one
    * shuffle per side. Reference analog: none (numaflow has no corpus
    * versioning) — this is training-data-pipeline surface. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                   digestCols: Seq[String]): DataFrame = {
    require(digestCols.nonEmpty, "digestCols must be non-empty")
    def digested(df: DataFrame, as: String) = df.select(
      col(idCol),
      md5(concat_ws("", digestCols.map(c => col(c).cast("string")): _*))
        .as(as))
    digested(oldDf, "old_digest")
      .join(digested(newDf, "new_digest"), Seq(idCol), "full_outer")
      .select(col(idCol), when(col("old_digest").isNull, "added")
        .when(col("new_digest").isNull, "removed")
        .when(col("old_digest") =!= col("new_digest"), "changed")
        .otherwise("unchanged").as("change"))
  }

  /** Cross-split leakage audit: near-duplicate pairs that STRADDLE the
    * train/val/test boundary of [[hashSplit]]. A hash split only
    * guarantees each DOC lands in one side — near-copies of a training
    * doc land in val/test with probability ≈ 2·p·(1−p), silently turning
    * held-out loss into memorization credit (the split-level face of the
    * contamination problem `contam_frac` measures against an external
    * eval set). Run this BEFORE trusting any eval on a hash-split corpus;
    * the fix is splitting by dup-CLUSTER ([[Dedup.connectedComponents]]
    * representative), not by doc.
    *
    * Scale shape: candidate generation and verification are
    * [[Dedup.lshVerifiedPairs]] (banded MinHash → exact-Jaccard verify,
    * never all-pairs); the split labels join in on the pair ids —
    * broadcast-sized per candidate batch. Output: one row per verified
    * crossing pair with both splits and the exact Jaccard. */
  /** Leakage-free train/val/test assignment: split by near-dup CLUSTER,
    * not by doc — every doc carries its [[Dedup.dupClusters]]
    * representative, and the [[hashSplit]] hash is taken of the
    * representative, so a doc and all its near-copies land on the same
    * side BY CONSTRUCTION. The guarantee is structural, not statistical:
    * any pair [[splitLeakage]] could report is LSH-connected, hence
    * same-cluster, hence same-split (DiversityOpsSpec proves zero
    * leakage on the corpus where the doc-hash split leaks).
    *
    * Scale: the CC label pass is the star-edge loop (linear edge volume,
    * diameter-bounded rounds); the split itself is one md5 projection —
    * nothing beyond dupClusters' own cost. */
  def clusterSplit(docs: DataFrame, idCol: String, textCol: String,
                   splits: Seq[(String, Double)],
                   numPerm: Int = 12, rowsPerBand: Int = 3,
                   shingleW: Int = 3): DataFrame =
    clusterSplitOf(Dedup.dupClusters(docs, idCol, textCol, numPerm,
      rowsPerBand, shingleW), idCol, splits)

  /** The split projection alone, over a PRE-BUILT cluster map — the
    * sidecar-table shape (see [[graft.ops.Sidecar]]). */
  def clusterSplitOf(clusters: DataFrame, idCol: String,
                     splits: Seq[(String, Double)]): DataFrame =
    hashSplit(clusters, "cluster_id", splits)
      .select(col(idCol), col("cluster_id"), col("split"))

  def splitLeakage(docs: DataFrame, idCol: String, textCol: String,
                   splits: Seq[(String, Double)],
                   threshold: Double): DataFrame =
    splitLeakageOf(Dedup.lshVerifiedPairs(docs, idCol, textCol, threshold),
      docs, idCol, splits)

  /** The leakage audit alone, over a PRE-BUILT verified pair table
    * (a, b, jaccard) already filtered to the caller's threshold — the
    * sidecar-table shape. */
  def splitLeakageOf(pairs: DataFrame, docs: DataFrame, idCol: String,
                     splits: Seq[(String, Double)]): DataFrame = {
    val sp = hashSplit(docs.select(col(idCol)), idCol, splits)
    pairs
      .join(sp.select(col(idCol).as("a"), col("split").as("split_a")), "a")
      .join(sp.select(col(idCol).as("b"), col("split").as("split_b")), "b")
      .where(col("split_a") =!= col("split_b"))
      .select(col("a"), col("b"), col("split_a"), col("split_b"),
        col("jaccard"))
  }
}
