package graft

/** Physical-plan regression guards: the scale design (pushdown, pruning,
  * broadcast choices, shuffle-free map stages, top-k without global sort)
  * asserted as tests, so a refactor that silently degrades a plan shape
  * fails here rather than at 100 TB. Uses the declared queries at
  * sf0.001 — plan SHAPE, not timing. */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  /** The plan AFTER execution — AQE's final shape (ReusedExchange,
    * runtime join demotions) only exists once the query has run. */
  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def countOf(s: String, token: String): Int =
    s.sliding(token.length).count(_ == token)

  test("map-only queries plan with zero exchanges") {
    for (q <- Seq("split_assign", "pack_chunks", "mm_meta", "emb_quantize",
        "text_fingerprint", "m1_flatmap", "curate_filter", "text_winnow",
        "text_gopher", "text_derep", "mm_audio_pcm")) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q should not shuffle:\n$p")
    }
  }

  test("stratified sample broadcasts the counts table, never the corpus") {
    val p = plan("sample_stratified")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"corpus side must not sort-merge:\n$p")
  }

  test("dimension join chain is all broadcast, no sort-merge") {
    val p = plan("join_broadcast")
    assert(countOf(p, "BroadcastHashJoin") >= 3, p) // supplier, nation, region
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("topk_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("TPC-H Q3/Q5 shapes: filtered dims broadcast, dates push down, no global sort") {
    val p3 = plan("q3_shipping")
    assert(p3.contains("TakeOrderedAndProject"), p3)  // top-10, never a full sort
    assert(p3.contains("BroadcastHashJoin"), p3)      // filtered customer side
    assert(p3.contains("PushedFilters"), p3)
    assert(p3.contains("1998-06-15"), s"date filter must reach a scan:\n$p3")
    val p5 = plan("q5_region")
    assert(countOf(p5, "BroadcastHashJoin") >= 3, p5) // supplier, nation, region
    assert(!p5.contains("CartesianProduct"), p5)
  }

  test("projection+filter reach the parquet scan (pushdown + pruning)") {
    val p = plan("m1_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p)
    // pruned scan: revenue needs 4 columns, the table has 16.
    assert(p.contains("l_extendedprice") && !p.contains("l_comment"), p)
  }

  test("q1 aggregation is partial+final hash agg") {
    val p = plan("q1_agg")
    assert(countOf(p, "HashAggregate") >= 2, p)
    assert(p.contains("partial_"), p)
  }

  test("rank-filter windows get WindowGroupLimit (map-side top-k pruning)") {
    // rn <= k over a window must trigger Spark's group-limit rewrite:
    // per-partition limits run BEFORE the shuffle, so only k·keys rows
    // move — the declarative twin of Relational.topKPerKey's aggregator.
    val p = plan("wf_rank")
    assert(countOf(p, "WindowGroupLimit") >= 2, p) // partial + final
    // the per-group reservoir rides the same rewrite: k rows per source
    // survive each partition map-side, state never holds a whole group
    val ps = plan("sample_per_source")
    assert(countOf(ps, "WindowGroupLimit") >= 2, ps)
    // Hill tail index: rn <= 101 over the per-type value rank — only
    // ~101 rows per type may ever reach the shuffle, or the top-k scan
    // degrades to a full per-type sort at corpus scale
    val ph = plan("stat_tail_index")
    assert(countOf(ph, "WindowGroupLimit") >= 2,
      s"stat_tail_index lost its map-side prune:\n$ph")
  }

  test("round-12 second-continuation family: no cartesians, broadcast join-backs") {
    // ts family: everything after resample's hash-agg is grid-bounded —
    // a SortMergeJoin or cartesian means a key/lag join lost its
    // broadcast/equi shape and would shuffle corpus-scale rows
    for (q <- Seq("ts_periodogram", "ts_pacf", "ts_ljungbox", "ts_hurst",
                  "ts_permentropy")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q went cartesian:\n$p")
    }
    // Levene family + entropy rate + wilcoxon: the per-row join-back of
    // tiny per-group tables must broadcast, never sort-merge the corpus
    for (q <- Seq("stat_levene", "stat_levene_bf", "ev_entropy_rate",
                  "stat_wilcoxon", "stat_trend")) {
      val p = plan(q)
      assert(!p.contains("SortMergeJoin"),
        s"$q sort-merges its broadcast join-back:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q went cartesian:\n$p")
    }
    // RBO: two bounded broadcast probes — the corpus must never
    // exchange on the probe path
    val pr = plan("eval_rbo")
    assert(!pr.contains("SortMergeJoin") && !pr.contains("CartesianProduct"),
      s"eval_rbo probe legs degraded:\n$pr")
  }

  test("lineage-sensitive aggs keep map-side partial aggregation") {
    // minhash signature: one shuffle for the groupBy(doc_id), with
    // map-side partial minimums before it.
    val p = plan("dedup_minhash")
    assert(p.contains("partial_min") || p.contains("partial_"), p)
  }

  test("BM25 scoring is scan-shaped: stats broadcast, corpus never shuffles") {
    val p = plan("text_bm25")
    // the only join is the broadcast of the 1-row stats aggregate
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"corpus must not sort-merge:\n$p")
    // corpus side reaches the join without an exchange: the only
    // exchanges feed the singleton stats aggregate
    assert(countOf(p, "Exchange hashpartitioning") == 0, p)
  }

  test("TF-IDF joins idf back broadcast and prunes top-k map-side") {
    val p = plan("text_tfidf")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(countOf(p, "WindowGroupLimit") >= 2, s"rank<=k must prune:\n$p")
  }

  test("dup-fraction explodes the corpus once (window, not agg+self-join)") {
    // the contract lives in the from-scratch operator (the registered
    // query reads the span-coverage sidecar — asserted below): ONE
    // Generate total — the span posexplode. The per-span position
    // explode is gone (r16): the covered-token count folds over the
    // sorted match starts (Dedup.coveredLen), so neither an agg+join
    // double span explode nor the w-way position fan may reappear.
    val p = graft.ops.Dedup.dupFraction(
        spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(countOf(p, "Generate explode") + countOf(p, "Generate posexplode") == 1, p)
  }

  test("dup-fraction consumer reads the coverage sidecar, never re-explodes") {
    val p = plan("dedup_dupfrac")
    assert(!p.contains("Generate"), s"consumer must not rebuild spans:\n$p")
    assert(p.contains("ExistingRDD"), s"consumer must read the sidecar:\n$p")
  }

  test("pivot compiles to one grouped pass, not per-column scans") {
    val p = plan("agg_pivot")
    assert(countOf(p, "Scan parquet") == 1, p)
    assert(countOf(p, "HashAggregate") >= 2, p) // partial + final
  }

  test("classifier and CDC chunking are scan-shaped: zero exchanges") {
    for (q <- Seq("text_classify", "pack_cdc")) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q should not shuffle:\n$p")
      assert(countOf(p, "Scan parquet") == 1, s"$q reads the corpus once:\n$p")
    }
  }

  test("attribution is one shuffle on user_id, no join") {
    val p = plan("ev_attribution")
    // union + window: a single hashpartitioning exchange on user_id moves
    // clicks+purchases once; there is no join operator at all.
    assert(countOf(p, "Exchange hashpartitioning") == 1, p)
    assert(!p.contains("Join"), s"as-of via window, not join:\n$p")
  }

  test("frozen IVF probes join broadcast — corpus never re-shuffles") {
    // since the native SquaredDistances kernel replaced the unrolled
    // literal chains, no persist workaround is needed: the corpus side is
    // scan → project → broadcast-join, one straight codegen pipeline.
    for (q <- Seq("sim_ann_ivf", "sim_ann_ivfpq", "sim_ann_ivfpq_res")) {
      val p = plan(q)
      // the tiny probed query set broadcasts onto the corpus postings
      assert(p.contains("BroadcastHashJoin"), s"$q:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q corpus must not sort-merge:\n$p")
      // the only exchange is the top-k window's partition by query_id
      assert(countOf(p, "Exchange hashpartitioning") <= 1, s"$q:\n$p")
    }
  }

  test("keep-best is a partial-agg arg-max, never a per-cluster sort window") {
    // struct-max buffers aren't hash-aggregable so Spark plans
    // SortAggregate — fine: what matters at scale is that PARTIAL
    // aggregation collapses each partition to one row per cluster
    // BEFORE the exchange (a rank-1 window shuffles every row instead).
    val p = plan("dedup_keep_best")
    assert(!p.contains("Window"), s"arg-max must stay an aggregate:\n$p")
    assert(p.contains("partial_max"), s"map-side partial must run pre-shuffle:\n$p")
  }

  test("generation-eval clips are row-local: one pair join, no gram exchange") {
    // the native clip kernels (NgramClip / CharBigramClip) score each
    // pair inside its own task — the ONLY exchanges in the plan are the
    // doc_id pair join's (plus eval_bleu_corpus's 1-row final agg); a
    // regression to the (pair, gram) explode shape re-shuffles gram
    // volume (≈2x corpus tokens/chars) and shows up as extra exchanges
    for (q <- Seq("eval_chrf", "eval_bleu", "eval_rouge2", "eval_token_f1",
                  "eval_rouge_l", "eval_wer")) {
      val p = plan(q)
      assert(countOf(p, "Exchange") <= 2, s"$q grew a gram shuffle:\n$p")
      assert(!p.contains("Generate explode"), s"$q must not explode grams:\n$p")
    }
  }

  test("interpolated LM: AQE reuses the shared bigram/unigram exchanges at runtime") {
    // the LM kernel's model tables (bigram counts, first-token totals,
    // unigram total) are independent branches over the same two
    // aggregate subtrees; the scale contract is that AQE's exchange
    // reuse deduplicates them AT RUNTIME (measured: eagerly
    // checkpointing the model tables instead is 1.7x SLOWER — it
    // serializes jobs AQE would overlap and erases broadcast stats).
    // A refactor that perturbs subtree identity (e.g. a stray alias on
    // one branch) silently re-scans the corpus five times — this guard
    // fails first.
    val p = finalPlan("text_lm_interp")
    assert(p.contains("isFinalPlan=true"), p.take(500))
    assert(countOf(p, "ReusedExchange") >= 3,
      s"expected >=3 reused exchanges:\n${p.take(3000)}")
  }

  test("semdedup reference: pair stage joins the persisted assignment, corpus scans once per side") {
    // the exhaustive reference is spec-only (evicted from the registry:
    // scale-unbounded), so build its plan from the operator directly
    val p = graft.ops.Similarity.semDedup(
        spark.read.parquet(s"$dir/embeddings.parquet"),
        "vec_id", "embedding", threshold = 0.2, k = 8, dim = 64)
      .queryExecution.executedPlan.toString
    // the assignment table is cached: both pair sides and the final
    // labeling read InMemoryTableScan, never re-running the distance
    // projection over the parquet scan. (The plan TEXT repeats the cached
    // relation's build plan under every InMemoryTableScan, so the scan
    // count cannot be asserted from the string — the cache reads are the
    // guarantee.)
    assert(countOf(p, "InMemoryTableScan") >= 3, p)
  }

  test("semdedup (production/capped): assignment cached, sizes broadcast, keyed pair join") {
    val p = plan("emb_semdedup")
    // the k×dim distance chain runs once: sizes, both pair sides, and the
    // final labeling all read the persisted assignment
    assert(countOf(p, "InMemoryTableScan") >= 3, p)
    // the k-row cell-size table rides a broadcast, never a shuffle
    assert(p.contains("BroadcastHashJoin"), p)
    // pair formation is an equi-join on (cell, sub) — a keyed exchange
    // that spreads hot cells across tasks, never a product
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("emb_neardup crossJoin is absolutely bounded — cap pushed to both scans") {
    // The exact-cosine pair scan may crossJoin ONLY because both sides are
    // capped at a constant (vec_id < 500): a fractional subset (% 10)
    // keeps the join O((N/10)^2) — quadratic in corpus size. Guard that
    // the absolute cap reaches BOTH parquet scans as a pushed filter, so
    // a refactor back to an unbounded or fractional side fails here.
    val p = plan("emb_neardup")
    assert(countOf(p, "LessThan(vec_id,500)") >= 2,
      s"both crossJoin sides must scan with the absolute cap pushed down:\n$p")
    assert(!p.contains("SortMergeJoin"), s"capped sides must broadcast:\n$p")
  }

  test("emb_dim_stats aggregates map-side: shuffle carries dims, not the corpus") {
    val p = plan("emb_dim_stats")
    // partial HashAggregate below the exchange collapses every partition
    // to <= 64 dim rows before anything moves.
    assert(p.contains("HashAggregate"), p)
    val firstAgg = p.indexOf("HashAggregate")
    val exch = p.indexOf("Exchange hashpartitioning")
    assert(exch > firstAgg, s"final agg must sit above the exchange:\n$p")
    assert(p.indexOf("HashAggregate", exch) > 0,
      s"partial agg must sit below the exchange:\n$p")
  }

  test("purge_closure broadcasts the seed clusters, never the corpus") {
    val p = plan("purge_closure")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("int8 retrieval: calibration and queries broadcast, corpus scans once") {
    val p = plan("sim_topk_int8")
    // two broadcasts (1-row calibration onto each side, quantized queries
    // onto the corpus scan); the corpus itself must not sort-merge.
    assert(countOf(p, "BroadcastNestedLoopJoin") + countOf(p, "BroadcastExchange") >= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("shard_tokens: prefix sum is partition-parallel, never a one-task window") {
    val p = plan("shard_tokens")
    // The decomposition's whole point: no global-window collapse onto one
    // task, and no second full-corpus shuffle keyed on the partition id —
    // the fold consumes the range-sorted partitions in place.
    assert(!p.contains("Exchange SinglePartition"),
      s"prefix sum must not serialize onto one task:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"fold must reuse the range layout, not re-shuffle:\n$p")
    assert(p.contains("MapPartitions"), p)
  }

  test("bloom incremental dedup filters the increment BELOW its exchange") {
    val p = plan("dedup_bloom_incr")
    // The bloom membership probe must run map-side: in the physical tree
    // the UDF filter appears in the increment's scan stage, before any
    // Exchange — at scale this is what keeps a clean crawl from shuffling
    // its whole span universe.
    val udfAt = p.indexOf("bloom_might_contain")
    assert(udfAt >= 0, s"bloom probe missing from plan:\n$p")
    val stageEnd = p.indexOf("Exchange", udfAt)
    val gen = p.indexOf("Generate", udfAt) // the explode feeding the filter
    assert(gen >= 0 && (stageEnd < 0 || gen < stageEnd),
      s"bloom filter must sit on the scan side of the shuffle:\n$p")
  }

  test("kmeans: assignments never sort-merge; centroids come back broadcast") {
    val p = plan("emb_kmeans")
    // seed assignment is a literal-matrix projection and the updated
    // centers return as a one-row broadcast — the corpus joins nothing
    // the sort-merge way.
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"corpus must not sort-merge:\n$p")
    assert(p.contains("squareddistances"), s"native kernel missing:\n$p")
  }

  test("edit dedup: one exchange builds the blocks; pairs expand map-side") {
    val p = plan("dedup_edit")
    // block agg = partial + final hash agg pair → exactly one shuffle of
    // (block, id, head); the pair fan-out is a Generate above it, never
    // a self-join of the corpus.
    assert(countOf(p, "Exchange hashpartitioning") === 1, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"), p)
    assert(p.contains("Generate"), p)
  }

  test("snapshot diff shuffles digests, not payloads") {
    val p = plan("corpus_diff")
    assert(p.contains("FullOuter"), p)
    // one exchange per side, and each side's md5 projection sits BELOW
    // its exchange in the tree (deeper = later in the plan print): the
    // join moves 8B id + 32B digest per row regardless of document size.
    assert(countOf(p, "Exchange hashpartitioning") === 2, p)
    val firstEx = p.indexOf("Exchange hashpartitioning")
    val lastEx = p.lastIndexOf("Exchange hashpartitioning")
    assert(p.indexOf("md5", firstEx) > firstEx, s"digest above exchange:\n$p")
    assert(p.indexOf("md5", lastEx) > lastEx, s"digest above exchange:\n$p")
  }

  test("CMS heavy hitters: the sketch joins back broadcast") {
    val p = plan("agg_cms_hh")
    assert(p.contains("BroadcastHashJoin"), p)
    // the candidate set must never cartesian against the sketch
    assert(!p.contains("CartesianProduct"), p)
  }

  test("IVM: untouched view rows pass through a broadcast anti join") {
    val p = plan("view_ivm")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"base view must split on a broadcast of delta keys:\n$p")
  }

  test("BPE encode is one scan + one doc aggregate") {
    val p = plan("text_bpe_encode")
    assert(countOf(p, "Exchange hashpartitioning") === 1,
      s"encode must shuffle only the per-doc token counts:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("perceptual hash is row-local: zero exchanges") {
    val p = plan("mm_phash")
    assert(!p.contains("Exchange"), s"mm_phash should not shuffle:\n$p")
  }

  test("triangle census never goes cartesian") {
    val p = plan("graph_triangles")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("RFM segmentation has no single-task window") {
    val p = plan("ev_rfm")
    assert(!p.contains("Window"), s"ntile must be the distributed rank:\n$p")
  }

  test("bloom join probes lineitem map-side, inside codegen") {
    val p = plan("join_bloom")
    assert(p.contains("bloom_might_contain"), p)
    // the probe must sit on the scan side, before any join machinery:
    // the first bloom_might_contain occurrence is DEEPER in the printed
    // tree than the join operator itself
    assert(p.indexOf("bloom_might_contain") > p.indexOf("Join"), p)
  }

  test("Q9 shape: part/supplier/nation broadcast; only orders meets lineitem wide") {
    val p = plan("q9_profit")
    assert(countOf(p, "BroadcastHashJoin") >= 3, p)
    assert(p.contains("PushedFilters"), p)
  }

  test("Q7 shape: nation prune reaches both dimension scans pre-join") {
    val p = plan("q7_volume")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the isin(1,2) restriction must push into BOTH the supplier and
    // customer parquet scans, not run as a post-join filter
    assert(countOf(p, "In(s_nationkey, [1,2])") >= 1, p)
    assert(countOf(p, "In(c_nationkey, [1,2])") >= 1, p)
  }

  test("Q21 shape: one lineitem pass, supplier broadcast, no EXISTS rejoin") {
    val p = plan("q21_waiting")
    assert(countOf(p, "lineitem.parquet") == 1, p) // never rejoined
    assert(p.contains("BroadcastHashJoin"), p)     // supplier names
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the multi-countDistinct form planned an Expand (3x the joined rows
    // through the shuffle); the two-hash-agg rewrite must never reintroduce it
    assert(!p.contains("Expand"), p)
  }

  test("Q18 shape: survivor set joins broadcast; top-100 never global-sorts") {
    val p = plan("q18_large_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
    assert(!p.contains("CartesianProduct"), p)
    // lineitem feeds ONE aggregate; it is never rejoined for sum_qty
    assert(countOf(p, "lineitem.parquet") == 1, p)
  }

  test("Q4 shape: EXISTS is a left-semi with the correlated date predicate in-join") {
    val p = plan("q4_priority")
    assert(p.contains("LeftSemi"), p)                // never a dedup'd inner rejoin
    assert(p.contains("1997-01-01"), s"order date prune must reach the scan:\n$p")
    assert(countOf(p, "lineitem.parquet") == 1, p)
    assert(!p.contains("SortMergeJoin") || p.contains("LeftSemi"), p)
  }

  test("Q6 shape: pure scan aggregate, every predicate pushed, zero joins") {
    val p = plan("q6_forecast")
    assert(!p.contains("Join"), p)
    assert(countOf(p, "Exchange") == 1, p)           // only the final 1-row agg
    // (PushedFilters renders truncated; assert on the Filter text)
    assert(p.contains(">= 1997-01-01"), p)
    assert(p.contains(">= 0.05)"), p)
  }

  test("Q15 shape: ONE lineitem scan feeds both the max subquery and the probe") {
    val p = plan("q15_top_supplier")
    assert(countOf(p, "lineitem.parquet") == 0, p)   // checkpointed: scan ran once, eagerly
    assert(p.contains("Scan ExistingRDD") || p.contains("LocalTableScan"), p)
    assert(p.contains("BroadcastHashJoin"), p)       // 1-row max + supplier names
  }

  test("Q17 shape: brand prune broadcasts into BOTH lineitem passes map-side") {
    val p = plan("q17_small_qty")
    assert(countOf(p, "EqualTo(p_brand,Brand#1)") == 2, p) // both part scans pruned
    assert(countOf(p, "BroadcastHashJoin") >= 2, p)  // part onto each pass
    assert(!p.contains("CartesianProduct"), p)
  }

  test("Q19 shape: the part-only disjunction prunes the build side at its scan") {
    val p = plan("q19_disjunct")
    assert(p.contains("In(p_brand"), p)              // brand ∈ {1,2,3} pushed
    assert(p.contains("Or(Or(And(GreaterThanOrEqual(l_quantity"), p) // qty ranges pushed
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("Q22 shape: threshold is a 1-row broadcast; inactivity is a broadcast anti join") {
    val p = plan("q22_opportunity")
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(p.contains("GreaterThan(c_acctbal,0.0)"), p) // stats filter pushed
  }

  test("Q10/Q13 shapes: selective join + TakeOrdered; zero-preserving left join") {
    val p10 = plan("q10_returned")
    assert(p10.contains("TakeOrderedAndProject"), p10)
    assert(p10.contains("EqualTo(l_returnflag,R)"), p10) // flag prune at the scan
    assert(!p10.contains("CartesianProduct"), p10)
    val p13 = plan("q13_custdist")
    assert(p13.contains("LeftOuter"), p13)              // zero-order groups survive
    assert(countOf(p13, "orders.parquet") == 1, p13)
  }

  test("kcore/cooccur: iterative peel is semi-join-shaped; baskets never self-join") {
    val pk = plan("graph_kcore")
    assert(!pk.contains("CartesianProduct"), pk)
    assert(countOf(pk, "LeftSemi") >= 2, pk)            // both endpoint filters
    val pc = plan("ev_cooccur")
    assert(!pc.contains("SortMergeJoin"), s"pair/singles joins must broadcast:\n$pc")
    assert(!pc.contains("CartesianProduct"), pc)        // 1-row n rides a broadcast BNLJ
  }

  test("MAD anomalies and binned quantiles run on aggregates, not raw rows") {
    val pa = plan("ts_anomaly")
    // stats windows/joins key on the aggregated hourly series: the raw
    // events scan feeds exactly one hash-agg per pass
    assert(pa.contains("HashAggregate"), pa)
    assert(!pa.contains("CartesianProduct"), pa)
    val pq = plan("agg_quantile_binned")
    assert(countOf(pq, "events.parquet") == 1, pq)      // one raw scan
    assert(!pq.contains("Exchange rangepartitioning"), pq) // cum-sum window is per-group
  }

  test("late-wave queries keep their scan discipline") {
    // Holt folds on the aggregated grid: one raw events scan
    val ph = plan("ts_holt")
    assert(countOf(ph, "events.parquet") == 1, ph)
    // heaps: one token hash-agg chain over one documents scan
    val pv = plan("text_heaps")
    assert(countOf(pv, "documents.parquet") == 1, pv)
    // t-test: one scan into one 1-row moment aggregate, no joins
    val pt = plan("stat_ttest")
    assert(countOf(pt, "events.parquet") == 1, pt)
    assert(!pt.contains("Join"), pt)
    // movers: TakeOrdered, never a global sort
    val pm = plan("topk_movers")
    assert(pm.contains("TakeOrderedAndProject"), pm)
    assert(!pm.contains("Exchange rangepartitioning"), pm)
    // DAU/WAU: the x7 projection is map-side (no join for the rolling
    // distinct), and the day join of two tiny aggregates broadcasts
    val pd = plan("ev_dau_wau")
    assert(!pd.contains("CartesianProduct"), pd)
    assert(!pd.contains("SortMergeJoin"), pd)
    // neighborhood jaccard: no cartesian anywhere in the graph chain
    val pj = plan("graph_jaccard")
    assert(!pj.contains("CartesianProduct"), pj)
  }

  test("skew report: topN via TakeOrdered; ranking window bounded, no key-universe sort") {
    val p = plan("diag_skew")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("weighted sample is scan + TakeOrdered; PR curve is one scan, one tiny agg") {
    val ps = plan("sample_weighted")
    assert(ps.contains("TakeOrderedAndProject"), ps)
    assert(!ps.contains("Exchange rangepartitioning"), ps)
    val pe = plan("eval_pr_curve")
    assert(countOf(pe, "Scan parquet") == 1, pe)
    assert(countOf(pe, "Exchange") <= 1, pe) // |thresholds| groups only
    assert(pe.contains("partial_"), pe)      // map-side confusion counts
  }

  test("BM25 search: corpus never sort-merges; term filter runs below the shuffle") {
    val p = plan("text_search_topk")
    assert(!p.contains("SortMergeJoin"), p)   // query/df/stats all broadcast
    // corpus parquet scans: stats pass only — tf is the checkpointed
    // relation (built once), df derives from it instead of re-exploding
    assert(countOf(p, "Scan parquet") <= 1, p)
    assert(p.contains("ExistingRDD"), s"tf must be the checkpointed relation:\n$p")
    // the isin prune runs pre-exchange (map side) inside the tf relation
    val tfp = graft.ops.Retrieval.tfRelation(
      graft.ops.Tables.documents(spark, dir), "doc_id", "text",
      Seq("scan", "fast")).queryExecution.executedPlan.toString
    assert(tfp.lastIndexOf("Exchange") < tfp.lastIndexOf(" IN (scan,"), tfp)
  }

  test("time-series ops scan raw events exactly once") {
    // gap fill derives from lead() on the AGGREGATED series; the grid
    // formulation (span grid left-joined to actuals) reads the raw
    // table twice because the join's notnull filters defeat exchange
    // reuse. Everything past the one hash-agg runs on |keys|×|buckets|.
    for (q <- Seq("ts_resample", "ts_interpolate", "ts_ewma")) {
      val p = plan(q)
      assert(countOf(p, "Scan parquet") == 1, s"$q must scan once:\n$p")
      assert(countOf(p, "Exchange") <= 2, s"$q agg + key window only:\n$p")
      assert(!p.contains("Join"), s"$q needs no join:\n$p")
    }
    // cusum gets its per-key totals from whole-partition window frames
    // sharing the ordered windows' HashPartitioning — same contract:
    // one scan, agg + key shuffle, no join anywhere.
    val pc = plan("ts_cusum")
    assert(countOf(pc, "Scan parquet") == 1, s"ts_cusum must scan once:\n$pc")
    assert(countOf(pc, "Exchange") <= 2, pc)
    assert(!pc.contains("Join"), s"ts_cusum needs no join:\n$pc")
  }

  test("seasonal/xcorr run on the checkpointed hourly series, raw gone") {
    // both consume the |keys|×|hours| series twice; the localCheckpoint
    // cuts lineage so NO parquet scan survives into the executed plan —
    // re-aggregating raw per consumer is the failure mode this guards.
    for (q <- Seq("ts_seasonal", "ts_xcorr")) {
      val p = plan(q)
      assert(countOf(p, "Scan parquet") == 0, s"$q must not rescan raw:\n$p")
      assert(p.contains("ExistingRDD"), s"$q reads the checkpointed series:\n$p")
    }
    // xcorr's pair join is tiny-side broadcast, never a corpus sort-merge
    assert(!plan("ts_xcorr").contains("SortMergeJoin"), plan("ts_xcorr"))
  }

  test("matrix profile: endpoint union reads the checkpointed distance table") {
    // the lag fan-out, rolling windows, and complete-window filter all
    // sit behind the dist localCheckpoint — the final plan must be just
    // the two-endpoint union + min-agg over ExistingRDD, with raw
    // events long gone and no cartesian anywhere
    val p = plan("ts_motif")
    assert(countOf(p, "Scan parquet") == 0, s"ts_motif must not rescan raw:\n$p")
    assert(countOf(p, "Scan ExistingRDD") == 2, p) // both endpoint reads
    assert(!p.contains("CartesianProduct"), p)
    assert(countOf(p, "Exchange") <= 1, s"one agg shuffle only:\n$p")
    // the window stage itself partitions by (k, lag) — a parallel
    // window, never the one-task global sort a bare orderBy would plan
    assert(!p.contains("SinglePartition"), p)
  }

  test("HITS: per-round vector joins never sort-merge the rank tables") {
    val p = plan("graph_hits")
    // max-rescale is a 1-row broadcast per round, not a shuffle of the vector
    assert(countOf(p, "BroadcastNestedLoopJoin") >= 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("benford/zipf/contribution-bound keep their scan discipline") {
    // benford: digit agg scans once; total is a 1-row broadcast over the
    // checkpointed 9-row table — raw events must not be rescanned
    val pb = plan("ev_benford")
    assert(countOf(pb, "Scan parquet") == 0, s"benford reruns the scan:\n$pb")
    // contribution bound: one (user,type) window shuffle + one hash-agg
    val pc = plan("gov_contrib_bound")
    assert(countOf(pc, "Scan parquet") == 1, pc)
    assert(!pc.contains("Join"), s"gov_contrib_bound needs no join:\n$pc")
    // zipf: vocabulary top-k is TakeOrdered, never a global vocab sort
    val pz = plan("text_zipf")
    assert(pz.contains("TakeOrderedAndProject"), pz)
  }

  test("cluster-cap sample prunes map-side and never joins") {
    val p = plan("sample_cluster_cap")
    // rank<=cap must rewrite to WindowGroupLimit: each map task keeps its
    // local top-cap per cell BEFORE the exchange — the property that
    // keeps the shuffle O(cap·k·tasks) instead of corpus-sized
    assert(countOf(p, "WindowGroupLimit") >= 2, s"cap must prune:\n$p")
    assert(!p.contains("Join"), s"cell assignment is a projection:\n$p")
  }

  test("MMR rerank: candidate stage is a broadcast probe; greedy is the bounded collect") {
    // the scale-heavy stage (candidate generation) must stay a
    // broadcast-query probe over the corpus — the greedy loop itself
    // runs driver-side on the ≤ |queries|·nCand collected candidates
    // (the bounded-collect contract), so the guard points at the
    // candidate plan directly
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val p = graft.ops.Similarity.bruteForceTopK(
        emb, emb.where(org.apache.spark.sql.functions.col("vec_id") < 10),
        "vec_id", "embedding", 12)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), s"corpus must not sort-merge:\n$p")
  }

  test("split leakage verifies candidates only, never all pairs") {
    val p = plan("split_leakage")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"leakage audit must stay on the banded candidate path:\n$p")
  }

  test("mann-kendall pair space forms after the grid collapse") {
    val p = plan("ts_mann_kendall")
    assert(!p.contains("CartesianProduct"), p)
    // exactly one raw-events scan: S-pairs, tie groups, and the final join
    // all run on the checkpointed T-bounded grid, not the corpus
    assert(countOf(p, "Scan parquet") <= 1, s"grid must be reused:\n$p")
  }

  test("bootstrap fan-out collapses map-side; no sort-merge anywhere") {
    val p = plan("stat_bootstrap")
    // the ×b explode must feed a partial hash-agg before its exchange —
    // the shuffle carries (grp, i) partials, never b copies of the data
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("CUPED: per-user agg once, moments broadcast back") {
    val p = plan("stat_cuped")
    // one raw scan; the pooled-moment row reaches the per-variant side
    // as a broadcast (BNLJ on the 1-row side), never a sort-merge
    assert(countOf(p, "Scan parquet") <= 1, s"per-user table must be reused:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("boilerplate removal: data never shuffles, only segment counts do") {
    val p = plan("text_boilerplate")
    // the doc-side path is scan → broadcast probe → project: no
    // sort-merge join, no per-doc reassembly exchange, no cartesian
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    // exactly two document scans (segment census + removal pass), both
    // pruned to (doc_id, text)
    assert(countOf(p, "Scan parquet") <= 2, p)
  }

  test("fertility is one token-stream hash-agg, zero joins") {
    val p = plan("vocab_fertility")
    assert(!p.contains("Join"), s"encode must be a projection:\n$p")
  }

  test("threshold sweep stays on the banded candidate path") {
    val p = plan("dedup_threshold_sweep")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"sweep must reuse the verified-pair table, never form all pairs:\n$p")
  }

  test("watermark scan is a zero-shuffle projection") {
    val p = plan("text_watermark")
    assert(!p.contains("Exchange"), s"green-pair scan must pipeline:\n$p")
  }

  test("hybrid RRF: semantic leg probes the IVF index exchange-free") {
    // the sidecar-materialized assignment (a LogicalRDD scan) must join
    // the broadcast probe set directly — no shuffle between the index
    // scan and the cell join, and no corpus-wide nested-loop on the
    // semantic side (the lexical leg's broadcast cross over the 3-row
    // query side is the one legitimate BroadcastNestedLoopJoin)
    val sem = graft.ops.Similarity.ivfTopKFromAssigned(
      graft.ops.Sidecar.cached(spark, s"ivfAssigned:$dir") {
        graft.ops.Similarity.ivfAssign(
          graft.ops.Tables.embeddings(spark, dir), "vec_id", "embedding")
      },
      graft.ops.Tables.embeddings(spark, dir)
        .where(org.apache.spark.sql.functions.col("vec_id") < 3),
      "vec_id", "embedding", k = 20)
    val p = sem.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"probe set must broadcast onto the index:\n$p")
    // exactly one shuffle: the per-query top-k window over the joined
    // (already cell-pruned) candidates — never the index side
    assert(countOf(p, "Exchange") - countOf(p, "BroadcastExchange") <= 1,
      s"index side must not shuffle:\n$p")
    assert(!p.contains("Scan parquet") || !p.split("BroadcastExchange")(0)
      .contains("Scan parquet"),
      s"streamed side must be the materialized index, not a corpus scan:\n$p")
  }

  test("r13 inference pack: rank filters prune, no cartesians, hash-aggs only") {
    // cdc_apply is ONE hash-agg (max-struct last-writer) — no window
    // operator at all, partial aggregation absorbs the log map-side
    // (max over a STRUCT aggregates via SortAggregate — still
    // partial+final with map-side absorption; the point is no Window)
    val pc = plan("cdc_apply")
    assert(!pc.contains("Window") && countOf(pc, "Aggregate") >= 2 &&
      pc.contains("partial_"),
      s"cdc snapshot must be a partial+final agg, no window:\n$pc")
    // text_burstiness's rn<=20 must hit the WindowGroupLimit rewrite —
    // 20 rows per source survive each map task before the shuffle
    val pb = plan("text_burstiness")
    assert(countOf(pb, "WindowGroupLimit") >= 2, s"top-20 must prune:\n$pb")
    // the new stats/ts queries are hash-agg + bounded-window shapes:
    // no cartesian, no nested-loop join may appear in any of them
    for (q <- Seq("stat_kruskal", "stat_cmh", "stat_jarque_bera",
        "stat_mcnemar", "stat_cramers_v", "stat_cohens_d", "stat_sign_test",
        "ts_dickey_fuller", "ts_kpss", "ts_spectral_entropy",
        "ts_rolling_corr", "ts_sax", "text_hapax", "text_js_divergence",
        "text_ngram_coverage", "text_punct_profile", "eval_logloss",
        "eval_mcc", "eval_gleu", "cdc_apply", "scd2_intervals")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q went cartesian:\n$p")
    }
    // jarque_bera's centered second pass joins the 5-row moment table
    // back BROADCAST — the corpus side must never sort-merge
    val pj = plan("stat_jarque_bera")
    assert(pj.contains("BroadcastHashJoin") && !pj.contains("SortMergeJoin"),
      s"moment join-back must broadcast:\n$pj")
  }

  test("r14 stylo pack plan shapes: mattr shuffle-free, burrows all-broadcast, " +
      "the rebuilt vocab_entropy never collects") {
    // MATTR is a pure row-local projection — any exchange means the
    // window arithmetic leaked out of the scan stage
    val pm = plan("text_mattr")
    assert(!pm.contains("Exchange"), s"text_mattr should not shuffle:\n$pm")
    // Burrows' Delta: the top-30 table and the per-word stats table are
    // tiny and must broadcast; the corpus side never sort-merges, and
    // nothing goes cartesian (the dense grid is made by an explicit
    // bounded crossJoin of |sources| × 30 — broadcast NL is fine there)
    val pb = plan("text_burrows_delta")
    assert(pb.contains("BroadcastHashJoin"), pb)
    assert(!pb.contains("SortMergeJoin"), s"burrows corpus side sort-merged:\n$pb")
    assert(!pb.contains("CartesianProduct"), pb)
    // yule/logrank/meta are single hash-agg + bounded-fold shapes
    for (q <- Seq("text_yule_k", "stat_logrank", "stat_meta")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q went cartesian:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q sort-merged a bounded table:\n$p")
    }
    // the rebuilt vocab_entropy (r13 verdict #1): the corpus-unbounded
    // per-source collect is GONE — no collect_list objagg anywhere, and
    // the rank clamp's window runs partitioned by source (never a
    // single-partition global window)
    val pv = plan("vocab_entropy")
    assert(!pv.toLowerCase.contains("collect_list"),
      s"vocab_entropy must not collect the vocabulary:\n$pv")
    // r14 verdict #1: the rank clamp must be a WindowGroupLimit-prunable
    // `filter(rn <= k)` — Partial mode caps every MAP task's sort state
    // at top-k per source before the exchange, so no task ever sorts a
    // source's full vocabulary (the keep-all when/otherwise form kept
    // every row alive through the window and defeated the rewrite)
    assert(pv.contains("WindowGroupLimit"),
      s"vocab_entropy rank clamp must be WindowGroupLimit-prunable:\n$pv")
    assert(pv.contains("Partial"),
      s"vocab_entropy WindowGroupLimit must have a map-side Partial pass:\n$pv")
  }
}
