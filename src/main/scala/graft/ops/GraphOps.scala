package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over document-relation graphs, in exact
  * fixed point so every score hash-checks across engines. Complements
  * [[Dedup.connectedComponents]] (membership) with CENTRALITY: how
  * load-bearing a node is inside its duplication neighborhood —
  * boilerplate hubs score high and are the first candidates a curation
  * pass reviews. */
object GraphOps {

  /** All (a, b) pairs with a before b from a SORTED array — the
    * posting-list pair fan-out shared by [[spanEdges]] and the basket
    * co-occurrence query (one maintained copy of the 1-based slice
    * arithmetic). */
  def sortedPairs(arr: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    flatten(transform(arr, (a, i) =>
      transform(slice(arr, i + lit(2), greatest(size(arr) - i - 1, lit(0))),
        b => struct(a.as("a"), b.as("b")))))

  /** Lineage-cut + width right-sizing for an edge table an iterative
    * loop re-reads every round: a straight localCheckpoint inherits the
    * caller's partitioning (the sidecar pair tables arrive 64-wide
    * whatever their size), so each round's map side pays one task
    * launch per inherited partition — 6 stages × 64 launches per hits
    * run at sf0.1 for a 40 KB edge list. Hash-repartitioning on src
    * first lets AQE coalesce the width to the advisory/floor size
    * (data-proportional: a couple of tasks on a tiny graph, full width
    * on a huge one) and co-partitions the table for the per-round src
    * joins. Pure repartitioning — no values change. */
  private def cutBySrc(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst")).repartition(col("src"))
      .localCheckpoint()

  /** Undirected dup-graph edges: distinct doc pairs sharing at least one
    * w-token span, both directions. The posting-list expansion (sorted
    * ids per span, map-side pair fan-out) — never a shingle self-join —
    * with the hot-span cap bounding fan-out at maxDocFreq²/2 per span
    * (boilerplate spans are exactly the ones that would otherwise square;
    * the [[Dedup.ngramJaccardPairs]] rule). One shuffle on the span hash,
    * one distinct on the bounded pair set. */
  def spanEdges(docs: DataFrame, idCol: String, textCol: String,
                w: Int = 15, maxDocFreq: Int = 100): DataFrame = {
    val posting = Dedup.shingles(docs, idCol, textCol, w)
      .withColumnRenamed(idCol, "id")
      .select(xxhash64(col("shingle")).as("shingle"), col("id"))
      .groupBy("shingle")
      .agg(sort_array(collect_set(col("id"))).as("ids"))
      .where(size(col("ids")).between(2, maxDocFreq))
    val pairs = posting.select(explode(sortedPairs(col("ids"))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b")).distinct()
    pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(pairs.select(col("b").as("src"), col("a").as("dst")))
  }

  /** Fixed-iteration PageRank in EXACT FIXED POINT: scores are scaled
    * BIGINTs (1.0 ≡ `scale`), every per-edge contribution and damping
    * step is an integer floor division, so `iters` rounds produce the
    * same bits in any engine — hash-checkable, unlike float PageRank
    * whose sums are order-dependent. Unnormalized form (every node
    * starts at 1.0; pr = 0.15 + 0.85·Σ pr(src)/outdeg(src)), dangling
    * mass drops (the simple variant — fine for RANKING, which is what
    * curation consumes).
    *
    * Scale shape: each iteration is one join of the rank vector to the
    * edge list on src (both shuffle-partitioned on the same key, so
    * iteration k reuses iteration k−1's rank partitioning) and one
    * aggregate on dst — the Pregel round restated relationally; k
    * iterations = k·(join+agg), nothing accumulates on the driver. */
  def pageRank(nodes: DataFrame, edges: DataFrame, idCol: String,
               iters: Int = 3, scale: Long = 1000000L): DataFrame = {
    // exact floor division (shared decimal-path definition)
    def fdiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      Stats.fdiv(a, b)
    // Truncate lineage ONCE: without this, every iteration's join inlines
    // the whole edge-build subtree (k iterations re-run the posting-list
    // expansion k+1 times — the PlanAudit catch that motivated this).
    // Local checkpoints here, durable checkpoints on a cluster — the
    // connectedComponents tradeoff, same contract.
    val sym = cutBySrc(edges)
    val deg = sym.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .localCheckpoint()
    val ids = nodes.select(col(idCol).as("id"))
    var pr = ids.select(col("id"), lit(scale).as("pr"))
    for (_ <- 1 to iters) {
      val inbound = sym
        .join(deg, "src")
        .join(pr.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), fdiv(col("pr"), col("outdeg")).as("c"))
        .groupBy("id").agg(sum(col("c")).as("in_c"))
      pr = ids.join(inbound, Seq("id"), "left")
        .select(col("id"),
          (lit(scale * 15L / 100L) +
            fdiv(coalesce(col("in_c"), lit(0L)) * 85L, lit(100L))).as("pr"))
        .localCheckpoint(eager = false)
    }
    pr.select(col("id").as(idCol), col("pr").as("pr_scaled"),
      (col("pr").cast("double") / scale.toDouble).as("pr"))
  }

  /** Synchronous label propagation (community detection): each round
    * every node adopts the MOST FREQUENT label among its in-neighbors
    * (ties → smallest label); nodes with no inbound keep their own.
    * Deterministic by construction — synchronous update plus a total tie
    * order — so `iters` rounds hash-check across engines, unlike classic
    * randomized LPA. Communities ≠ components: a thin chain bridging two
    * dense clusters stays split where connected components merges it —
    * the curation view that separates template FAMILIES inside one big
    * dup blob.
    *
    * Round = one edge⋈label join + one (dst, label) count + one per-dst
    * argmax (a plain max over (count, −label) structs — partial-agg
    * collapses before the exchange, never a rank window). All shuffles
    * key on high-cardinality node ids; lineage truncates per round like
    * [[pageRank]]. */
  def labelPropagation(nodes: DataFrame, edges: DataFrame, idCol: String,
                       iters: Int = 3): DataFrame = {
    val sym = cutBySrc(edges)
    val ids = nodes.select(col(idCol).as("id"))
    var lab = ids.select(col("id"), col("id").as("label"))
    for (_ <- 1 to iters) {
      val best = sym
        .join(lab.select(col("id").as("src"), col("label")), "src")
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("c"))
        .groupBy(col("dst"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("dst").as("id"), (-col("m.nl")).as("new_label"))
      lab = lab.join(best, Seq("id"), "left")
        .select(col("id"), coalesce(col("new_label"), col("label")).as("label"))
        .localCheckpoint(eager = false)
    }
    lab.select(col("id").as(idCol), col("label").as("community"))
  }

  /** Newman modularity of a community assignment over an undirected
    * graph — the one-number quality score for [[labelPropagation]]'s
    * output (Q ≈ 0: no better than random; Q ≫ 0: real structure).
    * Q = Σ_c [e_c/m − (deg_c/2m)²] computed as the single exact
    * rational [Σ_c (4·m·e_c − deg_c²)] / (4m²): every sum is integer
    * (DECIMAL(38,0) for the deg² terms — deg_c is corpus-bounded), one
    * division at the end. Coverage (Σe_c/m, the intra-edge fraction)
    * rides along as the scale-free companion. `edges` is the
    * symmetrized (src, dst) table ([[spanEdges]] emits both
    * directions); everything shuffles on node/community ids once and
    * collapses to |communities| rows before the 1-row aggregate. */
  def modularity(edges: DataFrame, communities: DataFrame,
                 idCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val lab = communities.select(col(idCol).as("id"), col("community"))
      .localCheckpoint() // LPA output re-read by both joins + the count
    val und = edges.where(col("src") < col("dst"))
      .select(col("src"), col("dst")).distinct()
      .localCheckpoint() // edge table: intra join + m count reuse it
    val deg = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val intra = und
      .join(lab.select(col("id").as("src"), col("community").as("ca")), "src")
      .join(lab.select(col("id").as("dst"), col("community").as("cb")), "dst")
      .where(col("ca") === col("cb"))
      .groupBy(col("ca").as("community")).agg(count(lit(1)).as("ec"))
    val per = lab.join(deg, "id")
      .groupBy(col("community")).agg(sum(col("deg")).as("degc"))
      .join(intra, Seq("community"), "left")
      .na.fill(0L, Seq("ec"))
    val sums = per.agg(
      coalesce(sum(col("ec")), lit(0L)).as("intra_edges"),
      coalesce(sum(col("degc").cast(d38) * col("degc").cast(d38)),
        lit(0).cast(d38)).as("sumdeg2"))
    sums
      .crossJoin(broadcast(und.agg(count(lit(1)).as("m"))))
      .crossJoin(broadcast(
        lab.agg(count_distinct(col("community")).as("n_comms"))))
      .select(col("m").as("n_edges"), col("n_comms"), col("intra_edges"),
        when(col("m") > 0, TimeSeries.portableRound4(
          (lit(4).cast(d38) * col("m") * col("intra_edges") - col("sumdeg2"))
            .cast("double") /
            (lit(4).cast(d38) * col("m") * col("m")).cast("double")))
          .as("modularity"),
        when(col("m") > 0, TimeSeries.portableRound4(
          col("intra_edges").cast("double") / col("m").cast("double")))
          .as("coverage"))
  }

  /** Fixed-round k-core peel: repeatedly drop nodes with degree < k in
    * the surviving induced subgraph, `rounds` times, then report each
    * survivor's induced degree. Fixed rounds (not run-to-fixpoint) keep
    * the result a pure function of (edges, k, rounds) — hash-checkable
    * by an unrolled-CTE oracle, and at 100 TB the round count bounds the
    * job graph up front (each extra round is two semi-joins + one agg,
    * all keyed on node ids; peeling converges geometrically in practice
    * so small fixed budgets reach the fixpoint on real graphs — the
    * caller can spec convergence by checking rounds R and R+1 agree).
    * The k-core is the standard "dense kernel" extractor: template
    * families survive, chains and stragglers peel away. */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    val und = edges.where(col("src") < col("dst"))
      .select(col("src").as("a"), col("dst").as("b"))
      .distinct().localCheckpoint()
    def induced(alive: DataFrame) = und
      .join(alive.select(col("id").as("a")), Seq("a"), "left_semi")
      .join(alive.select(col("id").as("b")), Seq("b"), "left_semi")
    var alive = und.select(explode(array(col("a"), col("b"))).as("id")).distinct()
    for (_ <- 1 to rounds) {
      alive = induced(alive)
        .select(explode(array(col("a"), col("b"))).as("id"))
        .groupBy("id").agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k).select("id")
        .localCheckpoint(eager = false)
    }
    induced(alive)
      .select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("core_deg"))
  }

  /** Neighborhood Jaccard (link prediction / missing-edge scoring):
    * for every node pair sharing at least one neighbor,
    * |N(a)∩N(b)| / |N(a)∪N(b)| — pairs that score high but have no
    * edge are the near-dups the span detector MISSED (the graph's own
    * completion signal). Common-neighbor counting is the posting-list
    * fan-out over sorted neighbor lists ([[sortedPairs]] — one pair
    * emission per shared neighbor, Σ deg²/2 bounded by the dup graph's
    * hot-span cap), degrees join back broadcast-sized, and the Jaccard
    * c/(dₐ+d_b−c) stays exact integers until one rounded division. */
  def neighborhoodJaccard(edges: DataFrame,
                          minCommon: Int = 2): DataFrame = {
    val und = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint() // feeds degrees AND neighbor lists
    val deg = und.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val common = und.groupBy(col("src"))
      .agg(sort_array(collect_set(col("dst"))).as("ns"))
      .select(explode(sortedPairs(col("ns"))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("common"))
      .where(col("common") >= minCommon)
    common
      .join(deg.select(col("src").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("src").as("b"), col("deg").as("db")), "b")
      .select(col("a"), col("b"), col("common"),
        TimeSeries.portableRound6(col("common").cast("double") /
          (col("da") + col("db") - col("common")).cast("double"))
          .as("jaccard"))
  }

  /** Exact triangle count over a symmetric edge list, via DEGREE-ORDERED
    * orientation (Suri & Vassilvitskii 2011, the MapReduce-era
    * skew-proof shape): each undirected edge orients from its lower
    * (degree, id)-ranked endpoint to the higher, so every triangle is
    * counted exactly once at its lowest-ranked vertex and the wedge
    * join's per-vertex fan-out is bounded by oriented out-degree ≤
    * O(√m) — a social-graph hub never squares. Two joins + one count;
    * clustering coefficient = 3·triangles / wedges falls out of the
    * same degrees. */
  def triangleCount(edges: DataFrame): DataFrame = {
    val und = edges.where(col("src") < col("dst"))
      .select(col("src").as("a"), col("dst").as("b")).distinct()
    val deg = und.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
    val oriented = withDeg.select(
      when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("u"), col("b").as("v")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    val tri = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.v") === col("e2.u"))
      .join(oriented.as("e3"),
        col("e1.u") === col("e3.u") && col("e2.v") === col("e3.v"))
      .agg(count(lit(1)).as("n_triangles"))
    val nEdges = und.agg(count(lit(1)).as("n_edges"))
    tri.crossJoin(nEdges)
  }

  /** Local clustering coefficient summary of the dup graph — the
    * cohesion read the global triangle COUNT can't give: transitivity
    * (3·triangles/wedges) is dominated by the hubs, while the AVERAGE
    * local coefficient C̄ = mean over nodes of 2t_v/(d_v(d_v−1))
    * weights every node equally — template families (interlinked
    * near-clique clusters) push both up; star boilerplate (one hub,
    * many leaves) pushes transitivity toward 0 while leaves keep
    * C_v = 0. The gap between the two numbers is the
    * clique-vs-star diagnostic for the CC dedup strategy.
    *
    * Per-node triangle counts reuse the degree-oriented enumeration
    * (each triangle found exactly once, then credited to its three
    * corners — edge-list-sized intermediates, never corpus-sized).
    * Per-node C_v are QUANTIZED to the 1e-8 grid and summed as exact
    * integers (the jackknife discipline — a float Σ C_v is
    * addition-order-dependent across engines); deg<2 nodes count as
    * C_v = 0 in the average (the standard convention). */
  def clusteringCoefficient(edges: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val und = edges.where(col("src") < col("dst"))
      .select(col("src").as("a"), col("dst").as("b")).distinct()
    val deg = und.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
    val oriented = withDeg.select(
      when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("u"), col("b").as("v")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    val triCorners = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.v") === col("e2.u"))
      .join(oriented.as("e3"),
        col("e1.u") === col("e3.u") && col("e2.v") === col("e3.v"))
      .select(explode(array(col("e1.u"), col("e2.u"), col("e2.v"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("t"))
    val nodeC = deg.join(triCorners, Seq("v"), "left")
      .select(col("deg"), coalesce(col("t"), lit(0L)).as("t"))
    val degd = col("deg").cast("double")
    val cv = when(col("deg") >= 2,
      lit(2.0) * col("t").cast("double") / (degd * (degd - lit(1.0))))
      .otherwise(lit(0.0))
    val q = round(cv * lit(1.0e8), 0).cast("long")
    val m = nodeC.select(col("deg"), col("t"), q.as("q"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("t")).as("t3"),
        sum(col("deg").cast(dec) * (col("deg").cast(dec) - lit(1)))
          .as("w2"),
        sum(col("q").cast(dec)).as("sq"))
    val nEdges = und.agg(count(lit(1)).as("n_edges"))
    m.crossJoin(nEdges)
      .select(col("n_nodes"), col("n_edges"),
        floor(col("t3") / lit(3)).cast("long").as("n_triangles"),
        TimeSeries.portableRound6(when(col("w2") > 0,
          lit(2.0) * col("t3").cast("double") / col("w2").cast("double")))
          .as("transitivity"),
        TimeSeries.portableRound6(
          col("sq").cast("double") / lit(1.0e8) /
            col("n_nodes").cast("double")).as("avg_clustering"))
  }

  /** Log₂-binned degree distribution of the dup graph — the standard
    * structural audit before any graph-driven dedup decision (a heavy
    * power-law tail means boilerplate hubs; a spike at high degree means
    * the span detector is matching template text). Bin = bit length of
    * the degree (floor(log₂ deg) + 1), computed EXACTLY as the length of
    * the minimal binary string — Spark `conv(deg, 10, 2)` and DuckDB
    * `bin(deg)` produce the identical string, so no float log can drift
    * a boundary degree into the wrong bin.
    *
    * Scale shape: degrees are one hash-agg over the edge list, the
    * histogram a second over |nodes| rows, output |bins| ≤ 64 rows. */
  def degreeHistogram(edges: DataFrame): DataFrame =
    edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .groupBy(length(conv(col("deg"), 10, 2)).cast("long").as("bin"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("sum_deg"),
        min(col("deg")).as("min_deg"), max(col("deg")).as("max_deg"))

  /** Degree assortativity (Newman r) of the symmetric edge list: the
    * Pearson correlation of (deg(src), deg(dst)) over edges — do
    * high-degree template hubs attach to other hubs (assortative dup
    * families, r > 0) or to leaves (star-shaped boilerplate, r < 0)?
    * The sign decides which CC strategy wins at scale, which is why the
    * star-edge pipeline cares. Exact BIGINT moments over the edge list,
    * DECIMAL(38,0) cross products (the ts_xcorr discipline), and the
    * single sqrt+division on the 6dp grid; a degree-regular graph has
    * zero variance and yields null, not ±Inf.
    *
    * Scale: two joins of the edge list against the degree table —
    * both co-partitioned on the node key; moments collapse map-side. */
  def assortativity(edges: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
    val e = edges
      .join(deg.select(col("src"), col("d").as("dx")), "src")
      .join(deg.select(col("src").as("dst"), col("d").as("dy")), "dst")
    val m = e.agg(count(lit(1)).as("m"),
      sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
      sum(col("dx") * col("dy")).as("sxy"),
      sum(col("dx") * col("dx")).as("sxx"),
      sum(col("dy") * col("dy")).as("syy"))
    val den2 =
      (col("m").cast(dec) * col("sxx").cast(dec) -
        col("sx").cast(dec) * col("sx").cast(dec)).cast("double") *
      (col("m").cast(dec) * col("syy").cast(dec) -
        col("sy").cast(dec) * col("sy").cast(dec)).cast("double")
    m.select(col("m"),
      when(den2 > 0, TimeSeries.portableRound6(
        (col("m").cast(dec) * col("sxy").cast(dec) -
          col("sx").cast(dec) * col("sy").cast(dec)).cast("double") /
          sqrt(den2))).as("assortativity"))
  }

  /** HITS hubs/authorities over a DIRECTED graph, in the repo's exact
    * fixed-point discipline (Kleinberg 1999; reference analog: ranking
    * inside the dedup review queue). On the containment digraph
    * (container → contained) hubs are the AGGREGATOR docs that quote
    * many others and authorities the canonical SOURCES quoted
    * everywhere — the two distinct curation actions (drop the
    * aggregator, keep one canonical copy).
    *
    * Each round: a ← Aᵀh then RESCALE, h ← A·a (the rescaled a) then
    * RESCALE — rescaling to max = `scale` via the dividend-signed trunc
    * division both engines share, BEFORE the next matvec, keeps every
    * intermediate ≤ scale²·maxdeg. Accumulation runs in DECIMAL(38,0)
    * (the [[Similarity.topPcFixedPoint]] discipline, not PageRank's
    * BIGINT + float-divide: scale²·maxdeg crosses 2⁵³ at in-degree
    * ≈9000, where a double divide stops being exact — boilerplate hubs
    * at corpus scale sit well past that). `iters` rounds hash-check
    * across engines. Nodes outside the edge set keep score 0 and are
    * omitted (HITS is only defined on the link structure).
    *
    * Scale shape: per round two edge-list joins + two hash-aggs on
    * node id (the PageRank round shape ×2); the edge list is
    * lineage-cut once, each round's vectors are node-count tables. */
  def hits(edges: DataFrame, iters: Int = 3,
           scale: Long = 1000000L): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def rescale(x: DataFrame, vc: String): DataFrame = {
      val m = x.agg(greatest(max(col(vc)), lit(1).cast(dec)).as("m"))
      x.crossJoin(broadcast(m)).select(col("id"),
        (((col(vc) * scale) - ((col(vc) * scale) % col("m"))) / col("m"))
          .cast(dec).as(vc))
    }
    val e = cutBySrc(edges)
    val ids = e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint() // consumed by both vectors every round
    var hub = ids.select(col("id"), lit(scale).cast(dec).as("h"))
    var auth = ids.select(col("id"), lit(scale).cast(dec).as("a"))
    for (_ <- 1 to iters) {
      val aFull = ids.join(
          e.join(hub.withColumnRenamed("id", "src"), "src")
            .groupBy(col("dst").as("id")).agg(sum(col("h")).as("a")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("a"), lit(0).cast(dec)).as("a"))
        .localCheckpoint(eager = false) // max + rescale both consume it
      auth = rescale(aFull, "a")
        .localCheckpoint(eager = false) // h-round + output consume it
      val hFull = ids.join(
          e.join(auth.withColumnRenamed("id", "dst"), "dst")
            .groupBy(col("src").as("id")).agg(sum(col("a")).as("h")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("h"), lit(0).cast(dec)).as("h"))
        .localCheckpoint(eager = false)
      hub = rescale(hFull, "h")
    }
    hub.join(auth, "id")
      .select(col("id"), col("h").cast("long").as("hub_scaled"),
        col("a").cast("long").as("auth_scaled"))
  }

  /** Bounded-radius closeness centrality: per node, how many nodes sit
    * at distance exactly 1, 2, …, `radius`, the exact distance sum, and
    * closeness = reach/Σd — the "how central is this doc inside its dup
    * neighborhood" number that finishes the centrality family (degree →
    * histogram, influence → PageRank, roles → HITS, locality → this).
    * Full closeness needs all-pairs shortest paths; the radius bound is
    * the standard scale cut (Wasserman & Faust's k-step reach), and at
    * radius 3 it already separates chain middles from chain ends and
    * clique members from bridges.
    *
    * BFS restated relationally: frontier ⋈ edges per level, min-dist
    * kept by an anti-join against everything already reached —
    * distinct, monotone, and exact (no float, hash-checks anywhere).
    *
    * Scale shape: level d costs Σ_{frontier} deg — bounded by the same
    * hot-span cap that bounds the dup graph's degree (the
    * neighborhoodJaccard cost argument); each level is one join + one
    * distinct + one anti-join, all on (v, u) pairs, nothing on the
    * corpus. Frontiers are lineage-cut per level (the connected-
    * components contract: local checkpoints here, durable on a
    * cluster). */
  def closeness(edges: DataFrame, radius: Int = 3): DataFrame = {
    val e = cutBySrc(edges)
    var reach = e.select(col("src").as("v"), col("dst").as("u"),
      lit(1).as("d")).distinct().localCheckpoint()
    var frontier = reach
    for (d <- 2 to radius) {
      val grown = frontier.join(e.withColumnRenamed("src", "u"), "u")
        .where(col("dst") =!= col("v"))
        .select(col("v"), col("dst").as("u")).distinct()
        .join(reach.select(col("v"), col("u")), Seq("v", "u"), "left_anti")
        .select(col("v"), col("u"), lit(d).as("d"))
        .localCheckpoint() // next frontier + the reach union both read it
      reach = reach.unionAll(grown).localCheckpoint()
      frontier = grown
    }
    val levels = (1 to radius).map(d =>
      sum(when(col("d") === d, 1L).otherwise(0L)).as(s"n$d"))
    reach.groupBy(col("v").as("id"))
      .agg(levels.head, levels.tail :+
        count(lit(1)).as("n_reach") :+ sum(col("d")).as("sum_dist"): _*)
      .withColumn("closeness", TimeSeries.portableRound6(
        col("n_reach").cast("double") / col("sum_dist").cast("double")))
  }
}
