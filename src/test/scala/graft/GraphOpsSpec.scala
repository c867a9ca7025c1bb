package graft

import org.apache.spark.sql.functions._
import graft.ops.GraphOps

/** Laws for the fixed-point PageRank and the span-edge builder:
  * differential equality against a sequential reference, hub ordering,
  * and edge symmetry/caps. */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def reference(nodes: Seq[Long], edges: Seq[(Long, Long)],
                        iters: Int): Map[Long, Long] = {
    val scale = 1000000L
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var pr = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => Math.floorDiv(pr(s), deg(s)) }.sum).toMap
      pr = nodes.map(n =>
        n -> (scale * 15 / 100 + Math.floorDiv(85 * in.getOrElse(n, 0L), 100))).toMap
    }
    pr
  }

  test("pageRank matches the sequential reference; hubs outrank leaves") {
    // star a<-{b,c,d} plus a 2-cycle e<->f plus isolated g
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("id")
    val edgePairs = Seq((2L, 1L), (3L, 1L), (4L, 1L),
      (1L, 2L), (5L, 6L), (6L, 5L))
    val edges = edgePairs.toDF("src", "dst")
    val got = GraphOps.pageRank(nodes, edges, "id", iters = 3)
      .select("id", "pr_scaled").as[(Long, Long)].collect().toMap
    assert(got === reference(Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L), edgePairs, 3))
    assert(got(1L) > got(5L))            // 3 inbound beats 1 inbound
    assert(got(7L) === 150000L)          // isolated: damping floor
    assert(got(3L) === got(4L))          // symmetric leaves tie
  }

  test("label propagation: cliques keep their own communities across a bridge") {
    // two 4-cliques {1..4} and {11..14} joined by the single bridge 4—11
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a != b) yield (a, b)
    val pairs = clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(11L, 12L, 13L, 14L)) ++
      Seq((4L, 11L), (11L, 4L))
    val nodes = (Seq(1L, 2L, 3L, 4L, 11L, 12L, 13L, 14L) :+ 99L).toDF("id")
    val got = GraphOps.labelPropagation(nodes, pairs.toDF("src", "dst"),
        "id", iters = 3)
      .as[(Long, Long)].collect().toMap
    // min-label majorities: community 1 for the first clique, 11 for the
    // second — the bridge edge never outvotes 3 clique neighbors
    assert(Seq(1L, 2L, 3L, 4L).forall(got(_) == 1L), got.toString)
    assert(Seq(11L, 12L, 13L, 14L).forall(got(_) == 11L), got.toString)
    assert(got(99L) == 99L) // isolated node keeps its own label
  }

  test("label propagation matches a sequential synchronous reference") {
    val pairs = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L), (4L, 3L))
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    def ref(iters: Int): Map[Long, Long] = {
      var lab = Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L)
      for (_ <- 1 to iters) {
        val nb = pairs.groupBy(_._2).view.mapValues { es =>
          val counts = es.groupBy(e => lab(e._1)).view.mapValues(_.size)
          counts.toSeq.minBy { case (l, c) => (-c, l) }._1
        }.toMap
        lab = lab.map { case (n, l) => n -> nb.getOrElse(n, l) }
      }
      lab
    }
    for (k <- 1 to 3) {
      val got = GraphOps.labelPropagation(nodes, pairs.toDF("src", "dst"),
        "id", iters = k).as[(Long, Long)].collect().toMap
      assert(got === ref(k), s"iters=$k")
    }
  }

  test("spanEdges: symmetric, distinct, hot spans capped") {
    val span = (tag: String) => (1 to 15).map(i => s"w$i$tag").mkString(" ")
    val docs = Seq(
      (1L, span("A") + " x"), (2L, span("A") + " y"), (3L, span("A") + " z"),
      (4L, span("Q") + " unrelated")
    ).toDF("doc_id", "text")
    val e = GraphOps.spanEdges(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(e === Set((1L, 2L), (1L, 3L), (2L, 3L),
      (2L, 1L), (3L, 1L), (3L, 2L)))
    // a span shared by more docs than the cap contributes no edges
    val capped = GraphOps.spanEdges(docs, "doc_id", "text", maxDocFreq = 2)
    assert(capped.count() === 0)
  }

  test("neighborhoodJaccard: shared-neighbor overlap scores edgeless twins highest") {
    def sym(ps: (Long, Long)*) =
      (ps ++ ps.map(p => (p._2, p._1))).toDF("src", "dst")
    // star v->{a,b,c} plus pendant a-x: b and c are structurally
    // identical WITHOUT an edge — the missed-near-dup signal.
    val g = sym((10L, 1L), (10L, 2L), (10L, 3L), (1L, 20L))
    val got = GraphOps.neighborhoodJaccard(g, minCommon = 1)
      .select("a", "b", "common", "jaccard")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got === Map(
      (1L, 2L) -> ((1L, 0.5)),      // N(1)={10,20}, N(2)={10}: 1/(2+1-1)
      (1L, 3L) -> ((1L, 0.5)),
      (2L, 3L) -> ((1L, 1.0)),      // identical neighborhoods, no edge
      (10L, 20L) -> ((1L, 1.0 / 3)) // via a; deg(10)=3, deg(20)=1
        .copy(_2 = math.round(1.0 / 3 * 1e6) / 1e6)))
    // the threshold prunes singles
    assert(GraphOps.neighborhoodJaccard(g, minCommon = 2).count() === 0L)
  }

  test("kCore: chains peel, the dense kernel survives with induced degrees") {
    def sym(ps: (Long, Long)*) =
      (ps ++ ps.map(p => (p._2, p._1))).toDF("src", "dst")
    // triangle {1,2,3} with a pendant chain 3-4-5 and an isolated edge 6-7
    val g = sym((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (6L, 7L))
    val got = GraphOps.kCore(g, k = 2, rounds = 3)
      .as[(Long, Long)].collect().toMap
    // round 1 peels 5, 6, 7 (deg 1); round 2 peels 4 (its support left);
    // the triangle is the 2-core, each member at induced degree 2.
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // too few rounds: the chain hasn't fully unraveled yet (4 still in
    // after round 1 — its degree was 2 before 5 peeled)
    val r1 = GraphOps.kCore(g, k = 2, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1.keySet === Set(1L, 2L, 3L, 4L))
    // k above the max degree empties the graph
    assert(GraphOps.kCore(g, k = 5, rounds = 2).count() === 0)
  }

  test("triangleCount: K4 has 4, a star has 0, duplicates don't inflate") {
    def sym(ps: (Long, Long)*) =
      (ps ++ ps.map(p => (p._2, p._1))).toDF("src", "dst")
    // K4 on {1,2,3,4}: C(4,3) = 4 triangles, 6 edges
    val k4 = sym((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val r1 = GraphOps.triangleCount(k4).collect()(0)
    assert((r1.getLong(0), r1.getLong(1)) === ((4L, 6L)))
    // star centered at 1: no triangles despite the degree-4 hub
    val star = sym((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    val r2 = GraphOps.triangleCount(star).collect()(0)
    assert((r2.getLong(0), r2.getLong(1)) === ((0L, 4L)))
    // repeated edges collapse before counting
    val dup = sym((1L, 2L), (1L, 2L), (2L, 3L), (1L, 3L))
    val r3 = GraphOps.triangleCount(dup).collect()(0)
    assert((r3.getLong(0), r3.getLong(1)) === ((1L, 3L)))
  }

  test("clusteringCoefficient: known answers on triangle+tail, star, and K4") {
    def sym(ps: (Long, Long)*) =
      (ps ++ ps.map(p => (p._2, p._1))).toDF("src", "dst")
    // triangle {1,2,3} with a tail 3-4: C_1 = C_2 = 1, C_3 = 2*1/(3*2) = 1/3,
    // C_4 = 0 (deg 1); avg = (1 + 1 + 1/3 + 0)/4 = 7/12
    // transitivity = 3*1 / wedges; wedges = C(2,2)*2 + C(3,2) + 0 = 1+1+3 = 5
    val tri = sym((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val r1 = GraphOps.clusteringCoefficient(tri).collect()(0)
    assert(r1.getAs[Long]("n_nodes") === 4L)
    assert(r1.getAs[Long]("n_edges") === 4L)
    assert(r1.getAs[Long]("n_triangles") === 1L)
    assert(math.abs(r1.getAs[Double]("transitivity") - 3.0 / 5.0) < 1e-6)
    assert(math.abs(r1.getAs[Double]("avg_clustering") - 7.0 / 12.0) < 1e-6)
    // star: hub full of wedges, zero triangles -> both metrics 0
    val star = sym((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    val r2 = GraphOps.clusteringCoefficient(star).collect()(0)
    assert(r2.getAs[Long]("n_triangles") === 0L)
    assert(r2.getAs[Double]("transitivity") === 0.0)
    assert(r2.getAs[Double]("avg_clustering") === 0.0)
    // K4: everything is 1
    val k4 = sym((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val r3 = GraphOps.clusteringCoefficient(k4).collect()(0)
    assert(r3.getAs[Long]("n_triangles") === 4L)
    assert(r3.getAs[Double]("transitivity") === 1.0)
    assert(r3.getAs[Double]("avg_clustering") === 1.0)
  }

  test("modularity: two cliques under the true split score high; one blob scores 0") {
    def sym(ps: (Long, Long)*) =
      (ps ++ ps.map(p => (p._2, p._1))).toDF("src", "dst")
    // two triangles joined by one bridge edge: m = 7
    val g = sym((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val goodSplit = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 2L), (5L, 2L), (6L, 2L)).toDF("id", "community")
    val r = GraphOps.modularity(g, goodSplit, "id").collect()(0)
    // hand check: e_c = 3 each, deg_c = 7 each →
    // Q = (4·7·6 − 2·49)/(4·49) = 70/196
    assert(r.getLong(0) === 7L && r.getLong(1) === 2L && r.getLong(2) === 6L)
    assert(math.abs(r.getDouble(3) - 70.0 / 196) < 1e-4)
    assert(math.abs(r.getDouble(4) - 6.0 / 7) < 1e-4) // 4dp-rounded
    // everything in ONE community: coverage 1 but Q exactly 0
    val blob = (1L to 6L).map((_, 9L)).toDF("id", "community")
    val rb = GraphOps.modularity(g, blob, "id").collect()(0)
    assert(rb.getDouble(3) === 0.0 && rb.getDouble(4) === 1.0)
    // the good split beats cutting a triangle in half
    val badSplit = Seq((1L, 1L), (2L, 1L), (3L, 2L),
      (4L, 2L), (5L, 2L), (6L, 2L)).toDF("id", "community")
    val rc = GraphOps.modularity(g, badSplit, "id").collect()(0)
    assert(r.getDouble(3) > rc.getDouble(3))
  }

  test("closeness: star center maximal; chain levels count exactly") {
    // star 1-{2,3,4,5} plus a tail 5-6-7: center 1 sees everything in
    // ≤3 hops; leaf 7 walks the chain
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (5L, 6L), (6L, 7L))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val got = GraphOps.closeness(edges, radius = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getDouble(6)))).toMap
    // center: 4 at d1 (incl. 5), 6 at d2, 7 at d3 → reach 6, Σd 4+2+3;
    // closeness is the 6dp-rounded 6/9
    assert(got(1L) === ((4L, 1L, 1L, 6L, 9L, 0.666667)))
    // leaf 7: 6 at d1, 5 at d2, 1 at d3 → reach 3, Σd 6
    assert(got(7L) === ((1L, 1L, 1L, 3L, 6L, 0.5)))
    // star leaf 2: 1 at d1, {3,4,5} at d2, 6 at d3 → reach 5, Σd 1+6+3
    assert(got(2L) === ((1L, 3L, 1L, 5L, 10L, 0.5)))
    // the center's closeness tops every other node
    assert(got.values.map(_._6).max === got(1L)._6)
  }

  test("hits matches a sequential fixed-point reference bit for bit") {
    val scale = 1000000L
    def refHits(edges: Seq[(Long, Long)], iters: Int)
        : Map[Long, (Long, Long)] = {
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      var hub = nodes.map(_ -> scale).toMap
      var auth = nodes.map(_ -> scale).toMap
      def rescale(m: Map[Long, Long]): Map[Long, Long] = {
        val mx = math.max(m.values.max, 1L)
        m.map { case (k, v) => k -> (v * scale - Math.floorMod(v * scale, mx)) / mx }
      }
      for (_ <- 1 to iters) {
        auth = rescale(nodes.map(n =>
          n -> edges.filter(_._2 == n).map(e => hub(e._1)).sum).toMap)
        hub = rescale(nodes.map(n =>
          n -> edges.filter(_._1 == n).map(e => auth(e._2)).sum).toMap)
      }
      nodes.map(n => n -> ((hub(n), auth(n)))).toMap
    }
    // mixed digraph: a 2-cycle, a star, a chain — hubs and authorities
    // overlap (nodes that both point and are pointed at)
    val es = Seq((1L, 2L), (2L, 1L), (1L, 3L), (4L, 3L), (3L, 5L), (5L, 6L))
    val got = GraphOps.hits(es.toDF("src", "dst"), iters = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === refHits(es, 3))
  }

  test("hits: bipartite hub/authority separation, scaled max = 1e6") {
    // hub 1 → {10, 11, 12}; hub 2 → {10, 11}; weak hub 3 → {13};
    // pure authorities never link out, pure hubs are never linked to.
    val edges = Seq((1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 10L), (2L, 11L), (3L, 13L)).toDF("src", "dst")
    val got = GraphOps.hits(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.size === 7)
    // the best hub hits the rescale ceiling; ordering follows coverage
    assert(got(1L)._1 === 1000000L)
    assert(got(1L)._1 > got(2L)._1 && got(2L)._1 > got(3L)._1)
    // authorities: quoted-by-both {10,11} top and tie, 12 next, 13 last
    assert(got(10L)._2 === 1000000L && got(10L)._2 === got(11L)._2)
    assert(got(11L)._2 > got(12L)._2 && got(12L)._2 > got(13L)._2)
    // pure hubs have zero authority, pure authorities zero hubness
    assert(Seq(1L, 2L, 3L).forall(got(_)._2 === 0L))
    assert(Seq(10L, 11L, 12L, 13L).forall(got(_)._1 === 0L))
  }
}
