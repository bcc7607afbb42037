package graft

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: hand-computed 3-iteration ranks on a 4-node graph") {
    // S1→{C1,C2}, S2→C1; C1/C2 dangling. Worked by hand with the exact
    // integer recurrence r' = 150000 + (85·(contrib + dang div n)) div 100:
    //   iter1: S=575000, C1=1850000, C2=1000000
    //   iter2: S=755625, C1=1488750, C2=1000000
    //   iter3: S=678858, C1=1642280, C2=999999  (truncation dust appears)
    val edges = Seq(("S1", "C1"), ("S1", "C2"), ("S2", "C1")).toDF("src", "dst")
    val got = Graph.pageRank(edges, iters = 3)
      .as[(String, Long)].collect().toMap
    assert(got === Map(
      "S1" -> 678858L, "S2" -> 678858L, "C1" -> 1642280L, "C2" -> 999999L))
  }

  test("katzCentrality: hand-computed 3-round truncated series") {
    // 1→2, 3→2, 2→4; unit 1e6, alpha 20/100, beta 800000. No degree
    // split, no dangling recycling:
    //   r1: {1:800000, 3:800000, 2:1200000, 4:1000000}
    //   r2: {2: 800000+(20·1600000)//100 = 1120000, 4: 800000+240000}
    //   r3: {2: 1120000, 4: 800000+(20·1120000)//100 = 1024000}
    val edges = Seq((1L, 2L), (3L, 2L), (2L, 4L)).toDF("src", "dst")
    val got = Graph.katzCentrality(edges, iters = 3)
      .as[(Long, Long)].collect().toMap
    graft.plans.ReleaseRegistry.drain()
    assert(got === Map(
      1L -> 800000L, 2L -> 1120000L, 3L -> 800000L, 4L -> 1024000L))
  }

  test("clusteringCoefficient: hand-computed lcc on a square with a diagonal") {
    // 1-2-3-4-1 plus 1-3: triangles (1,2,3) and (1,3,4). deg 1=3, 2=2,
    // 3=3, 4=2; lcc(1)=2*2e6//(3*2)=666666, lcc(2)=2e6//2*... = 1000000
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)).toDF("src", "dst")
    val got = Graph.clusteringCoefficient(edges)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    graft.plans.ReleaseRegistry.drain()
    assert(got === Map(
      1L -> ((3L, 2L, 666666L)), 2L -> ((2L, 1L, 1000000L)),
      3L -> ((3L, 2L, 666666L)), 4L -> ((2L, 1L, 1000000L))))
  }

  test("linkPredictionRA: inverse-degree evidence, edges excluded, cap honored") {
    // square 1-2-3-4: the two diagonals are the only non-adjacent pairs,
    // each with both opposite corners (deg 2) as common neighbors
    val sq = Seq((1L, 2L), (2L, 3L), (1L, 4L), (4L, 3L)).toDF("src", "dst")
    val got = Graph.linkPredictionRA(sq)
      .as[(Long, Long, Long, Long)].collect().toSeq
    graft.plans.ReleaseRegistry.drain()
    assert(got === Seq((1L, 3L, 2L, 1000000L), (2L, 4L, 2L, 1000000L)))
    // add a hub 5 adjacent to all: cap 3 keeps the corners (deg 3) as
    // wedge centers (333333 each) and drops the hub (deg 4) — its
    // evidence for the diagonals is truncated by design; every pair
    // INVOLVING 5 is an edge and is anti-joined out
    val hub = sq.union(Seq((5L, 1L), (5L, 2L), (5L, 3L), (5L, 4L)).toDF("src", "dst"))
    val got2 = Graph.linkPredictionRA(hub, maxHubDegree = 3L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    graft.plans.ReleaseRegistry.drain()
    assert(got2 === Seq((1L, 3L, 2L, 666666L), (2L, 4L, 2L, 666666L)))
    // cap 2 excludes every center: no candidates survive
    val got3 = Graph.linkPredictionRA(hub, maxHubDegree = 2L).count()
    graft.plans.ReleaseRegistry.drain()
    assert(got3 === 0L)
  }

  test("id-packing guard: ids outside [0, 2^31) route through the dense re-id fallback") {
    // the packed BIGINT keys (deg·2³²+id in triangles, u·2³²+v in RA)
    // silently collide above 2³¹ — the runtime guard must detour such
    // graphs through the monotone dense re-id and hand back ORIGINAL ids
    // with identical counts/scores. Same square-with-diagonal as the lcc
    // case, shifted far past the bound:
    val OFF = 3L * 4294967296L // 3·2^32 ≫ 2^31
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .map { case (a, b) => (a + OFF, b + OFF) }.toDF("src", "dst")
    val tri = Graph.triangleCounts(edges).as[(Long, Long)].collect().toMap
    graft.plans.ReleaseRegistry.drain()
    assert(tri === Map(1L + OFF -> 2L, 2L + OFF -> 1L,
      3L + OFF -> 2L, 4L + OFF -> 1L))
    // RA over the plain square, one corner NEGATIVE (the other contract
    // violation): both diagonals score 2 common deg-2 neighbors; original
    // ids come back and the (ra desc, u, v) order holds
    val sq = Seq((-5L, 2L), (2L, 3L), (-5L, 4L), (4L, 3L)).toDF("src", "dst")
    val ra = Graph.linkPredictionRA(sq)
      .as[(Long, Long, Long, Long)].collect().toSeq
    graft.plans.ReleaseRegistry.drain()
    assert(ra === Seq((-5L, 3L, 2L, 1000000L), (2L, 4L, 2L, 1000000L)))
  }

  test("linkPredictionCore: RA on the k-core backbone drops periphery candidates") {
    // dense core: K5 minus edge (1,3); sparse periphery: 6 hangs off 1,
    // 7 hangs off 6. k=3 peels {6,7}; the core's only non-adjacent pair
    // is (1,3) with common neighbors 2/4/5 (subgraph degree 4 each).
    val core = Seq((1L, 2L), (1L, 4L), (1L, 5L), (2L, 3L), (2L, 4L),
      (2L, 5L), (3L, 4L), (3L, 5L), (4L, 5L))
    val g = (core ++ Seq((1L, 6L), (6L, 7L))).toDF("src", "dst")
    val got = Graph.linkPredictionCore(g, k = 3, rounds = 4)
      .as[(Long, Long, Long, Long)].collect().toSeq
    graft.plans.ReleaseRegistry.drain()
    assert(got === Seq((1L, 3L, 3L, 750000L)))
    // the raw variant on the same graph also surfaces periphery pairs
    // (e.g. (2,6) through center 1) — the composition must exclude them
    val raw = Graph.linkPredictionRA(g)
      .as[(Long, Long, Long, Long)].collect().toSeq
    graft.plans.ReleaseRegistry.drain()
    assert(raw.exists(r => r._1 == 2L && r._2 == 6L))
    assert(raw.contains((1L, 3L, 3L, 750000L)),
      "core degrees equal raw degrees here, so the shared pair scores the same")
  }

  test("hits: hand-computed one-round hubs/authorities with integer rescale") {
    // 1→10, 2→10, 2→11, 3→11 (bipartite). a1 raw: {10:2e6, 11:2e6},
    // Σ=4e6, na=2 → scale 2 → both 1e6. h1 raw: {1:1e6, 2:2e6, 3:1e6},
    // Σ=4e6, nh=3 → scale max(1, 4e6//3e6)=1 → unchanged.
    val edges = Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L)).toDF("src", "dst")
    val got = Graph.hits(edges, iters = 1)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    graft.plans.ReleaseRegistry.drain()
    assert(got === Map(
      1L -> ((1000000L, 0L)), 2L -> ((2000000L, 0L)), 3L -> ((1000000L, 0L)),
      10L -> ((0L, 1000000L)), 11L -> ((0L, 1000000L))))
  }

  test("pageRank: duplicate edges collapse; rank mass is conserved minus dust") {
    val edges = Seq(("A", "B"), ("A", "B"), ("A", "C"), ("B", "C"), ("C", "A"))
      .toDF("src", "dst")
    val dup = Graph.pageRank(edges, iters = 2).as[(String, Long)].collect().toMap
    val once = Graph.pageRank(edges.distinct(), iters = 2)
      .as[(String, Long)].collect().toMap
    assert(dup === once)
    // no dangling nodes here: total mass stays within integer-truncation
    // dust of n·10⁶ and every rank is positive
    val total = dup.values.sum
    assert(total <= 3000000L && total > 2999000L)
    assert(dup.values.forall(_ > 0))
  }

  test("pageRankReleasable: release hook drops every pinned RDD; ranks unchanged") {
    val edges = Seq(("S1", "C1"), ("S1", "C2"), ("S2", "C1")).toDF("src", "dst")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val res = Graph.pageRankReleasable(edges, iters = 3)
    val got = res.ranks.as[(String, Long)].collect().toMap
    assert(got === Map(
      "S1" -> 678858L, "S2" -> 678858L, "C1" -> 1642280L, "C2" -> 999999L))
    assert(res.itersRun === 3)
    res.release()
    // release() keeps exactly the live lineage-truncation checkpoint (its
    // blocks ARE the data); releaseAll() frees that too
    val afterRelease = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(afterRelease.size <= 1,
      s"release() may keep only the live checkpoint: $afterRelease")
    res.releaseAll()
    graft.plans.ReleaseRegistry.drain() // the queued invalidating tier
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"releaseAll() left RDDs pinned: $leaked")
  }

  test("pageRankUntil stops early on a converged graph and matches pageRank") {
    // directed 3-cycle, out-degree 1 everywhere: uniform rank is the exact
    // integer fixpoint, so iteration 1 moves nothing and the loop stops
    val ring = Seq(("A", "B"), ("B", "C"), ("C", "A")).toDF("src", "dst")
    val res = Graph.pageRankUntil(ring, epsMicro = 0L, maxIters = 10)
    assert(res.itersRun === 1, s"expected early stop, ran ${res.itersRun}")
    val got = res.ranks.as[(String, Long)].collect().toMap
    assert(got === Map("A" -> 1000000L, "B" -> 1000000L, "C" -> 1000000L))
    res.release()
    // on a non-trivial graph a run stopped at iteration k is bit-exact
    // pageRank(k) — same integer recurrence, same truncation dust
    val edges = Seq(("S1", "C1"), ("S1", "C2"), ("S2", "C1")).toDF("src", "dst")
    val conv = Graph.pageRankUntil(edges, epsMicro = 0L, maxIters = 6)
    val fixed = Graph.pageRank(edges, iters = conv.itersRun)
      .as[(String, Long)].collect().toMap
    assert(conv.ranks.as[(String, Long)].collect().toMap === fixed)
    conv.release()
  }

  test("pageRankWeighted: rank flows along weights; hand-checked one iteration") {
    // S1 sends 75% of its mass to C1, 25% to C2 (w 3:1); customers dangle.
    // wn: C1=750000, C2=250000. iter1 by hand (dang=2e6, n=3, d//n=666666):
    //   S1 = 150000 + (85·666666)//100            = 716666
    //   C1 = 150000 + (85·(750000+666666))//100   = 1354166
    //   C2 = 150000 + (85·(250000+666666))//100   = 929166
    val edges = Seq(("S1", "C1", 3L), ("S1", "C2", 1L)).toDF("src", "dst", "w")
    val res = Graph.pageRankWeighted(edges, iters = 1)
    val got = res.ranks.as[(String, Long)].collect().toMap
    assert(got === Map("S1" -> 716666L, "C1" -> 1354166L, "C2" -> 929166L))
    res.release()
    // duplicate edges collapse by summing weight before normalizing
    val dup = Seq(("S1", "C1", 2L), ("S1", "C1", 1L), ("S1", "C2", 1L))
      .toDF("src", "dst", "w")
    val res2 = Graph.pageRankWeighted(dup, iters = 1)
    assert(res2.ranks.as[(String, Long)].collect().toMap === got)
    res2.release()
  }

  test("labelPropagateReleasable: release hook drops every pinned RDD") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    graft.plans.ReleaseRegistry.drain()
    val (labels, release) = Graph.labelPropagateReleasable(edges, iters = 2)
    assert(labels.count() === 5)
    release()
    // release() keeps only the intermediate lineage-truncation checkpoint
    // (queued with the registry's invalidating tier); drain clears it
    val afterRelease = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(afterRelease.size <= 1,
      s"release() may keep only the live checkpoint: $afterRelease")
    graft.plans.ReleaseRegistry.drain()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"drain left RDDs pinned: $leaked")
  }

  test("labelPropagate: k rounds reach min-within-k-hops; enough rounds = components") {
    // path 1-2-3-4 plus isolated pair 10-11; labels are hop-bounded minima
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("src", "dst")
    val one = Graph.labelPropagate(edges, iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(one === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 10L -> 10L, 11L -> 10L))
    val full = Graph.labelPropagate(edges, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(full === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
    // direction/duplication of the input edges is irrelevant (undirected)
    val messy = Seq((2L, 1L), (2L, 3L), (3L, 2L), (4L, 3L), (11L, 10L), (10L, 11L))
      .toDF("src", "dst")
    assert(Graph.labelPropagate(messy, iters = 3)
      .as[(Long, Long)].collect().toMap === full)
  }

  test("triangleCounts: K4 has four triangles, three per node") {
    // complete graph on 4 nodes: C(4,3) = 4 triangles, each node in 3
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val got = Graph.triangleCounts(edges).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts: bipartite graphs are triangle-free; dup/reversed edges collapse") {
    val bip = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L)).toDF("src", "dst")
    assert(Graph.triangleCounts(bip).count() === 0)
    // one triangle written with duplicates, reversals, and a self-loop
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (2L, 3L), (3L, 1L), (1L, 1L))
      .toDF("src", "dst")
    val got = Graph.triangleCounts(messy).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangleCounts: hub plus pendant — orientation never counts open wedges") {
    // star K1,3 (no triangle) plus one closing edge → exactly one triangle
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L)).toDF("src", "dst")
    val got = Graph.triangleCounts(edges).as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("pageRank on the trade graph: suppliers share one rank tier, heavy customers rise") {
    val pr = Graph.pageRank(Graph.tradeEdges(spark, sfDir), iters = 3)
    // even = supplier, odd = customer (the parity encoding)
    val byKind = pr.withColumn("kind", $"node" % 2)
    val kinds = byKind.groupBy("kind").count().as[(Long, Long)].collect().toMap
    assert(kinds.keySet === Set(0L, 1L))
    // deterministic under input repartitioning
    val again = Graph.pageRank(Graph.tradeEdges(spark, sfDir).repartition(5), iters = 3)
    assert(pr.except(again).count() === 0 && again.except(pr).count() === 0)
  }

  test("communities: rollup matches label components; label cache released eagerly") {
    graft.plans.ReleaseRegistry.drain()
    // path 1-2-3-4 (community 1, 4 members) + pair 10-11 (community 10)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("src", "dst")
    val before = spark.sparkContext.getPersistentRDDs.size
    val got = Graph.communities(edges, iters = 3)
      .select("community", "n_members", "min_node", "max_node")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 4L, 1L, 4L), (10L, 2L, 10L, 11L)))
    // the corpus-scale label cache was released INSIDE communities();
    // only the community-sized rollup and the propagation's intermediate
    // lineage checkpoint (registry-queued) remain until drain
    assert(spark.sparkContext.getPersistentRDDs.size <= before + 2,
      "communities should pin at most its rollup + the live checkpoint")
    graft.plans.ReleaseRegistry.drain()
    assert(spark.sparkContext.getPersistentRDDs.size === before)
  }

  test("modularity: clean cliques score Q=0.5; a merged blob scores ~0") {
    graft.plans.ReleaseRegistry.drain()
    // two DISCONNECTED triangles: label prop finds {1,2,3} and {4,5,6}
    val clean = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
      .toDF("src", "dst")
    val got = Graph.modularity(clean, iters = 3)
      .select("community", "n_members", "in_edges", "deg_sum", "q_contrib")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map { case (c, n, e, d, q) => c -> ((n, e, d, q)) }.toMap
    // m=6; each triangle: in=3, deg_sum=6 -> 3/6 - (6/12)^2 = 0.25
    assert(got(1L) === ((3L, 3L, 6L, 0.25)))
    assert(got(4L) === ((3L, 3L, 6L, 0.25)))
    assert(math.abs(got.values.map(_._4).sum - 0.5) < 1e-9)
    // bridge the triangles: min-label floods one community and the metric
    // correctly reports no structure (all edges in, q = 1 - 1 = 0)
    val bridged = clean.union(Seq((3L, 4L)).toDF("src", "dst"))
    val blob = Graph.modularity(bridged, iters = 3)
      .select("community", "q_contrib").as[(Long, Double)].collect()
    assert(blob.length === 1 && math.abs(blob.head._2) < 1e-9)
    graft.plans.ReleaseRegistry.drain()
  }

  test("kCore: peels the tail, keeps the clique, cascades removals") {
    // K4 clique (deg 3 inside) + a path tail 4-5-6 hanging off node 4:
    // round 1 removes leaf 6 (deg 1) and 5 (deg 2 < 3)... cascade:
    // node 5 has deg 2 -> gone round 1; after that nothing else drops —
    // 4's degree inside the survivors is 3 (the clique)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("src", "dst")
    val got = Graph.kCore(edges, k = 3, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    graft.plans.ReleaseRegistry.drain()

    // cascade test: a long path peels one layer per round under k=2 —
    // with bounded rounds the approximation is a documented SUPERSET
    val path = (1L to 6L).sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("src", "dst")
    val r1 = Graph.kCore(path, k = 2, rounds = 1)
      .as[(Long, Long)].collect().toMap
    // one round: endpoints 1 and 6 drop, 2-3-4-5 remain as a path
    assert(r1.keySet === Set(2L, 3L, 4L, 5L))
    val r4 = Graph.kCore(path, k = 2, rounds = 4)
      .as[(Long, Long)].collect()
    // enough rounds: the whole path dies (no 2-core in a tree)
    assert(r4.isEmpty)
    graft.plans.ReleaseRegistry.drain()
  }

  test("kCore peel join: broadcast hint only under the survivor bound") {
    // the scale guard: a forced broadcast() hint bypasses Spark's size
    // checks, so above the survivor bound kCore must withhold it and let
    // Catalyst plan a shuffled semi join. Pin both shapes on the INITIAL
    // plan with auto-broadcast off, so the only possible broadcast source
    // is the hint itself.
    val alive = (1L to 50L).map(i => (i, i % 7)).toDF("x", "y")
    val keep = (1L to 20L).toDF("x")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val hinted = Graph.peelJoin(alive, keep, useBroadcast = true)
        .queryExecution.executedPlan.toString
      assert(hinted.contains("BroadcastHashJoin"),
        s"hinted peel round must broadcast:\n$hinted")
      val fallback = Graph.peelJoin(alive, keep, useBroadcast = false)
        .queryExecution.executedPlan.toString
      assert(!fallback.contains("Broadcast"),
        s"unhinted peel round must not force a broadcast:\n$fallback")
      assert(fallback.contains("LeftSemi"),
        s"fallback must stay a semi join:\n$fallback")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
  }

  test("kCore: fallback (unhinted) path returns the same core") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("src", "dst")
    // broadcastMaxRows = 0 forces every round onto the shuffled-semi path
    val got = Graph.kCore(edges, k = 3, rounds = 3, broadcastMaxRows = 0L)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    graft.plans.ReleaseRegistry.drain()
  }

  test("degreeQuantile: derives a data-driven core order") {
    // star: hub degree 5, five leaves degree 1
    val star = (1L to 5L).map(i => (0L, i)).toDF("src", "dst")
    assert(Graph.degreeQuantile(star, 0.5) === 1)
    assert(Graph.degreeQuantile(star, 1.0) === 5)
  }

  test("assortativity: star is perfectly disassortative, regular graph undefined") {
    // hub 0 to 5 leaves: every edge pairs deg 5 with deg 1 -> r = -1
    val star = (1L to 5L).map(i => (0L, i)).toDF("src", "dst")
    val s = Graph.assortativity(star)
      .as[(Long, Option[Double])].collect().head
    assert(s._1 === 10L) // 5 edges x both orientations
    assert(s._2.exists(r => math.abs(r - (-1.0)) < 1e-9), s"star r = ${s._2}")

    // a triangle is 2-regular: zero degree variance -> r undefined (null)
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val t = Graph.assortativity(tri)
      .as[(Long, Option[Double])].collect().head
    assert(t._1 === 6L && t._2.isEmpty)

    // assortative pairing: two cliques of different sizes joined nowhere —
    // same-degree endpoints everywhere -> every edge pairs equal degrees,
    // but ACROSS the graph degrees vary, so r = +1
    val cliques = Seq((1L, 2L), (2L, 3L), (1L, 3L), // K3 (deg 2)
      (4L, 5L)) // K2 (deg 1)
      .toDF("src", "dst")
    val c = Graph.assortativity(cliques)
      .as[(Long, Option[Double])].collect().head
    assert(c._2.exists(r => math.abs(r - 1.0) < 1e-9), s"cliques r = ${c._2}")
  }

  test("bfsLevels: hand-computed distances on a path graph") {
    // path 1-2-3-4-5, seeds = 2 smallest ids {1, 2}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val got = Graph.bfsLevels(edges, nSources = 2, maxDepth = 6)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === Set(
      (1L, 1L, 0), (1L, 2L, 1), (1L, 3L, 2), (1L, 4L, 3), (1L, 5L, 4),
      (2L, 2L, 0), (2L, 1L, 1), (2L, 3L, 1), (2L, 4L, 2), (2L, 5L, 3)))
  }

  test("bfsLevels: maxDepth bounds the frontier; direction is ignored") {
    // all edges point AT node 1 — undirected BFS still reaches everything
    val edges = Seq((2L, 1L), (3L, 2L), (4L, 3L)).toDF("src", "dst")
    val got = Graph.bfsLevels(edges, nSources = 1, maxDepth = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === Set((1L, 1L, 0), (1L, 2L, 1), (1L, 3L, 2)))
  }

  test("bfsLevels: disconnected component stays unreached; early exit on exhaustion") {
    // {1,2} and {10,11} disconnected; seed = node 1 only. maxDepth 6 >>
    // eccentricity 1, so the loop must early-exit on the empty frontier
    val edges = Seq((1L, 2L), (10L, 11L)).toDF("src", "dst")
    val got = Graph.bfsLevels(edges, nSources = 1, maxDepth = 6)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === Set((1L, 1L, 0), (1L, 2L, 1)))
    // self-loops are dropped before symmetrization
    val loops = Seq((1L, 1L), (1L, 2L)).toDF("src", "dst")
    val g2 = Graph.bfsLevels(loops, nSources = 1, maxDepth = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(g2 === Set((1L, 1L, 0), (1L, 2L, 1)))
  }

  test("harmonicCentrality: truncating micro-unit sums over the seed sample") {
    // path 1-2-3-4, seeds {1, 2}:
    //   node 1: from 2 at d1            -> h = 1000000, reached 1
    //   node 2: from 1 at d1            -> h = 1000000, reached 1
    //   node 3: from 1 at d2, 2 at d1   -> h = 500000 + 1000000, reached 2
    //   node 4: from 1 at d3, 2 at d2   -> h = 333333 + 500000,  reached 2
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val got = Graph.harmonicCentrality(edges, nSources = 2, maxDepth = 6)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      1L -> ((1L, 1000000L)), 2L -> ((1L, 1000000L)),
      3L -> ((2L, 1500000L)), 4L -> ((2L, 833333L))))
  }

  test("shortestPathsWeighted: relaxation beats the direct edge; dup weights sum") {
    // 1-2 (w5), 2-3 (w1), 1-3 (w10): from seed 1 the best route to 3 is
    // 1→2→3 = 6, found only on relaxation round 2; seed 2 reaches both
    // neighbors directly. The duplicate (1,2) rows must sum to w=5 first.
    val edges = Seq((1L, 2L, 2L), (1L, 2L, 3L), (2L, 3L, 1L), (1L, 3L, 10L))
      .toDF("src", "dst", "w")
    val got = Graph.shortestPathsWeighted(edges, nSources = 2, rounds = 6)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 1L, 0L), (1L, 2L, 5L), (1L, 3L, 6L),
      (2L, 2L, 0L), (2L, 1L, 5L), (2L, 3L, 1L)))
  }

  test("shortestPathsWeighted: bounded rounds cap the hop count; early exit is exact") {
    // path 1-2-3-4-5 (unit weights): rounds=2 reaches only 2 hops out;
    // rounds=10 converges early (after round 4 nothing changes) and the
    // result equals the true shortest paths
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (4L, 5L, 1L))
      .toDF("src", "dst", "w")
    val capped = Graph.shortestPathsWeighted(edges, nSources = 1, rounds = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(capped === Set((1L, 1L, 0L), (1L, 2L, 1L), (1L, 3L, 2L)))
    val full = Graph.shortestPathsWeighted(edges, nSources = 1, rounds = 10)
      .as[(Long, Long, Long)].collect().toSet
    assert(full === Set((1L, 1L, 0L), (1L, 2L, 1L), (1L, 3L, 2L),
      (1L, 4L, 3L), (1L, 5L, 4L)))
  }

  test("personalizedPageRank: hand-computed seed-teleport ranks") {
    // A→B, B→A, B→C; seed {A} (smallest id); C dangling. Worked by hand
    // with T = ((15·3·10⁶) div 100) div 1 = 450000 and the recurrence
    // r'(v) = [v∈S]·(T + (85·(dang div s)) div 100) + (85·c(v)) div 100:
    //   r1: A=1725000  B= 850000  C=425000
    //   r2: A=1172500  B=1466250  C=361250
    //   r3: A=1380218  B= 996625  C=623156   (mass 2999999 — dust 1)
    val edges = Seq(("A", "B"), ("B", "A"), ("B", "C")).toDF("src", "dst")
    val got = Graph.personalizedPageRank(edges, nSeeds = 1, iters = 3)
      .as[(String, Long)].collect().toMap
    assert(got === Map("A" -> 1380218L, "B" -> 996625L, "C" -> 623156L))
  }

  test("personalizedPageRank: all-dangling seeds absorb the full mass") {
    // bipartite S→C with dangling seeds {C1, C2}: after one round the
    // suppliers hold nothing and teleport+dangling recycle keeps the
    // whole n·10⁶ mass on the seeds — a fixpoint by round 2
    val edges = Seq(("S1", "C1"), ("S1", "C2"), ("S2", "C1")).toDF("src", "dst")
    val got = Graph.personalizedPageRank(edges, nSeeds = 2, iters = 3)
      .as[(String, Long)].collect().toMap
    assert(got === Map(
      "C1" -> 2000000L, "C2" -> 2000000L, "S1" -> 0L, "S2" -> 0L))
    assert(got.values.sum === 4L * 1000000L)
  }

  test("shortestPathsWeighted and personalizedPageRank release their loop state") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val edges = Seq((1L, 2L, 5L), (2L, 3L, 1L)).toDF("src", "dst", "w")
    assert(Graph.shortestPathsWeighted(edges, nSources = 1).count() === 3L)
    assert(Graph.personalizedPageRank(
      edges.select($"src", $"dst"), nSeeds = 1).count() === 3L)
    graft.plans.ReleaseRegistry.drain()
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    def leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    while (leaked.nonEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    assert(leaked.isEmpty, s"loop state left pinned: $leaked")
  }

  test("coOccurrenceEdges: in-array pair expansion matches the self-join reference") {
    import org.apache.spark.sql.functions.{col, countDistinct, expr}
    val got = Graph.coOccurrenceEdges(spark, sfDir)
    // every row canonical by construction
    assert(got.where(col("src") >= col("dst")).count() === 0L)
    // collapsed edge set identical to the reference distinct → self-join form
    val op = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val ref = op.as("x").join(op.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("src"), col("y.pk").as("dst")).distinct()
    val dedup = got.distinct()
    assert(dedup.except(ref).count() === 0L && ref.except(dedup).count() === 0L)
    // multiplicity contract: total pair rows = Σ per order C(distinct parts, 2)
    val expectedRows = op.groupBy("ok").agg(countDistinct("pk").as("n"))
      .select(expr("n * (n - 1) div 2")).as[Long].collect().sum
    assert(got.count() === expectedRows)
  }

  test("bfsLevels: releases its loop state (adjacency + checkpoint generations)") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val out = Graph.bfsLevels(edges, nSources = 2, maxDepth = 6)
    assert(out.count() === 10L)
    graft.plans.ReleaseRegistry.drain()
    // unpersists are async (blocking = false) — poll to the baseline
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    def leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    while (leaked.nonEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    assert(leaked.isEmpty, s"bfsLevels left RDDs pinned: $leaked")
  }
}
