package graft

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def emb = Seq(
    (0L, Seq(1f, 0f)),
    (1L, Seq(2f, 0f)),      // same direction as 0 → cosine 1.0
    (2L, Seq(0f, 3f)),      // orthogonal to 0 → cosine 0.0
    (3L, Seq(1f, 1f))       // 45° → cosine ~0.7071
  ).toDF("vec_id", "embedding")

  test("cosineTopK ranks by cosine similarity with deterministic ties") {
    val got = Similarity.cosineTopKPrefix(emb, nQueries = 1, k = 3)
      .select("nbr_id", "sim", "rnk").as[(Long, Double, Int)].collect().sortBy(_._3)
    assert(got.map(_._1).toSeq === Seq(1L, 3L, 2L))
    assert(got(0)._2 === 1.0)
    assert(got(1)._2 === 0.7071)
    assert(got(2)._2 === 0.0)
  }

  test("hardNegatives: only different-label neighbors, nearest first, " +
    "and the same-direction same-label vector never appears") {
    val labeled = Seq(
      (0L, Seq(1f, 0f), 0),
      (1L, Seq(2f, 0f), 0),  // same label as query 0 → excluded
      (2L, Seq(0f, 3f), 1),  // orthogonal, different label
      (3L, Seq(1f, 1f), 1),  // 45°, different label → hardest negative
      (4L, Seq(-1f, 0f), 2)  // opposite, different label
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(labeled, nQueries = 1, k = 3)
      .select("query_id", "query_label", "nbr_id", "nbr_label", "sim", "rnk")
      .as[(Long, Int, Long, Int, Double, Int)].collect().sortBy(_._6)
    assert(got.map(_._3).toSeq === Seq(3L, 2L, 4L), s"got ${got.toSeq}")
    assert(got.forall(r => r._4 != r._2), "same-label row leaked")
    assert(got.head._5 === 0.7071 && got.last._5 === -1.0)
    // the self-direction duplicate (vec 1, label 0) must never appear
    assert(!got.exists(_._3 == 1L))
  }

  test("labelMargins: healthy query has positive margin, a mislabeled " +
    "twin violates; lone-label query reports null top_pos") {
    val labeled = Seq(
      (0L, Seq(1f, 0f), 0),  // healthy: pos = vec 1 (1.0), neg = vec 3 (.7071)
      (1L, Seq(2f, 0f), 0),
      (2L, Seq(0f, 3f), 1),  // violated: pos = vec 3 (.7071), but the
      (3L, Seq(1f, 1f), 1),  //   mislabeled twin vec 5 scores 1.0
      (4L, Seq(-2f, 1f), 2), // lone label → null pos, null margin
      (5L, Seq(0f, 1f), 0)   // same direction as vec 2, wrong label
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.labelMargins(labeled, nQueries = 5).collect()
      .map(r => r.getLong(0) -> r).toMap
    val q0 = got(0L)
    assert(q0.getDouble(2) === 1.0 && q0.getDouble(3) === 0.7071)
    assert(q0.getDouble(4) === 0.2929 && !q0.getBoolean(5))
    val q2 = got(2L)
    assert(q2.getDouble(2) === 0.7071 && q2.getDouble(3) === 1.0)
    assert(q2.getDouble(4) === -0.2929 && q2.getBoolean(5),
      s"mislabeled twin must violate: $q2")
    val q4 = got(4L)
    assert(q4.isNullAt(2) && !q4.isNullAt(3) && q4.isNullAt(4) &&
      q4.isNullAt(5))
  }

  test("lshNearPairs finds identical-direction vectors") {
    val pairs = Similarity.lshNearPairs(emb, dims = 2, minSim = 0.99)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists { case (a, b) => Set(a, b) == Set(0L, 2L) })
  }

  test("ivfTopK with full probing equals brute force") {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.where($"vec_id" < 4)
    val ivf = Similarity.ivfTopK(e, q, nList = 8, nProbe = 8, k = 5)
      .select("query_id", "nbr_id", "rnk").as[(Long, Long, Int)].collect().toSet
    val bf = Similarity.cosineTopK(e, q, k = 5)
      .select("query_id", "nbr_id", "rnk").as[(Long, Long, Int)].collect().toSet
    assert(ivf === bf)
  }

  test("embeddingStats: group counts cover the table") {
    val e = Tables.embeddings(spark, sfDir)
    val stats = Similarity.embeddingStats(e)
    assert(stats.agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0) === e.count())
    assert(stats.where($"min_norm" > $"max_norm").count() === 0)
  }

  test("quantizeEmbeddings: int8 round-trip error bounded by scale/127") {
    val e = Tables.embeddings(spark, sfDir).limit(50)
    val q = Similarity.quantizeEmbeddings(e)
    val joined = e.join(q, "vec_id")
      .select($"vec_id", $"embedding", $"scale", $"q")
      .as[(Long, Seq[Float], Double, Seq[Byte])].collect()
    joined.foreach { case (_, orig, scale, bytes) =>
      assert(bytes.length === orig.length)
      orig.zip(bytes).foreach { case (x, b) =>
        val restored = b.toDouble / 127.0 * scale
        assert(math.abs(x - restored) <= scale / 127.0 + 1e-6)
      }
    }
  }

  test("lshBuckets: one native node at dims=256, codegen'd, matches a Scala replay") {
    import org.apache.spark.sql.functions._
    val dims = 256
    val nBits = 12
    val nTables = 8
    val raw: Map[Long, IndexedSeq[Float]] = (0L until 16L).map(i =>
      i -> IndexedSeq.tabulate(dims)(d => (((i * 31 + d * 7) % 97).toFloat - 48f) / 97f)).toMap
    val vecs = raw.toSeq.sortBy(_._1).toDF("vec_id", "embedding")
    // the column is a single native expression — not nBits × dims
    // arithmetic nodes (the shape that used to blow up Janino)
    val exprNode = org.apache.spark.sql.graft.ColumnBridge.expression(
      Similarity.lshBuckets(col("v"), dims, nBits, nTables))
    assert(exprNode.isInstanceOf[graft.functions.LshBuckets])
    val df = vecs
      .repartition(2) // defeat ConvertToLocalRelation so a real codegen stage exists
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), Similarity.lshBuckets(col("v"), dims, nBits, nTables).as("bkts"))
    val got = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // after execution AQE has finalized the plan; the projection must sit
    // inside a codegen stage — the `*(n)` node prefix is the
    // WholeStageCodegen marker in the plan rendering
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[[^\n]*graft_lsh_buckets""".r.findFirstIn(plan).isDefined,
      s"lshBuckets must stay inside whole-stage codegen:\n${plan.take(800)}")
    val planes = Similarity.lshPlanes(dims, nBits * nTables)
    raw.foreach { case (id, vec) =>
      val exp = Array.fill(nTables)(0L)
      for (i <- 0 until nBits * nTables) {
        val s = (0 until dims).map(d => vec(d).toDouble * planes(i)(d)).sum
        if (s >= 0) exp(i / nBits) |= 1L << (i % nBits)
      }
      assert(got(id) === exp.toSeq, s"bucket mismatch for vec $id")
    }
  }

  test("IVF index: persisted probe equals direct IVF; unprobed cells pruned via DPP") {
    val e = Tables.embeddings(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/idx"
    Similarity.buildIvfIndex(e, dir, nList = 8)
    val q = e.where($"vec_id" < 4)
    val idx = Similarity.ivfTopKIndexed(spark, dir, q, nProbe = 4, k = 5)
    val got = idx.select("query_id", "nbr_id", "rnk")
      .as[(Long, Long, Int)].collect().toSet
    val direct = Similarity.ivfTopK(e, q, nList = 8, nProbe = 4, k = 5)
      .select("query_id", "nbr_id", "rnk").as[(Long, Long, Int)].collect().toSet
    assert(got === direct)
    // the probed-cell join must prune unprobed partitions at runtime
    val plan = idx.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected dynamic partition pruning on cid:\n${plan.take(1500)}")
  }

  test("mmrRerank: near-duplicate of the top hit is demoted below a " +
    "diverse candidate; ranks are a greedy permutation") {
    // query 0 along +x; candidates: 1 and 2 nearly identical high-sim
    // (sim to query 0.9999 vs 0.9998), 3 diverse mid-sim. Pure relevance
    // would return (1, 2, 3); MMR must pick 1, then DEMOTE 2 (its
    // max-sim-to-selected ≈ 1 wipes the diversity term) in favor of 3.
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(1f, 0.01f, 0f, 0f)),
      (2L, Array(1f, 0.012f, 0f, 0f)),
      (3L, Array(0.8f, 0f, 0.6f, 0f)),
      (4L, Array(-1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(vecs, vecs.where($"vec_id" === 0L),
      k = 3, pool = 4, lambdaPct = 50)
      .orderBy("mmr_rank")
      .as[(Long, Long, Int, Long)].collect().toSeq
    graft.plans.ReleaseRegistry.drain()
    assert(got.map(_._3) === Seq(1, 2, 3), s"ranks must be 1..k: $got")
    assert(got.head._2 === 1L, s"first pick is pure relevance: $got")
    // round 2 at λ=50: the near-dup scores 50·9999 − 50·10000 = −50,
    // the diverse vec 3 scores 50·8000 − 50·8000 = 0 → demotion
    assert(got(1)._2 === 3L,
      s"the near-duplicate of the selected top hit must be demoted: $got")
    assert(got(2)._2 === 2L)
    // scores are the declared integer formula
    assert(got.head._4 === 50L * 10000L, s"rank-1 score = λ·sq: $got")
    assert(got(1)._4 === 0L && got(2)._4 === -50L, s"greedy scores: $got")
    // determinism under repartition
    val again = Similarity.mmrRerank(vecs.repartition(3),
      vecs.where($"vec_id" === 0L), k = 3, pool = 4, lambdaPct = 50)
      .orderBy("mmr_rank").as[(Long, Long, Int, Long)].collect().toSeq
    graft.plans.ReleaseRegistry.drain()
    assert(again === got)
  }

  test("ivfCellDriftExact: integer-exact drift table — full coverage, " +
    "bounded drift, deterministic under repartition") {
    val e = Tables.embeddings(spark, sfDir)
    val got = Similarity.ivfCellDriftExact(e, nList = 8)
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    // every vector assigned to exactly one cell; cells are the seed range
    assert(got.map(_._2).sum === e.count())
    assert(got.forall(r => r._1 >= 0 && r._1 < 8))
    // 1 − cos ∈ [0, 2] in micro-units (tiny negative impossible: the
    // integer Cauchy–Schwarz bound caps the cosine at 1)
    assert(got.forall(r => r._3 >= 0L && r._3 <= 2000000L), s"drift: $got")
    // the assigned cells differ from the seed groups, so SOME drift is
    // non-zero — the staleness signal the probe exists to measure
    assert(got.exists(_._3 > 0L), s"all-zero drift is degenerate: $got")
    val again = Similarity.ivfCellDriftExact(e.repartition(7), nList = 8)
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    assert(again === got)
  }

  test("mmrSelect: lambdaPct = 0 still picks pure relevance first; a " +
    "sparse-pairs candidate with no sim to the selected set is favored, " +
    "not dropped") {
    import org.apache.spark.sql.functions._
    // pool: id 10 most relevant, 11 next, 12 least; pairs cover ONLY
    // (10, 11) at high sim — 12 has no entry to anything
    val df = Seq(1).toDF("one").select(
      expr("array(named_struct('nbr_id', 10L, 'sq', 9000L), " +
        "named_struct('nbr_id', 11L, 'sq', 8000L), " +
        "named_struct('nbr_id', 12L, 'sq', 1000L))").as("cands"),
      expr("array(named_struct('a', 10L, 'b', 11L, 's', 9999L))").as("pairs"))
    // λ = 0: rank 1 must be the max-sq candidate (10), not min nbr_id
    val z = df.select(graft.functions.MmrFunctions.mmrSelect(
      col("cands"), col("pairs"), k = 1, lambdaPct = 0))
      .as[Seq[(Long, Int, Long)]].head
    assert(z.head._1 === 10L, s"rank-1 at λ=0 must be pure relevance: $z")
    // λ = 50, k = 2: candidate 11 scores 50·8000 − 50·9999 < 0; the
    // no-pair candidate 12 takes penalty 0 → 50·1000 > 0 and must WIN
    // round 2 (the most diverse candidate), never be skipped
    val s = df.select(graft.functions.MmrFunctions.mmrSelect(
      col("cands"), col("pairs"), k = 2, lambdaPct = 50))
      .as[Seq[(Long, Int, Long)]].head
    assert(s.map(_._1) === Seq(10L, 12L), s"sparse pairs → penalty 0: $s")
    assert(s(1)._3 === 50L * 1000L)
  }

  test("ivfAppend: new slice lands in existing cells, index equals " +
    "one-shot build on the union, drift reflects the appends") {
    val e = Tables.embeddings(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-app").toString + "/idx"
    val old = e.where($"vec_id" % 5 =!= 0)
    val fresh = e.where($"vec_id" % 5 === 0)
    Similarity.buildIvfIndex(old, dir, nList = 8)
    val drift0 = Similarity.ivfCellDrift(spark, dir)
      .as[(Int, Long, Long)].collect().map(r => r._1 -> r).toMap
    val drift1 = Similarity.ivfAppend(spark, dir, fresh)
      .as[(Int, Long, Long)].collect().map(r => r._1 -> r).toMap
    // every vector (old + appended) present exactly once
    val corpus = spark.read.parquet(s"$dir/corpus")
    assert(corpus.count() === e.count())
    assert(corpus.select("vec_id").distinct().count() === e.count())
    // appended rows sit in the nearest EXISTING centroid's cell: the
    // indexed probe with full probing must equal direct IVF over the
    // union corpus using the SAME (old-trained) centroids — which is
    // exactly what ivfTopKIndexed computes from the persisted cells
    val q = e.where($"vec_id" < 3)
    val got = Similarity.ivfTopKIndexed(spark, dir, q, nProbe = 8, k = 5)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val brute = Similarity.cosineTopK(e, q, k = 5)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    // full probing (nProbe = nList) scans every cell -> exact top-k
    assert(got === brute)
    // drift table: same cells, populations grew, drift non-negative and
    // some cell moved (the appended fifth shifts at least one mean)
    assert(drift1.keySet === drift0.keySet)
    assert(drift1.values.forall(_._3 >= 0L))
    assert(drift1.values.map(_._2).sum === e.count())
    assert(drift1.exists { case (cid, r) => r._3 != drift0(cid)._3 },
      s"appends must move some cell mean: before $drift0 after $drift1")
  }

  test("lshNearPairs plans as equi bucket joins — never a cross product") {
    val e = Tables.embeddings(spark, sfDir)
    val plan = Similarity.lshNearPairs(e, dims = 64, minSim = 0.5)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in LSH plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"nested-loop join in LSH plan:\n$plan")
  }

  test("cosNearPairs below the guard keeps the exact broadcast plan") {
    val small = Similarity.cosNearPairs(emb, minSim = 0.99)
    val plan = small.queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"small input should take the exact broadcast path:\n$plan")
    assert(small.select("a", "b").as[(Long, Long)].collect().toSet === Set((0L, 1L)))
  }

  test("cosNearPairs above the guard delegates to LSH — no broadcast NL join") {
    val adaptive = Similarity.cosNearPairs(emb, minSim = 0.99, maxBroadcastRows = 3)
    val plan = adaptive.queryExecution.sparkPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"guarded path must not broadcast the corpus:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in guarded plan:\n$plan")
    // same rows as calling the LSH path directly (dims inferred from data)
    val viaLsh = Similarity.lshNearPairs(emb, dims = 2, minSim = 0.99)
      .as[(Long, Long, Double)].collect().toSet
    assert(adaptive.as[(Long, Long, Double)].collect().toSet === viaLsh)
  }

  test("kmeansAssign: exhaustive, deterministic, and Lloyd steps don't increase inertia") {
    val e = Tables.embeddings(spark, sfDir)
    val out = Similarity.kmeansAssign(e, kClusters = 8, iters = 2).cache()
    assert(out.count() === e.count())
    assert(out.select("cid").distinct().as[Long].collect().forall(c => c >= 0 && c < 8))
    // squared distances (rounded) are non-negative up to FP noise
    assert(out.where($"d2" < -0.0001).count() === 0)
    // two Lloyd rounds never worsen the seed assignment's inertia
    val inertia2 = out.agg(org.apache.spark.sql.functions.sum("d2")).as[Double].head()
    val inertia0 = Similarity.kmeansAssign(e, kClusters = 8, iters = 0)
      .agg(org.apache.spark.sql.functions.sum("d2")).as[Double].head()
    assert(inertia2 <= inertia0 + 1e-6)
    // deterministic under a different input partitioning
    val b = Similarity.kmeansAssign(
      e.repartition(7), kClusters = 8, iters = 2)
    assert(out.except(b).count() === 0 && b.except(out).count() === 0)
    out.unpersist()
  }

  test("kmeans assignment stage is row-local — no corpus shuffle by vec_id") {
    val e = Tables.embeddings(spark, sfDir)
    val out = Similarity.kmeansAssign(e, kClusters = 8, iters = 1)
    // the only shuffles in a Lloyd round are the k-row centroid
    // recompute aggregates; the assignment itself is a broadcast of one
    // packed centroid row + a row-local argmin — never a corpus shuffle
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning(vec_id"),
      s"assignment must not shuffle the corpus by vec_id:\n${plan.take(1500)}")
  }

  test("kmeans model artifact: save -> load -> assign/semDedup/purity " +
    "score BIT-identically to the in-session operators") {
    val e = Tables.embeddings(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("kmeansmodel").toString
    Similarity.saveKmeansModel(e, dir, kClusters = 8, iters = 2)
    val (cents, k, iters) = Similarity.loadKmeansModel(spark, dir)
    assert(k === 8 && iters === 2 && cents.count() === 8L)
    // assignment from the stored table == in-session Lloyd assignment
    val live = Similarity.kmeansAssign(e, kClusters = 8, iters = 2)
      .collect().toSet
    val stored = Similarity.kmeansAssignWith(e, cents).collect().toSet
    graft.plans.ReleaseRegistry.drain()
    assert(stored === live)
    // the downstream consumers run against the stored model too
    val liveDedup = Similarity.semDedup(e, minSim = 0.6).collect().toSet
    val storedDedup = Similarity.semDedupWith(e, cents, minSim = 0.6)
      .collect().toSet
    graft.plans.ReleaseRegistry.drain()
    assert(storedDedup === liveDedup)
    val livePurity = Similarity.clusterPurity(e, kClusters = 8, iters = 2)
      .collect().toSet
    val storedPurity = Similarity.clusterPurityWith(e, cents).collect().toSet
    graft.plans.ReleaseRegistry.drain()
    assert(storedPurity === livePurity)
  }

  test("semDedup mega-cluster guard: forced single cluster delegates to LSH, drops stay sound") {
    val e = Tables.embeddings(spark, sfDir)
    val unguarded = Similarity.semDedup(e, kClusters = 1, iters = 0, minSim = 0.6)
    val guarded = Similarity.semDedup(e, kClusters = 1, iters = 0, minSim = 0.6,
      maxClusterPairs = 10L)
    // every vector still present exactly once
    assert(guarded.count() === e.count())
    // the oversized cluster must take the banded path, not the exhaustive
    // within-cluster self-join (bounded Σbucket² candidates, not n²/2)
    val plan = guarded.queryExecution.sparkPlan.toString
    assert(plan.contains("graft_lsh_buckets"),
      s"guarded path must delegate to LSH banding:\n${plan.take(1500)}")
    // soundness: LSH candidates are exact-cosine verified, so guarded
    // drops are a subset of the exhaustive path's drops
    val gd = guarded.where($"dropped").select("vec_id").as[Long].collect().toSet
    val ud = unguarded.where($"dropped").select("vec_id").as[Long].collect().toSet
    assert(gd.subsetOf(ud), s"unsound drops: ${gd -- ud}")
  }

  test("semDedupReleasable: hook unpins the assignment cache, rows unchanged") {
    val e = Tables.embeddings(spark, sfDir)
    val plain = Similarity.semDedup(e, minSim = 0.6).collect().toSet
    val (df, release) = Similarity.semDedupReleasable(e, minSim = 0.6)
    assert(df.collect().toSet === plain)
    val during = spark.sparkContext.getPersistentRDDs.size
    release()
    // the corpus-scale assignment frame is gone (the k-row centroid
    // table of the inner Lloyd loop stays, by the pinned-tiny contract)
    assert(spark.sparkContext.getPersistentRDDs.size < during)
  }

  test("semDedup drops near-duplicates cluster-locally, keeps the lowest id") {
    // two exact-duplicate groups plus two isolated vectors; with k=2 the
    // duplicates land in the same cluster by construction (identical
    // vectors always share a nearest centroid)
    val vecs = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(1f, 0f, 0f, 0f)),   // dup of 0 → dropped
      (2L, Seq(0f, 5f, 0f, 0f)),
      (3L, Seq(0f, 5.01f, 0f, 0f)), // near-dup of 2 → dropped
      (4L, Seq(0f, 0f, 3f, 4f))     // isolated → kept
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(vecs, kClusters = 2, iters = 1, minSim = 0.99)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.length === 5)
    val dropped = out.filter(_._3).map(_._1).toSet
    assert(dropped === Set(1L, 3L))
    // survivors of the fixture run are deterministic under repartitioning
    val e = Tables.embeddings(spark, sfDir)
    val a = Similarity.semDedup(e, minSim = 0.6)
    val b = Similarity.semDedup(e.repartition(7), minSim = 0.6)
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
  }

  test("a zero-norm vector never outranks real neighbors or emits near-pairs") {
    // 0/0 = NaN sorts above every double in Spark — unguarded, the zero
    // vector would be rank 1 for every query and pass every minSim filter
    val withZero = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0f, 0f)), (3L, Seq(0.8f, 0.3f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.cosineTopK(withZero, withZero.where($"vec_id" === 0), k = 2)
      .select("nbr_id").as[Long].collect().toSet
    assert(top === Set(1L, 3L), s"zero vector must rank last, got $top")
    val pairs = Similarity.cosNearPairs(withZero, minSim = 0.5)
      .select("a", "b").as[(Long, Long)].collect()
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L),
      "zero vector must not appear in near-duplicate pairs")
  }

  test("external queries keep same-id corpus neighbors with excludeSelf=false") {
    val corpus = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f))).toDF("vec_id", "embedding")
    // external query whose OWN id collides with corpus vec_id=0 — with the
    // default exclusion the true nearest neighbor would silently vanish
    val q = Seq((0L, Seq(0.9f, 0.05f))).toDF("vec_id", "embedding")
    val got = Similarity.cosineTopK(corpus, q, k = 1, excludeSelf = false)
      .select("nbr_id").as[Long].head()
    assert(got === 0L)
  }

  test("PQ and LSH fail fast on a dims mismatch instead of silently truncating") {
    val e8 = Seq((0L, Seq.fill(8)(0.5f)), (1L, Seq.fill(8)(0.25f)))
      .toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] { Similarity.pqCodebooks(e8, dims = 4, m = 2) }
    intercept[IllegalArgumentException] { Similarity.lshNearPairs(e8, dims = 16) }
  }

  test("brute-force and LSH agree on high-similarity pairs") {
    val exact = Similarity.cosineTopKPrefix(emb, nQueries = 4, k = 1)
      .where($"sim" >= 0.99).select("query_id", "nbr_id")
      .as[(Long, Long)].collect().map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val lsh = Similarity.lshNearPairs(emb, dims = 2, minSim = 0.99)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(exact.subsetOf(lsh)) // identical-direction vectors always share every sign bucket
  }

  test("PQ: encoding is m codes per vector; codebooks are m x codes") {
    val e = Tables.embeddings(spark, sfDir)
    val cb = Similarity.pqCodebooks(e, dims = 64, m = 16, codes = 32)
    assert(cb.count() === 16L * 32L)
    assert(cb.select("c").head().getSeq[Double](0).length === 4)
    val enc = Similarity.pqEncode(e, dims = 64, m = 16, codes = 32)
    val n = e.count()
    assert(enc.count() === n * 16)
    // every (vec, subspace) has exactly one code, all codes in range
    assert(enc.groupBy("vec_id").count().where($"count" =!= 16).count() === 0)
    assert(enc.where($"code" < 0 || $"code" >= 32).count() === 0)
  }

  test("PQ-ADC ranks approximate the exact dot-product ranking") {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.where($"vec_id" < 4)
    val pq = Similarity.pqTopK(e, q, k = 10)
      .select("query_id", "nbr_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // exact top-10 by RAW dot product (what ADC approximates)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val p = e.select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val exact = p.as("c").crossJoin(q.select($"vec_id".as("query_id"),
        $"embedding".cast("array<double>").as("qv")))
      .where($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("nbr_id"),
        Similarity.dot($"v", $"qv").as("d"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy($"d".desc, $"nbr_id")))
      .where($"rnk" <= 10)
      .select("query_id", "nbr_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // quantization loses precision but must preserve most of the top set
    val recalls = exact.keys.toSeq.map { qid =>
      (pq(qid) intersect exact(qid)).size.toDouble / exact(qid).size
    }
    // synthetic near-random embeddings are PQ's hardest case; the bar is
    // far-above-chance (chance recall@10 = 10/corpus ≈ 0.02), not parity
    assert(recalls.forall(_ >= 0.2), s"per-query recall@10 too low: $recalls")
    assert(recalls.sum / recalls.size >= 0.35,
      s"mean recall@10 too low: ${recalls.sum / recalls.size}")
  }

  test("IVF-PQ with full probing equals plain PQ-ADC") {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.where($"vec_id" < 4)
    val full = Similarity.ivfPqTopK(e, q, nList = 8, nProbe = 8, k = 5)
      .select("query_id", "nbr_id", "adc", "rnk")
      .as[(Long, Long, Double, Int)].collect().toSet
    val pq = Similarity.pqTopK(e, q, k = 5)
      .select("query_id", "nbr_id", "adc", "rnk")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(full === pq)
    // partial probing returns a subset of cells' candidates, still k rows
    val partial = Similarity.ivfPqTopK(e, q, nList = 8, nProbe = 2, k = 5)
    assert(partial.groupBy("query_id").count()
      .where($"count" =!= 5).count() === 0)
  }

  test("clusterPurity: counts partition the corpus, purity = top_n/n_vecs") {
    val e = Tables.embeddings(spark, sfDir)
    val out = Similarity.clusterPurity(e)
      .as[(Long, Long, Int, Long, Double)].collect()
    assert(out.map(_._2).sum === e.count(), "clusters partition the corpus")
    out.foreach { case (cid, n, _, topN, purity) =>
      assert(topN <= n, s"cid=$cid top_n exceeds cluster size")
      assert(math.abs(purity - math.round(topN.toDouble / n * 10000) / 10000.0) < 1e-9,
        s"cid=$cid purity mismatch")
      assert(purity > 0.0 && purity <= 1.0)
    }
  }

  test("labelNoiseAudit flags the vector nearer another label's centroid") {
    // label 0 sits near (1,0); label 1 near (0,1) except vec 5, which is
    // planted at (0.95,0.05) — centroid-nearest to label 0, so suspect
    val e = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.9f, 0.1f), 0),
      (3L, Array(0.0f, 1.0f), 1),
      (4L, Array(0.1f, 0.9f), 1),
      (5L, Array(0.95f, 0.05f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.labelNoiseAudit(e)
      .as[(Int, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(0) === ((0, 2L, 0L, 0.0)))
    assert(got(1) === ((1, 3L, 1L, 0.3333)))
  }

  test("standardizeEmbeddings: per-dim moments ~ (0, 1) after the transform") {
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sfDir)
    val z = Similarity.standardizeEmbeddings(e)
    assert(z.count() === e.count())
    // re-derive moments of the standardized corpus: mean ≈ 0, std ≈ 1
    // (up to the 4dp output rounding)
    val moments = z.select(posexplode($"z").as(Seq("i", "x")))
      .groupBy("i").agg(avg($"x").as("mu"), stddev_pop($"x").as("sg"))
      .as[(Int, Double, Double)].collect()
    assert(moments.length === 64)
    moments.foreach { case (i, mu, sg) =>
      assert(math.abs(mu) < 1e-3, s"dim $i mean $mu not ~0")
      assert(math.abs(sg - 1.0) < 1e-3, s"dim $i std $sg not ~1")
    }
    // deterministic: pure function of the data
    val again = Similarity.standardizeEmbeddings(e)
    assert(z.exceptAll(again).isEmpty && again.exceptAll(z).isEmpty)
  }

  test("robustScaleEmbeddings: median-centered, outlier-resistant, zero-MAD safe") {
    import org.apache.spark.sql.functions._
    // dim 0: {1..5} + one huge outlier; dim 1: constant (MAD 0)
    val vecs = (Seq(1.0, 2.0, 3.0, 4.0, 5.0) :+ 1e6).zipWithIndex
      .map { case (x, id) => (id.toLong, Array(x.toFloat, 7.0f)) }
      .toDF("vec_id", "embedding")
    val z = Similarity.robustScaleEmbeddings(vecs)
      .select($"vec_id", element_at($"z", 1).as("z0"), element_at($"z", 2).as("z1"))
      .as[(Long, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // med = 3.5, mad = 1.5: the inliers land within ~2 MADs...
    Seq(0L, 1L, 2L, 3L, 4L).foreach { id =>
      assert(math.abs(z(id)._1) <= 2.0, s"inlier $id got ${z(id)._1}")
    }
    // ...while the outlier is FAR out — the scale did not stretch to it
    // (mean/sigma scaling would have pulled every inlier to ~-0.4)
    assert(z(5L)._1 > 1000.0)
    // zero-MAD dim maps to 0 for every row
    assert(z.values.forall(_._2 === 0.0))
    // digest agrees with the raw op (same rows, integer basis points)
    val dig = Similarity.robustScaleDigest(vecs)
    assert(dig.count() === 6L)
    assert(dig.where($"n_dims" =!= 2).isEmpty)
  }

  test("topPrincipalComponent: finds the dominant variance direction, unit norm") {
    import org.apache.spark.sql.functions._
    // 64-dim corpus whose variance lives overwhelmingly on dim 3
    val vecs = (0 until 40).map { id =>
      val arr = Array.fill(64)(0.01f * (id % 3))
      arr(3) = if (id % 2 == 0) 5.0f else -5.0f
      (id.toLong, arr)
    }.toDF("vec_id", "embedding")
    val pc = Similarity.topPrincipalComponent(vecs)
      .as[(Int, Long)].collect().sortBy(_._1).map(_._2)
    assert(pc.length === 64)
    // dominant direction: dim 3 carries (almost) the whole unit vector
    assert(math.abs(pc(3)) > 990000L, s"pc(3) = ${pc(3)}")
    // unit norm in micro-units (within rounding of 64 components)
    val norm2 = pc.map(x => x.toDouble * x).sum
    assert(math.abs(math.sqrt(norm2) - 1e6) < 100.0, s"norm = ${math.sqrt(norm2)}")
    // deterministic: pure function of the data
    val again = Similarity.topPrincipalComponent(vecs)
      .as[(Int, Long)].collect().sortBy(_._1).map(_._2)
    assert(pc.toSeq === again.toSeq)

    // ABTT residuals: removing the top PC kills the dominant dimension —
    // every vector's residual range collapses to the small off-dims
    val res = Similarity.abttDigest(vecs)
      .as[(Long, Int, Long, Long, Long)].collect()
    assert(res.length === 40)
    res.foreach { case (id, nd, _, mn, mx) =>
      assert(nd === 64)
      // pre-ABTT the centered dim-3 value is ±5 (±50000 bp); post-ABTT
      // everything is within the 0.02-scale noise of the other dims
      assert(mx < 1000L && mn > -1000L, s"vec $id residual [$mn,$mx]")
    }

    // and the top PC explains (essentially) all the variance here
    val share = Similarity.pcVarianceShare(vecs)
      .as[(Long, Double)].collect().head
    assert(share._1 === 40L)
    assert(share._2 > 0.99, s"var_share = ${share._2}")
  }

  test("silhouetteSimplified: separated blobs score high, one blob scores low") {
    import org.apache.spark.sql.functions._
    // two tight, far-apart blobs in 64-dim; EVEN ids = blob A, ODD ids =
    // blob B so the deterministic vec_id % 2 seed starts one centroid
    // inside each blob
    def blob(ids: Seq[Int], dim: Int, base: Float) = ids.map { id =>
      val a = Array.fill(64)(0.0f)
      a(dim) = base + 0.001f * (id % 5)
      (id.toLong, a)
    }
    val two = (blob(0 until 40 by 2, 0, 10f) ++ blob(1 until 41 by 2, 7, -10f))
      .toDF("vec_id", "embedding")
    val s2 = Similarity.silhouetteSimplified(two, kClusters = 2)
      .as[(Long, Long, Double)].collect()
    assert(s2.map(_._2).sum === 40L)
    s2.foreach { case (cid, _, ms) =>
      assert(ms > 0.9, s"cluster $cid silhouette $ms not tight/separated")
    }
    // a single undifferentiated blob split into 2 clusters: separation is
    // arbitrary, silhouette collapses toward 0
    val one = blob(0 until 40, 0, 10f).toSeq.toDF("vec_id", "embedding")
    val s1 = Similarity.silhouetteSimplified(one, kClusters = 2)
      .as[(Long, Long, Double)].collect()
    assert(s1.map(_._3).max < 0.7,
      s"arbitrary split scored ${s1.mkString(",")}")
  }

  test("projectEmbeddings: exact signed micro-unit sums from the md5-parity matrix") {
    val e = Seq(
      (0L, Seq(0.5f, -0.25f, 1f)),
      (1L, Seq(0f, 0f, 0f))).toDF("vec_id", "embedding")
    val got = Similarity.projectEmbeddings(e, k = 4)
      .as[(Long, Int, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got.size === 8) // 2 vectors x 4 output dims
    // independent replay of the sign recipe: parity of the first 15 hex
    // chars of md5("p:j:d") — the exact scheme the DuckDB oracle uses
    def sign(j: Int, d: Int): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"p:$j:$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1L else -1L
    }
    val xi = Seq(math.round(0.5f.toDouble * 1e6), math.round(-0.25f.toDouble * 1e6),
      math.round(1f.toDouble * 1e6))
    for (j <- 0 until 4) {
      val want = (0 until 3).map(d => xi(d) * sign(j, d)).sum
      assert(got((0L, j)) === want, s"j=$j")
      assert(got((1L, j)) === 0L, s"zero vector must project to 0 (j=$j)")
    }
  }

  test("projectEmbeddingsWide: array form agrees with the long form; row-local plan") {
    val e = Seq(
      (7L, Seq(1f, 2f, 3f, 4f)),
      (8L, Seq(-1f, 0.5f, 0f, 2f))).toDF("vec_id", "embedding")
    val wide = Similarity.projectEmbeddingsWide(e, k = 3)
      .as[(Long, Seq[Long])].collect().toMap
    assert(wide.values.forall(_.length === 3))
    val long = Similarity.projectEmbeddings(e, k = 3)
      .as[(Long, Int, Long)].collect()
    long.foreach { case (id, j, y) => assert(wide(id)(j) === y) }
    // shuffle-free: no Exchange anywhere in the physical plan
    val plan = Similarity.projectEmbeddingsWide(e, k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must be row-local:\n$plan")
  }
}
