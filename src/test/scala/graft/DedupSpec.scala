package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup groups identical texts, keeps min id") {
    val docs = Seq((5L, "same text"), (2L, "same text"), (9L, "other")).toDF("doc_id", "text")
    val got = Dedup.exact(docs).select("keep_id", "n_dups").as[(Long, Long)].collect().toSet
    assert(got === Set((2L, 2L), (9L, 1L)))
  }

  test("shingles produce k-grams of consecutive tokens") {
    val sh = Dedup.shingles(Seq((1L, "a b c d")).toDF("doc_id", "text"), k = 3)
      .select("shingles").as[Seq[String]].head()
    assert(sh.toSet === Set("a b c", "b c d"))
  }

  test("minhashPairs finds planted near-duplicates and skips unrelated docs") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 40) "changed" else s"tok$i").mkString(" ")
    val unrelated = (1 to 40).map(i => s"other$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, unrelated)).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(docs, threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("resolveClusters: chained pairs collapse to one survivor per component") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((2L, 3L), (3L, 5L)).toDF("a", "b") // component {2,3,5}; 1,4 singletons
    val got = Dedup.resolveClusters(docs, pairs)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(2L) === ((2L, true)))
    assert(got(3L) === ((2L, false)))
    assert(got(5L) === ((2L, false)))
    assert(got(1L) === ((1L, true)))
    assert(got(4L) === ((4L, true)))
  }

  test("winnowing: identical docs share all fingerprints; substring overlap detected") {
    val a = (1 to 30).map(i => s"w$i").mkString(" ")
    val b = "x0 " + (1 to 30).map(i => s"w$i").mkString(" ") + " x1" // shifted copy
    val c = (1 to 30).map(i => s"z$i").mkString(" ")
    val docs = Seq((1L, a), (2L, a), (3L, b), (4L, c)).toDF("doc_id", "text")
    val fp = Dedup.winnowFingerprints(docs)
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(fp(1L) === fp(2L)) // identical text → identical fingerprint set
    assert((fp(1L) & fp(3L)).nonEmpty) // long shared substring → shared fingerprints
    assert((fp(1L) & fp(4L)).isEmpty) // disjoint text → disjoint fingerprints
  }

  test("ngramJaccardPairs: exact near-dups found within the same source only") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 40) "changed" else s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base, "s1"), (2L, nearDup, "s1"),
      (3L, base, "s2") // identical text, different source → blocked out
    ).toDF("doc_id", "text", "source")
    val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.8)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("minhashSignatures: identical docs share all 32 mins, disjoint docs none") {
    val a = (1 to 30).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, a), (2L, a),
      (3L, (1 to 30).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(sigs(1L) === sigs(2L)) // same shingle set → same signature
    // disjoint shingle sets: sharing a min is a ~1/2^31 fluke per lane
    assert(sigs(1L).zip(sigs(3L)).count { case (x, y) => x == y } === 0)
  }

  test("ngramJaccardPairs above the block guard delegates to LSH within sources") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base, "s1"), (2L, base, "s1"),                       // dup inside s1
      (3L, base, "s2"),                                          // same text, other source
      (4L, (1 to 40).map(i => s"z$i").mkString(" "), "s1"))      // unrelated
      .toDF("doc_id", "text", "source")
    // guard of 1 always trips → banded-LSH path, still same-source only
    val guarded = Dedup.ngramJaccardPairs(docs, threshold = 0.9, maxBlockPairs = 1L)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(guarded.contains((1L, 2L)), "identical same-source pair must survive delegation")
    assert(!guarded.exists { case (a, b) =>
      Set(a, b) == Set(1L, 3L) || Set(a, b) == Set(2L, 3L) },
      "cross-source pairs stay blocked out on the delegated path")
    // on this corpus the exact path agrees exactly
    val exact = Dedup.ngramJaccardPairs(docs, threshold = 0.9)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(exact === guarded)
  }

  test("dupRateBySource: cross-source copies count against the copying source") {
    val docs = Seq(
      (1L, "alpha", "s1"), (2L, "alpha", "s1"),  // within-source dup
      (3L, "alpha", "s2"),                        // cross-source copy of 1
      (4L, "beta", "s2")).toDF("doc_id", "text", "source")
    val got = Dedup.dupRateBySource(docs)
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("s1") === (("s1", 2L, 1L, 0.5)))
    assert(got("s2") === (("s2", 2L, 1L, 0.5)))
  }

  test("containmentPairs sees engulfment that Jaccard misses; guard path agrees") {
    // doc 2 is the first 12 tokens of doc 1 → containment 1.0 but
    // jaccard ≈ 10/38 ≈ 0.26; doc 3 unrelated
    val long = (1 to 40).map(i => s"tok$i").mkString(" ")
    val short = (1 to 12).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, long, "s1"), (2L, short, "s1"),
      (3L, (1 to 40).map(i => s"z$i").mkString(" "), "s1"))
      .toDF("doc_id", "text", "source")
    val got = Dedup.containmentPairs(docs, threshold = 0.9)
      .as[(Long, Long, Int, Int, Double)].collect()
    assert(got.map(r => (r._1, r._2)).toSet === Set((1L, 2L)))
    assert(got.head._5 === 1.0)
    // jaccard at the same bar finds nothing — the asymmetric signal
    assert(Dedup.ngramJaccardPairs(docs, threshold = 0.9).count() === 0)
    // Σblock² guard → winnow-candidate path; a fully-contained span
    // shares fingerprints with its container, so the pair survives
    val guarded = Dedup.containmentPairs(docs, threshold = 0.9, maxBlockPairs = 1L)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(guarded === Set((1L, 2L)))
  }

  test("resolveClusters: concurrent resolves don't unpersist each other's state") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // an unrelated cached dataset persisted by "another job" mid-session:
    // the fix releases superseded checkpoints via their own handles, so
    // this must survive both resolves untouched
    val bystander = spark.range(100).toDF("x").persist()
    bystander.count()
    // snapshot of the persistent-RDD registry BEFORE the resolves: every
    // block in it (the bystander's cached RDD included) must still be
    // registered afterwards. `Dataset.storageLevel` would not catch a
    // regression — it reports the CacheManager's configured level even if
    // the blocks were unpersisted out from under the cache.
    val preRegistered = spark.sparkContext.getPersistentRDDs.keySet
    assert(preRegistered.nonEmpty)
    val docs = (1L to 50L).toDF("doc_id")
    def resolve(shift: Long) = Future {
      val pairs = (1L to 20L).map(i => (i + shift, i + shift + 10L)).toDF("a", "b")
      Dedup.resolveClusters(docs, pairs)
        .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r._2).toMap
    }
    val (r1, r2) = (resolve(0L), resolve(5L))
    val (m1, m2) = (Await.result(r1, 120.seconds), Await.result(r2, 120.seconds))
    // chained pairs (i, i+10): component {1..30} has min-label 1, etc.
    assert(m1(21L) === 1L && m1(15L) === 5L)
    assert(m2(26L) === 6L && m2(20L) === 10L)
    val postRegistered = spark.sparkContext.getPersistentRDDs.keySet
    assert(preRegistered.subsetOf(postRegistered),
      s"concurrent resolve unpersisted bystander RDDs: ${preRegistered -- postRegistered}")
    bystander.unpersist()
  }

  test("simhashPairs: banded candidates recover ALL low-hamming pairs (pigeonhole)") {
    val docs = Seq(
      (1L, "q w e r t y u i o p"),
      (2L, "q w e r t y u i o p"), // identical → hamming 0
      (3L, "q w e r t y u i o x"), // near
      (4L, "totally different words entirely another set")
    ).toDF("doc_id", "text")
    val got = Dedup.simhashPairs(docs, maxHamming = 5, bands = 6)
      .select("a", "b", "hamming").as[(Long, Long, Int)].collect().toSet
    // brute-force reference: bands=6 > maxHamming=5 guarantees exact recall
    val sh = Dedup.simhash(docs).as[(Long, Long)].collect().toMap
    val exp = (for {
      a <- sh.keys; b <- sh.keys if a < b
      h = java.lang.Long.bitCount(sh(a) ^ sh(b)) if h <= 5
    } yield (a, b, h)).toSet
    assert(got === exp)
    assert(got.contains((1L, 2L, 0)))
  }

  test("simhashPairs plans as an equi band join — never a cross product") {
    val plan = Dedup.simhashPairs(Tables.documents(spark, sfDir))
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in band-join plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"nested-loop join in band-join plan:\n$plan")
  }

  test("simhash: identical docs hash identically; hamming distance 0") {
    val docs = Seq((1L, "q w e r t y"), (2L, "q w e r t y"), (3L, "totally different words here"))
      .toDF("doc_id", "text")
    val sh = Dedup.simhash(docs).as[(Long, Long)].collect().toMap
    assert(sh(1L) === sh(2L))
    assert(sh(1L) !== sh(3L))
    val dist = spark.range(1).select(
      Dedup.hammingDist(lit(sh(1L)), lit(sh(2L))).as("d")).head().getAs[Int]("d")
    assert(dist === 0)
  }

  test("leakageSplit: near-dup clusters never straddle a split boundary") {
    val docs = Tables.documents(spark, sfDir)
    val out = Dedup.leakageSplit(docs, Dedup.ngramJaccardPairs(docs)).cache()
    assert(out.count() === docs.count(), "every document gets a split")
    // one split per cluster — the defining property
    val perCluster = out.groupBy("cluster")
      .agg(countDistinct("split").as("n_splits"))
      .where(col("n_splits") > 1)
    assert(perCluster.count() === 0, "a cluster crossed a split boundary")
    // singletons (cluster == own id) match the plain hash split exactly —
    // leakage awareness refines splitAssign, never re-randomizes it
    val singles = out.where(col("doc_id") === col("cluster"))
      .join(graft.operators.TextOps.splitAssign(docs).withColumnRenamed("split", "plain"),
        "doc_id")
    assert(singles.where(col("split") =!= col("plain")).count() === 0)
    out.unpersist()
  }

  test("survivorsByQuality: longest member survives, ties break to min id") {
    val docs = Seq(
      (1L, "a", 10L), (2L, "a", 30L), (3L, "a", 30L), // family {1,2,3}: 2 and 3 tie on length
      (4L, "b", 99L), // singleton — must not appear
      (5L, "c", 7L), (6L, "c", 50L)) // family {5,6}: 6 longest
      .toDF("doc_id", "text", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val got = Dedup.survivorsByQuality(docs, pairs)
      .select("doc_id", "cluster", "survivor_id", "keep")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(got === Set(
      (1L, 1L, 2L, false), (2L, 1L, 2L, true), (3L, 1L, 2L, false),
      (5L, 5L, 6L, false), (6L, 5L, 6L, true)))
  }

  test("survivorsByScore: highest classifier score survives; unscored " +
    "docs lose to any scored member") {
    val docs = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), // family {1,2,3}
      (5L, "c"), (6L, "c")) // family {5,6}: 6 has no score row
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val scores = Seq(
      (1L, -500000L), (2L, 1200000L), (3L, 1200000L), // 2/3 tie -> min id
      (5L, -9000000L)) // 6 missing -> Long.MinValue, 5 survives
      .toDF("doc_id", "score")
    val got = Dedup.survivorsByScore(docs, pairs, scores)
      .select("doc_id", "cluster", "survivor_id", "keep")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(got === Set(
      (1L, 1L, 2L, false), (2L, 1L, 2L, true), (3L, 1L, 2L, false),
      (5L, 5L, 5L, true), (6L, 5L, 5L, false)))
  }

  test("survivorsByScore: duplicate doc_id rows in scores collapse to " +
    "max instead of fanning out labeled rows") {
    val docs = Seq((1L, "a"), (2L, "a")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("a", "b")
    // doc 2 scored twice (a retried scoring job, a unioned score table):
    // the max row must win and the family must NOT report n_docs > 2
    val scores = Seq((1L, 10L), (2L, 5L), (2L, 99L)).toDF("doc_id", "score")
    val got = Dedup.survivorsByScore(docs, pairs, scores)
      .select("doc_id", "survivor_id", "keep")
      .as[(Long, Long, Boolean)].collect().toSeq.sorted
    assert(got === Seq((1L, 2L, false), (2L, 2L, true)),
      s"duplicate score rows must not duplicate output rows: $got")
  }

  test("crossSourceDupMatrix: pairs roll up to ordered source cells") {
    val docs = Seq(
      (1L, "s1"), (2L, "s2"), (3L, "s1"), (4L, "s1"))
      .toDF("doc_id", "source")
    val pairs = Seq(
      (1L, 2L, 0.9), (2L, 3L, 0.7), // two cross s1↔s2 pairs
      (3L, 4L, 0.6)) // one intra-s1 pair
      .toDF("a", "b", "jaccard")
    val got = Dedup.crossSourceDupMatrix(docs, pairs)
      .as[(String, String, Long, Double, Double)].collect().toSet
    assert(got === Set(
      ("s1", "s2", 2L, 0.9, 0.8),
      ("s1", "s1", 1L, 0.6, 0.6)))
  }
}
