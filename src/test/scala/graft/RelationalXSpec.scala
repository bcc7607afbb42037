package graft

import graft.operators.{EventOps, RelationalX, TextOps}
import org.apache.spark.sql.functions._

/** Semantic checks for the second operator batch — each against a
  * brute-force reformulation on the smoke fixture (the DuckDB oracle
  * covers the full outputs; these pin the semantics that the oracle can't
  * see, like determinism across partitionings).
  */
class RelationalXSpec extends SparkSpec {
  import spark.implicits._

  test("asof join attaches the latest prior-or-equal click per purchase") {
    val out = EventOps.asofClickBeforePurchase(spark, sfDir).cache()
    // brute force: max click ts <= purchase ts per user
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.where($"event_type" === "click")
      .select($"user_id".as("cu"), unix_micros($"ts").as("c_us"))
    val brute = ev.where($"event_type" === "purchase")
      .select($"event_id", $"user_id", unix_micros($"ts").as("p_us"))
      .join(clicks, $"user_id" === $"cu" && $"c_us" <= $"p_us", "left")
      .groupBy("event_id").agg(max("c_us").as("want_us"))
    val joined = out.join(brute, "event_id")
    assert(joined.where(coalesce($"asof_click_us", lit(-1L)) =!=
      coalesce($"want_us", lit(-1L))).count() === 0)
    assert(out.where($"asof_click_us" > $"p_us").count() === 0)
  }

  test("range join counts follow-ups only inside the window") {
    val out = EventOps.rangeFollowups(spark, sfDir, windowMinutes = 60)
    assert(out.count() ===
      Tables.events(spark, sfDir).where($"event_type" === "signup").count())
    assert(out.where($"n_follow" < 0).count() === 0)
  }

  test("split assignment is deterministic and exhaustive") {
    val docs = Tables.documents(spark, sfDir)
    val a = TextOps.splitAssign(docs)
    val b = TextOps.splitAssign(docs.repartition(7))
    assert(a.select("split").distinct().as[String].collect().toSet
      .subsetOf(Set("train", "val", "test")))
    // same assignment regardless of partitioning
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
    // roughly 12/2/2 proportions
    val n = docs.count().toDouble
    val train = a.where($"split" === "train").count().toDouble
    assert(train / n > 0.55 && train / n < 0.95)
  }

  test("q21 waiting suppliers match the brute-force definition") {
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey".as("o"), $"l_suppkey".as("s"), $"l_returnflag".as("f"))
    val all = li.select("o", "s").distinct()
    val ret = li.where($"f" === "R").select("o", "s").distinct()
    // brute force via aggregation: per order, #distinct supps and #R supps
    val perOrder = all.groupBy("o").agg(countDistinct("s").as("n_supp"))
      .join(ret.groupBy("o").agg(countDistinct("s").as("n_r")), "o")
    val brute = ret.join(perOrder, "o")
      .where($"n_supp" > 1 && $"n_r" === 1)
      .groupBy($"s".as("s_suppkey")).agg(count(lit(1)).as("numwait"))
    val got = RelationalX.q21Waiting(spark, sfDir)
    assert(got.except(brute).count() === 0 && brute.except(got).count() === 0)
  }

  test("q2 min-cost supplier rows hold the true per-part minimum balance") {
    val out = RelationalX.q2MinCostSupp(spark, sfDir, minSize = 1).cache()
    // brute force via a window min over the same candidate set
    val w = org.apache.spark.sql.expressions.Window.partitionBy("p_partkey")
    val rel = Tables.lineitem(spark, sfDir).select("l_partkey", "l_suppkey").distinct()
    val rs = Tables.supplier(spark, sfDir)
      .join(Tables.nation(spark, sfDir), $"s_nationkey" === $"n_nationkey")
      .join(Tables.region(spark, sfDir).where($"r_name" === "AMERICA"),
        $"n_regionkey" === $"r_regionkey")
    val brute = rel
      .join(Tables.part(spark, sfDir).where($"p_type" === "PROMO"),
        $"l_partkey" === $"p_partkey")
      .join(rs, $"l_suppkey" === $"s_suppkey")
      .withColumn("mb", min("s_acctbal").over(w))
      .where($"s_acctbal" === $"mb")
      .select(round($"s_acctbal", 2).as("s_acctbal"), $"s_name", $"n_name", $"p_partkey")
    assert(out.count() > 0)
    assert(out.except(brute).count() === 0 && brute.except(out).count() === 0)
  }

  test("q11 important parts all clear the share-of-total threshold") {
    val out = RelationalX.q11ImportantParts(spark, sfDir, shareThreshold = 0.002).cache()
    val perPart = Tables.lineitem(spark, sfDir)
      .join(Tables.supplier(spark, sfDir)
        .join(Tables.nation(spark, sfDir)
          .where($"n_name".isin("NATION_1", "NATION_2", "NATION_3")),
          $"s_nationkey" === $"n_nationkey"),
        $"l_suppkey" === $"s_suppkey")
      .groupBy($"l_partkey")
      .agg(sum(round($"l_extendedprice" * 100).cast("long")).as("v"))
    val total = perPart.agg(sum("v")).as[Long].head()
    val brute = perPart.where($"v" > total * 0.002)
      .select($"l_partkey".as("p_partkey"), round($"v" / 100.0, 2).as("part_value"))
    assert(out.except(brute).count() === 0 && brute.except(out).count() === 0)
  }

  test("q20 dominant shippers each own the required share of some part") {
    // lower threshold on the smoke fixture so the result is non-empty
    val out = RelationalX.q20DominantShippers(spark, sfDir, shareThreshold = 0.1).cache()
    val w = org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")
    val brute = Tables.lineitem(spark, sfDir)
      .where($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
      .join(Tables.part(spark, sfDir).where($"p_name".contains("small")),
        $"l_partkey" === $"p_partkey")
      .groupBy("l_suppkey", "l_partkey").agg(sum("l_quantity").as("sq"))
      .withColumn("tq", sum("sq").over(w))
      .where($"sq" > $"tq" * 0.1)
      .select("l_suppkey").distinct()
      .join(Tables.supplier(spark, sfDir), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", round($"s_acctbal", 2).as("s_acctbal"))
    assert(out.count() > 0)
    assert(out.except(brute).count() === 0 && brute.except(out).count() === 0)
  }

  test("argmax join returns one row per segment with the max balance") {
    val out = RelationalX.argmaxJoin(spark, sfDir).cache()
    val segs = Tables.customer(spark, sfDir).select("c_mktsegment").distinct().count()
    assert(out.count() === segs)
    val mx = Tables.customer(spark, sfDir)
      .groupBy("c_mktsegment").agg(round(max("c_acctbal"), 2).as("want"))
    assert(out.join(mx, "c_mktsegment").where($"max_bal" =!= $"want").count() === 0)
  }

  test("moving average window never exceeds 7 rows") {
    val out = RelationalX.movingAvgDaily(spark, sfDir)
    // first row's ma7 equals its own revenue
    val first = out.orderBy("d").limit(1).select($"rev" === $"ma7").as[Boolean].head()
    assert(first)
  }

  test("pii redaction masks every digit run") {
    val out = TextOps.piiRedact(Tables.documents(spark, sfDir))
    assert(out.where($"red_text".rlike("[0-9]")).count() === 0)
  }

  test("snapshotDiff classifies added/removed/changed and counts column deltas") {
    val old = Seq(
      (1L, "a", Some(10.0)), (2L, "b", Some(20.0)),
      (3L, "c", Some(30.0)), (4L, "d", None: Option[Double]))
      .toDF("k", "s", "v")
    val neu = Seq(
      (1L, "a", Some(10.0)),  // identical → not emitted
      (2L, "B", Some(21.0)),  // changed (2 cols)
      (4L, "d", Some(40.0)),  // null → value: changed (1 col, null-safe)
      (5L, "e", Some(50.0)))  // added
      .toDF("k", "s", "v")
    val got = RelationalX.snapshotDiff(old, neu, "k")
      .as[(Long, String, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      2L -> (("changed", 2)), 3L -> (("removed", 0)),
      4L -> (("changed", 1)), 5L -> (("added", 0))))
  }

  test("histogramEqDepth: bucket populations within one row, ranges ordered") {
    val out = RelationalX.histogramEqDepth(spark, sfDir).cache()
    val rows = out.orderBy("bucket")
      .as[(Long, Long, Double, Double)].collect()
    assert(rows.map(_._1).toSeq === (0L until 10L))
    val n = Tables.lineitem(spark, sfDir).count()
    assert(rows.map(_._2).sum === n)
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1)
    // bucket value ranges are disjoint and ascending: each hi <= next lo
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._3)
    }
    // deterministic under repartitioning is covered by the range
    // partitioner barrier; re-run equality pins it
    val again = RelationalX.histogramEqDepth(spark, sfDir)
    assert(out.except(again).count() === 0 && again.except(out).count() === 0)
    out.unpersist()
  }

  test("hllDistinct: estimate tracks exact cardinality; sketch is repartition-stable") {
    val li = Tables.lineitem(spark, sfDir)
    val est = RelationalX.hllDistinct(li, "l_returnflag", "l_partkey")
      .select($"l_returnflag", $"est_distinct").as[(String, Double)].collect().toMap
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("n")).as[(String, Long)].collect().toMap
    assert(est.keySet === exact.keySet)
    // standard error for m=512 registers is ~1.04/√512 ≈ 4.6%; allow 3σ
    exact.foreach { case (k, n) =>
      assert(math.abs(est(k) - n) / n.toDouble < 0.14,
        s"group $k: est=${est(k)} exact=$n")
    }
    // register state is a pure function of the value set — input layout
    // must not matter
    val a = RelationalX.hllDistinct(li.repartition(7), "l_returnflag", "l_partkey")
    val b = RelationalX.hllDistinct(li, "l_returnflag", "l_partkey")
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
  }

  test("hllDistinct: small cardinalities take the near-exact linear-counting branch") {
    val tiny = (1 to 40).map(i => ("g", s"v$i")).toDF("grp", "value")
    val est = RelationalX.hllDistinct(tiny, "grp", "value")
      .select($"est_distinct").as[Double].head()
    // linear counting at 40/512 occupancy is accurate to a few percent
    assert(math.abs(est - 40.0) < 4.0, s"est=$est")
  }

  test("hllOverlap: sketch set algebra tracks exact vocabulary overlap") {
    val docs = Tables.documents(spark, sfDir)
    val sk = RelationalX.hllOverlap(docs)
      .as[(String, String, Double, Double, Double, Double)].collect()
    val vocabSizes = docs
      .select($"source", explode(split($"text", "\\s+")).as("word"))
      .where($"word" =!= "").distinct()
      .groupBy("source").count().as[(String, Long)].collect().toMap
    val exact = graft.operators.TextOps.sourceOverlap(docs)
      .select($"a", $"b", $"shared")
      .as[(String, String, Long)].collect()
      .map { case (a, b, sh) =>
        (a, b) -> ((sh, vocabSizes(a) + vocabSizes(b) - sh))
      }.toMap
    assert(sk.map(r => (r._1, r._2)).toSet === exact.keySet)
    sk.foreach { case (a, b, estA, estB, estU, estS) =>
      val (exShared, exUnion) = exact((a, b))
      // union inherits the single-sketch error (~4.6% at m=512, 3σ band);
      // the intersection difference compounds three estimates, so its
      // absolute error is bounded relative to the UNION size, not the
      // (possibly tiny) intersection
      assert(math.abs(estU - exUnion) / exUnion < 0.14,
        s"($a,$b): est_union=$estU exact=$exUnion")
      assert(math.abs(estS - exShared) / exUnion < 0.25,
        s"($a,$b): est_shared=$estS exact=$exShared union=$exUnion")
      assert(estU <= estA + estB + 0.01) // merge can never exceed the sum
    }
  }

  test("rollingDistinct tracks the exact trailing-window distinct count") {
    import org.apache.spark.sql.functions.{col => c, countDistinct, datediff, lit, to_date}
    val ev = Tables.events(spark, sfDir)
      .select(datediff(to_date(c("ts")),
        lit(java.sql.Date.valueOf("1970-01-01"))).as("day"), c("user_id"))
    val days = ev.select("day").distinct().as[Int].collect().sorted
    // exact trailing-7-day distinct per day (small fixture: direct join)
    val exact = days.map { d =>
      d -> ev.where(c("day").between(d - 6, d))
        .agg(countDistinct("user_id")).head().getLong(0)
    }.toMap
    val est = RelationalX.rollingDistinct(Tables.events(spark, sfDir))
      .select("day", "est_users").as[(Int, Double)].collect().toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (d, n) =>
      assert(math.abs(est(d) - n) / n.toDouble < 0.14,
        s"day $d: est=${est(d)} exact=$n")
    }
  }

  test("mergeIntervals: islands split only on true gaps; early long interval spans") {
    val iv = Seq(
      // key 1: [0,10],[5,12],[12,20] merge (overlap + touch); [25,30] apart
      (1L, 0L, 10L), (1L, 5L, 12L), (1L, 12L, 20L), (1L, 25L, 30L),
      // key 2: the long [0,100] swallows [10,20] and [30,40] — a lag-based
      // implementation (prev row's end, not running max) would wrongly
      // split before [150,160]
      (2L, 0L, 100L), (2L, 10L, 20L), (2L, 30L, 40L), (2L, 150L, 160L))
      .toDF("user_id", "start_s", "end_s")
    val got = RelationalX.mergeIntervals(iv)
      .select($"user_id", $"start_s", $"end_s", $"n_merged")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 0L, 20L, 3L), (1L, 25L, 30L, 1L),
      (2L, 0L, 100L, 3L), (2L, 150L, 160L, 1L)))
  }

  test("mergeIntervals covers every input and never overlaps within a key") {
    val ev = Tables.events(spark, sfDir)
      .select($"user_id", $"ts".cast("long").as("start_s"),
        ($"ts".cast("long") + 300L).as("end_s"))
    val merged = RelationalX.mergeIntervals(ev).cache()
    // conservation: merged interval memberships sum to the input rows
    assert(merged.agg(sum("n_merged")).as[Long].head() === ev.count())
    // within a key, islands are disjoint: sort by start, check gaps
    val overlaps = merged.as("a").join(merged.as("b"),
      col("a.user_id") === col("b.user_id") && col("a.island") < col("b.island") &&
        col("a.end_s") >= col("b.start_s") && col("b.end_s") >= col("a.start_s"))
    assert(overlaps.count() === 0)
    merged.unpersist()
  }

  test("skylineParts equals the brute-force dominance filter") {
    val out = RelationalX.skylineParts(spark, sfDir).cache()
    val pts = Tables.part(spark, sfDir)
      .select($"p_retailprice".as("price"), $"p_size".as("size"))
      .distinct()
    // brute force: a (price, size) point survives iff no other point
    // weakly dominates it with at least one strict inequality
    val dominated = pts.as("x").join(pts.as("y"),
      col("y.price") <= col("x.price") && col("y.size") >= col("x.size") &&
        (col("y.price") < col("x.price") || col("y.size") > col("x.size")))
      .select(col("x.price").as("price"), col("x.size").as("size")).distinct()
    val brute = pts.except(dominated)
    // skyline emits distinct points; compare as sets
    assert(out.distinct().except(brute).count() === 0)
    assert(brute.except(out).count() === 0)
    assert(out.count() > 0)
    out.unpersist()
  }

  test("cmsSketch/cmsEstimate: over-estimate bounded by the sketch guarantee") {
    import spark.implicits._
    import graft.operators.RelationalX
    val docs = Tables.documents(spark, sfDir)
    val exact = docs
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val n = exact.agg(sum("cnt")).head().getLong(0)
    val probes = exact.orderBy(col("cnt").desc).limit(5)
      .select("w").as[String].collect().toSeq :+ "zz_never_seen"
    val sketch = RelationalX.cmsSketch(docs, depth = 4, width = 512)
    // the sketch is a bounded summary whatever the corpus size
    assert(sketch.count() <= 4L * 512L)
    val est = RelationalX.cmsEstimate(sketch, probes.toDF("word"))
      .as[(String, Long)].collect().toMap
    val truth = exact.as[(String, Long)].collect().toMap
    probes.foreach { w =>
      val t = truth.getOrElse(w, 0L)
      assert(est(w) >= t, s"CMS must never under-estimate: $w est=${est(w)} true=$t")
      // e·N/width bound holds in expectation; 4 independent rows make the
      // deterministic fixture comfortably inside 2.72·N/512
      assert(est(w) - t <= math.ceil(2.72 * n / 512).toLong,
        s"$w over-estimate ${est(w) - t} above the eps·N bound")
    }
  }
}
