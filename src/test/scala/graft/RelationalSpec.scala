package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("q1Pricing groups cover the filtered lineitem exactly") {
    val q1 = Relational.q1Pricing(spark, sfDir)
    val total = q1.agg(sum("count_order")).head().getLong(0)
    val expect = Tables.lineitem(spark, sfDir)
      .where($"l_shipdate" <= lit("2000-12-01").cast("timestamp")).count()
    assert(total === expect)
  }

  test("q3TopK returns 10 ranked orders with descending revenue") {
    val rows = Relational.q3TopK(spark, sfDir)
      .select("rnk", "revenue").as[(Int, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === (1 to 10))
    assert(rows.map(_._2).toSeq === rows.map(_._2).sorted(Ordering[Double].reverse).toSeq)
  }

  test("joinAnti = customers minus customers-with-orders") {
    val anti = Relational.joinAnti(spark, sfDir).count()
    val custs = Tables.customer(spark, sfDir).count()
    val withOrders = Tables.orders(spark, sfDir).select("o_custkey").distinct().count()
    assert(anti === custs - withOrders)
  }

  test("joinSemi counts equal a manual IN-filter") {
    val semi = Relational.joinSemi(spark, sfDir).agg(sum("n")).head().getLong(0)
    val keys = Tables.customer(spark, sfDir)
      .where($"c_mktsegment" === "MACHINERY").select("c_custkey")
    val expect = Tables.orders(spark, sfDir)
      .join(keys, $"o_custkey" === $"c_custkey").count()
    assert(semi === expect)
  }

  test("windowTopNPerCustomer emits at most 3 rows per customer, ranked") {
    val perCust = Relational.windowTopNPerCustomer(spark, sfDir)
      .groupBy("o_custkey").agg(count(lit(1)).as("n"), max("rn").as("maxrn"))
    assert(perCust.where($"n" > 3 || $"maxrn" > 3).count() === 0)
  }

  test("setOps partitions the rich customers") {
    val rich = Tables.customer(spark, sfDir).where($"c_acctbal" > 5000)
      .select("c_custkey").distinct().count()
    val tagged = Relational.setOps(spark, sfDir)
      .groupBy("tag").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(tagged.getOrElse("active_rich", 0L) + tagged.getOrElse("inactive_rich", 0L) === rich)
  }

  test("topKGlobal matches orderBy-limit semantics") {
    val got = Relational.topKGlobal(spark, sfDir)
      .select("l_extendedprice").as[Double].collect().toSeq
    val expect = Tables.lineitem(spark, sfDir)
      .select("l_extendedprice").as[Double].collect().sorted(Ordering[Double].reverse).take(20).toSeq
    assert(got.sorted === expect.sorted)
  }

  // Plan-shape regression tests: the scale properties (pushdown, pruning,
  // broadcast) the README promises must survive refactors.
  test("q1 plan: shipdate filter and column pruning reach the parquet scan") {
    val plan = Relational.q1Pricing(spark, sfDir).queryExecution.sparkPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter not pushed:\n$plan")
    assert(!plan.contains("l_orderkey"), "unused columns should be pruned from the scan")
  }

  test("q5 plan: all dimension joins broadcast, fact table never shuffled pre-agg") {
    val plan = Relational.q5Region(spark, sfDir).queryExecution.sparkPlan.toString
    assert(!plan.contains("SortMergeJoin"), s"expected broadcast-only joins:\n$plan")
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("topKGlobal plan: sort+limit, no global window exchange") {
    val plan = Relational.topKGlobal(spark, sfDir).queryExecution.sparkPlan.toString
    assert(plan.contains("TakeOrderedAndProject") || plan.contains("GlobalLimit"),
      s"expected distributed top-k:\n$plan")
  }

  test("quantiles: p25 <= p50 <= p75, groups cover table") {
    val q = Relational.quantiles(spark, sfDir)
    assert(q.where($"p25" > $"p50" || $"p50" > $"p75").count() === 0)
    assert(q.agg(sum("n")).head().getLong(0) === Tables.lineitem(spark, sfDir).count())
  }

  test("quantiles over the coordinator cap falls back to the sketch path") {
    // cap of 1 is always exceeded (3 groups x 4 partitions) → the exact
    // op must delegate to quantilesApprox instead of collecting
    val guarded = Relational.quantiles(spark, sfDir, maxCoordRows = 1)
    val approx = Relational.quantilesApprox(spark, sfDir)
    assert(guarded.columns.toSeq === approx.columns.toSeq)
    assert(guarded.exceptAll(approx).isEmpty && approx.exceptAll(guarded).isEmpty)
    // custom probabilities survive the fallback (names AND values)
    val custom = Seq("p10" -> 0.1, "p90" -> 0.9, "p99" -> 0.99)
    val g2 = Relational.quantiles(spark, sfDir, probs = custom, maxCoordRows = 1)
    assert(g2.columns.toSeq === Seq("l_returnflag", "p10", "p90", "p99", "n"))
    val row = g2.where($"l_returnflag" === "N").head()
    assert(row.getDouble(1) < row.getDouble(2) && row.getDouble(2) < row.getDouble(3))
  }

  test("quantilesApprox: same schema as exact, values within sketch tolerance") {
    val exact = Relational.quantiles(spark, sfDir)
      .as[(String, Double, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    val approx = Relational.quantilesApprox(spark, sfDir)
    assert(approx.columns.toSeq === Relational.quantiles(spark, sfDir).columns.toSeq)
    approx.as[(String, Double, Double, Double, Long)].collect().foreach {
      case (g, p25, p50, p75, n) =>
        val (_, e25, e50, e75, en) = exact(g)
        assert(n === en)
        // accuracy=10000 ⇒ rank error < 1 at this SF: the sketch returns a
        // real element where the exact op interpolates, so allow a small
        // relative gap
        Seq((p25, e25), (p50, e50), (p75, e75)).foreach { case (a, e) =>
          assert(math.abs(a - e) / e <= 0.05, s"group $g: approx $a vs exact $e")
        }
    }
  }

  test("quantilesSketch: within sampling tolerance of exact, invariant to sharding") {
    val exact = Relational.quantiles(spark, sfDir)
      .as[(String, Double, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    val sk = Relational.quantilesSketch(spark, sfDir)
      .as[(String, Double, Double, Double, Int, Long)].collect()
    assert(sk.map(_._1).toSet === exact.keySet)
    sk.foreach { case (g, p25, p50, p75, nSample, n) =>
      val (_, e25, e50, e75, en) = exact(g)
      assert(n === en)
      assert(nSample === math.min(1024L, en).toInt)
      // bottom-k-by-hash sample of k=1024 → rank error O(1/√k) ≈ 3%;
      // translate to value space generously (price dist is near-uniform)
      Seq((p25, e25), (p50, e50), (p75, e75)).foreach { case (a, e) =>
        assert(math.abs(a - e) / e <= 0.15, s"group $g: sketch $a vs exact $e")
      }
      assert(p25 <= p50 && p50 <= p75)
    }
    // the sample is a pure function of row identity: re-sharding the
    // input must not move a single estimate (the merge property)
    val a = Relational.quantilesSketchOf(Tables.lineitem(spark, sfDir))
    val b = Relational.quantilesSketchOf(
      Tables.lineitem(spark, sfDir).repartition(7))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("madOutliers: robust stats bound the outlier count, groups cover table") {
    val m = Relational.madOutliers(spark, sfDir)
      .as[(String, Double, Double, Long, Long)].collect()
    assert(m.map(_._1).toSet === Set("A", "N", "R"))
    m.foreach { case (g, med, mad, nOut, n) =>
      assert(med > 0 && mad >= 0, s"group $g")
      // by Chebyshev-like robustness, a 3σ-equivalent screen can never
      // flag a majority; and the count is within [0, n]
      assert(nOut >= 0 && nOut < n / 2, s"group $g flagged $nOut of $n")
    }
    assert(m.map(_._5).sum === Tables.lineitem(spark, sfDir).count())
  }

  test("winsorizedMeans: clipped mean sits inside the clip bounds") {
    val w = Relational.winsorizedMeans(spark, sfDir)
      .as[(String, Double, Double, Double, Double, Long, Long, Long)].collect()
    assert(w.map(_._1).toSet === Set("A", "N", "R"))
    w.foreach { case (g, bLo, bHi, _, meanW, clipLo, clipHi, n) =>
      assert(bLo < bHi, g)
      assert(meanW >= bLo && meanW <= bHi, s"$g: $meanW outside [$bLo, $bHi]")
      // ~5% clipped each side at these percentiles
      assert(clipLo + clipHi < n / 5, s"$g clipped ${clipLo + clipHi} of $n")
    }
  }

  test("madOutliers/winsorizedMeans past the group cap fall to the sketch percentile") {
    // cap of 1 always trips → approx_percentile path; same schema, sane
    // values (sketch accuracy 10000 ⇒ near-exact at this SF)
    val exactM = Relational.madOutliers(spark, sfDir)
      .as[(String, Double, Double, Long, Long)].collect().map(r => r._1 -> r).toMap
    Relational.madOutliers(spark, sfDir, maxExactGroupRows = 1L)
      .as[(String, Double, Double, Long, Long)].collect().foreach {
        case (g, med, mad, _, n) =>
          val (_, eMed, eMad, _, eN) = exactM(g)
          assert(n === eN)
          assert(math.abs(med - eMed) / eMed < 0.02, s"$g med $med vs $eMed")
          assert(math.abs(mad - eMad) / eMad < 0.05, s"$g mad $mad vs $eMad")
      }
    val exactW = Relational.winsorizedMeans(spark, sfDir)
      .as[(String, Double, Double, Double, Double, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    Relational.winsorizedMeans(spark, sfDir, maxExactGroupRows = 1L)
      .as[(String, Double, Double, Double, Double, Long, Long, Long)].collect()
      .foreach { case (g, bLo, bHi, _, meanW, _, _, n) =>
        val e = exactW(g)
        assert(n === e._8)
        assert(bLo < bHi && meanW >= bLo && meanW <= bHi, g)
        assert(math.abs(meanW - e._5) / e._5 < 0.02, s"$g meanW $meanW vs ${e._5}")
      }
  }

  test("cubeAgg contains all four grouping-set shapes") {
    val c = Relational.cubeAgg(spark, sfDir)
    assert(c.where($"l_returnflag".isNull && $"l_linestatus".isNull).count() === 1)
    assert(c.where($"l_returnflag".isNull && $"l_linestatus".isNotNull).count() > 0)
    assert(c.where($"l_returnflag".isNotNull && $"l_linestatus".isNull).count() > 0)
  }

  test("havingAgg filters on the aggregate") {
    assert(Relational.havingAgg(spark, sfDir).where($"n" <= 20).count() === 0)
  }

  test("rollupAgg total row equals table count") {
    val total = Relational.rollupAgg(spark, sfDir)
      .where($"l_returnflag".isNull && $"l_linestatus".isNull)
      .select("n").as[Long].head()
    assert(total === Tables.lineitem(spark, sfDir).count())
  }

  test("globalIndex equals the single-partition window row_number") {
    val got = Relational.globalIndex(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSet
    val exact = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_linenumber",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy("l_orderkey", "l_linenumber")).cast("long").as("idx"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === exact)
  }

  test("globalIndex is a dense 1..n sequence") {
    val n = Tables.lineitem(spark, sfDir).count()
    val idx = Relational.globalIndex(spark, sfDir)
    assert(idx.agg(min("idx"), max("idx"), countDistinct("idx"))
      .as[(Long, Long, Long)].head() === ((1L, n, n)))
  }
}
