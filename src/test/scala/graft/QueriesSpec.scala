package graft

/** Wiring gate for the driver contract: every declared query must run on
  * the smoke fixture, and every oracle key must reference a real query —
  * catches registration regressions before the driver's round gate does.
  */
class QueriesSpec extends SparkSpec {

  test("every oracleSql key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  /** Queries whose correct result can be empty at the tiny smoke SF
    * (e.g. no customer without orders at sf0.001; the k=91 core
    * percolates to empty below sf0.01 — the sf0.001 cooc degree band
    * tops out at 138 and the 4-round peel cascades to nothing, so zero
    * backbone candidates is the CORRECT answer there) — still must run.
    */
  private val mayBeEmpty =
    Set("join_anti", "minhash_pairs", "ngram_jaccard", "dedup_resolve", "dedup_families",
      "dedup_survivors", "cross_dup_matrix", "cos_near_pairs",
      "q7_volume", "q18_big_orders", "q21_waiting", "q22_idle_rich", "lev_pairs",
      "winnow_pairs", "lsh_near_pairs", "simhash_pairs", "emb_dedup_resolve",
      "link_pred_core")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query '$name' runs on sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }
}
