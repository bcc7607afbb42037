package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture merge: apply a batch of keyed changes to a base
  * table — the `MERGE INTO` / upsert primitive every long-lived dataset
  * needs (dataset versioning, label fixes, takedown deletes in a training
  * corpus).
  *
  * The reference's storage model is append-only text (`write_output`,
  * `/root/reference/src/mapreduce/dht/mapreduce.hh:1073-1085`): updating a
  * record means rewriting the file. This operator is the declarative
  * replacement: one window over the (small) change batch picks the latest
  * change per key, one key-partitioned outer join applies it.
  *
  * 100 TB posture: the base table never shuffles more than once (the join
  * on its primary key); the change batch is typically orders of magnitude
  * smaller and broadcasts. No driver-side state, no per-row UDFs.
  */
object Cdc {

  /** Apply `changes` to `base`: for each key, the latest change (by `ts`,
    * ties broken by `seq`) wins; op `"D"` deletes the row, op `"U"`
    * upserts (update if the key exists, insert otherwise). Rows of `base`
    * with no change pass through unchanged.
    *
    * `changes` schema: (key, op, ts, seq, <payload columns named like
    * base's>). Payload columns present in both frames are overwritten on
    * upsert; base columns absent from the change batch survive (SCD-1
    * column-wise merge via coalesce). The names `key`/`op`/`ts`/`seq` are
    * reserved for the change-batch envelope; every reference below is an
    * attribute reference into the specific input frame, so a base table
    * that also has columns with those names still merges correctly.
    */
  def mergeUpsert(base: DataFrame, changes: DataFrame, key: String): DataFrame = {
    // a malformed null-key change would form its own window partition,
    // miss every base row in the full_outer join, and inject an all-null
    // phantom row into the merged table — drop such rows up front
    val ch = changes.where(changes("key").isNotNull)
    val w = Window.partitionBy(ch("key"))
      .orderBy(ch("ts").desc, ch("seq").desc)
    val latest = ch
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn", "ts", "seq")
    val payload = latest.columns.filter(c => c != "key" && c != "op")
    val joined = base.join(latest, base(key) === latest("key"), "full_outer")
    val merged = base.columns.map { c =>
      if (payload.contains(c)) coalesce(latest(c), base(c)).as(c)
      else if (c == key) coalesce(base(key), latest("key")).as(key)
      else base(c)
    }
    joined
      .where(latest("op").isNull || latest("op") =!= "D")
      .select(merged.toIndexedSeq: _*)
  }

  /** Deterministic change batch derived from orders (no fixture has a
    * native CDC feed): every 7th order updates its customer's balance to
    * that order's total; every 21st instead deletes the customer. ts =
    * order date, seq = order key — a realistic mixed upsert/delete feed
    * with multiple changes per key.
    */
  def customerChanges(orders: DataFrame): DataFrame =
    orders.where(col("o_orderkey") % 7 === 0)
      .select(
        col("o_custkey").as("key"),
        when(col("o_orderkey") % 21 === 0, "D").otherwise("U").as("op"),
        col("o_orderdate").as("ts"),
        col("o_orderkey").as("seq"),
        round(col("o_totalprice"), 2).as("c_acctbal"))

  /** Headline query: the merged customer table after applying the order-
    * derived change feed — (custkey, name, balance) of every surviving
    * customer.
    */
  def mergeQuery(customer: DataFrame, orders: DataFrame): DataFrame =
    mergeUpsert(
      customer.select(col("c_custkey"), col("c_name"),
        round(col("c_acctbal"), 2).as("c_acctbal")),
      customerChanges(orders), "c_custkey")
}
