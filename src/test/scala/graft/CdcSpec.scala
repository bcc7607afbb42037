package graft

import java.sql.Timestamp

import graft.operators.Cdc
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  test("mergeUpsert: latest-wins update, insert, delete, passthrough") {
    val base = Seq(
      (1L, "alice", 10.0), (2L, "bob", 20.0), (3L, "carol", 30.0))
      .toDF("id", "name", "bal")
    val changes = Seq(
      // two updates for key 1: the later (by ts) must win
      (1L, "U", ts("2024-01-01"), 100L, 11.0),
      (1L, "U", ts("2024-02-01"), 101L, 12.0),
      // delete key 2
      (2L, "D", ts("2024-01-15"), 102L, 0.0),
      // insert a new key 4
      (4L, "U", ts("2024-01-20"), 103L, 40.0))
      .toDF("key", "op", "ts", "seq", "bal")
    val got = Cdc.mergeUpsert(base, changes, "id")
      .select("id", "name", "bal")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, "alice", 12.0),  // latest update applied
      (3L, "carol", 30.0),  // untouched
      (4L, null, 40.0)))    // insert: payload set, unknown columns null
  }

  test("mergeUpsert: same-ts ties broken by seq, delete-then-update resurrects") {
    val base = Seq((1L, "x", 1.0)).toDF("id", "name", "bal")
    val changes = Seq(
      (1L, "D", ts("2024-01-01"), 1L, 0.0),
      (1L, "U", ts("2024-01-01"), 2L, 9.0)) // same ts, higher seq → wins
      .toDF("key", "op", "ts", "seq", "bal")
    val got = Cdc.mergeUpsert(base, changes, "id")
      .select("id", "bal").as[(Long, Double)].collect().toSeq
    assert(got === Seq((1L, 9.0)))
  }

  test("mergeUpsert: base columns named like the change envelope don't collide") {
    // base legitimately has its own `key` and `ts` columns; the merge must
    // resolve the envelope columns by attribute, not by name
    val base = Seq((1L, "k1", ts("2020-01-01"), 1.0), (2L, "k2", ts("2020-01-02"), 2.0))
      .toDF("id", "key", "ts", "bal")
    val changes = Seq((1L, "U", ts("2024-01-01"), 1L, 9.0))
      .toDF("key", "op", "ts", "seq", "bal")
    val got = Cdc.mergeUpsert(base, changes, "id")
      .select("id", "key", "bal").as[(Long, String, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "k1", 9.0), (2L, "k2", 2.0)))
  }

  test("mergeQuery applies the order-derived feed consistently") {
    val out = Cdc.mergeQuery(Tables.customer(spark, sfDir), Tables.orders(spark, sfDir))
    val base = Tables.customer(spark, sfDir)
    // deleted keys: custkeys whose LATEST change is a delete
    val deleted = Cdc.customerChanges(Tables.orders(spark, sfDir))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("key")
          .orderBy(col("ts").desc, col("seq").desc)))
      .where($"rn" === 1 && $"op" === "D")
      .select("key").as[Long].collect().toSet
    val outKeys = out.select("c_custkey").as[Long].collect().toSet
    assert(deleted.forall(k => !outKeys.contains(k)), "deleted keys must not survive")
    assert(outKeys.size === base.count() - deleted.size,
      "survivors = base minus latest-deletes (orders reference existing customers)")
  }
}
