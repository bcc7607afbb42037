package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Typed-table loaders over the driver fixtures (FIXTURES.md).
  *
  * The reference's data model is schema-less newline text placed on
  * `h(filename) % N` nodes (`/root/reference/src/file_distributor/
  * fd_core.cc:41-48`); the new engine's native surface is columnar parquet
  * with real schemas — placement, locality and caching are delegated to the
  * storage layer + Spark. `spark.read.parquet` subsumes the reference's S1-S4
  * scan/ingest operators (SURVEY.md §2.1).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** Normalize `events.ts` to a session-TZ TimestampType column whatever
    * the fixture generation wrote: TIMESTAMP(NANOS) parquet reads as a raw
    * long (`spark.sql.legacy.parquet.nanosAsLong=true`, set by
    * [[graft.GraftSession]]) and converts nanos → micros here; plain
    * timezone-less TIMESTAMP(MICROS) reads as TIMESTAMP_NTZ and casts over
    * (instant-preserving — sessions run UTC, matching the oracle's naive
    * reading). Downstream ops always see TimestampType, so `unix_micros`
    * / window arithmetic resolve identically across fixture vintages.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register all fixture tables as temp views for `spark.sql` use. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** SQL entry point: run a statement against the registered fixture
    * tables — the engine's ad-hoc query surface.
    */
  def sql(spark: SparkSession, dir: String, statement: String): DataFrame = {
    registerAll(spark, dir)
    spark.sql(statement)
  }

  // ── typed Dataset[T] surface (graft.model) ──

  import org.apache.spark.sql.Dataset
  import graft.model._

  def lineitemDS(s: SparkSession, d: String): Dataset[Lineitem] = {
    import s.implicits._; lineitem(s, d).as[Lineitem]
  }
  def ordersDS(s: SparkSession, d: String): Dataset[Order] = {
    import s.implicits._; orders(s, d).as[Order]
  }
  def customerDS(s: SparkSession, d: String): Dataset[Customer] = {
    import s.implicits._; customer(s, d).as[Customer]
  }
  def documentsDS(s: SparkSession, d: String): Dataset[Document] = {
    import s.implicits._; documents(s, d).as[Document]
  }
  def embeddingsDS(s: SparkSession, d: String): Dataset[Embedding] = {
    import s.implicits._; embeddings(s, d).as[Embedding]
  }
  def eventsDS(s: SparkSession, d: String): Dataset[Event] = {
    import s.implicits._; events(s, d).as[Event]
  }
}
