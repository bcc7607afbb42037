package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Generic column profiler: one pass over any DataFrame computing, per
  * column, null count, approximate distinct count, and type-appropriate
  * min/max — the "what is this table" primitive of a data pipeline.
  * All metrics ride in a single aggregation (one job, map-side partial),
  * then pivot to long format (column, metric, value) driver-side from the
  * single collected row — bounded by #columns, not data size.
  */
object Profiler {

  def profile(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = df.schema.fields.flatMap { f =>
      val c = col(f.name)
      val base = Seq(
        sum(when(c.isNull, 1).otherwise(0)).cast("string").as(s"${f.name}::nulls"),
        approx_count_distinct(c).cast("string").as(s"${f.name}::approx_distinct"))
      f.dataType match {
        case _: NumericType | StringType => base ++ Seq(
          min(c).cast("string").as(s"${f.name}::min"),
          max(c).cast("string").as(s"${f.name}::max"))
        case _ => base
      }
    } :+ count(lit(1)).cast("string").as(":table:::rows")
    val row: Row = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*).head()
    val out = row.schema.fieldNames.zipWithIndex.map { case (name, i) =>
      val idx = name.lastIndexOf("::")
      val (colName, metric) =
        (name.substring(0, idx), name.substring(idx + 2))
      (colName, metric, Option(row.get(i)).map(_.toString).orNull)
    }
    out.toSeq.toDF("column", "metric", "value")
  }

  /** Declarative data-quality gate: evaluate a set of named constraints
    * over a table in ONE aggregation pass (single job, map-side partial —
    * the Deequ-style "unit tests for data" primitive a pipeline runs
    * before publishing a dataset). Each rule is a boolean column over the
    * whole frame; the report is (rule, violations, pass) per rule.
    *
    * The one-pass shape matters at 100 TB: N rules cost one scan, not N.
    */
  def dqCheck(df: DataFrame, rules: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = rules.map { case (name, pred) =>
      sum(when(pred, 0L).otherwise(1L)).as(name)
    }
    val row = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*).head()
    rules.zipWithIndex.map { case ((name, _), i) =>
      val v = if (row.isNullAt(i)) 0L else row.getLong(i)
      (name, v, v == 0L)
    }.toSeq.toDF("rule", "violations", "pass")
  }

  /** Headline constraint set for lineitem: completeness, ranges, and
    * cross-field arithmetic consistency.
    */
  def dqLineitem(lineitem: DataFrame): DataFrame =
    dqCheck(lineitem, Seq(
      "orderkey_not_null" -> col("l_orderkey").isNotNull,
      "quantity_positive" -> (col("l_quantity") > 0),
      "discount_in_unit_range" -> col("l_discount").between(0, 1),
      "price_nonnegative" -> (col("l_extendedprice") >= 0),
      "flag_in_domain" -> col("l_returnflag").isin("A", "N", "R"),
      "ship_after_epoch" -> (col("l_shipdate") >= to_timestamp(lit("1990-01-01")))))
}
