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
}
