package graft

import graft.functions.SetFunctions
import org.apache.spark.sql.functions._

class SetFunctionsSpec extends SparkSpec {
  import spark.implicits._

  // Property-style checks with seeded generation, matching the house
  // style (MapReduceSpec): one batched DataFrame per property so the
  // comparison against array_intersect collects once.
  private val rnd = new scala.util.Random(0x5e7f)

  test("sortedIntersectCount equals size(array_intersect) on sorted distinct long arrays") {
    val cases = (1 to 200).map { _ =>
      def arr = Seq.fill(rnd.nextInt(20))(rnd.nextLong() % 50).distinct.sorted
      (arr, arr)
    } :+ ((Seq.empty[Long], Seq(1L, 2L))) :+ ((Seq(3L), Seq.empty[Long]))
    val df = cases.toDF("a", "b").select(
      SetFunctions.sortedIntersectCount($"a", $"b").as("got"),
      size(array_intersect($"a", $"b")).as("want"))
    assert(df.where($"got" =!= $"want").count() === 0)
  }

  test("sortedIntersect equals array_intersect elements on sorted distinct long arrays") {
    val cases = (1 to 200).map { _ =>
      def arr = Seq.fill(rnd.nextInt(20))(rnd.nextLong() % 50).distinct.sorted
      (arr, arr)
    } :+ ((Seq.empty[Long], Seq(1L, 2L))) :+ ((Seq(3L), Seq.empty[Long]))
    // array_intersect preserves the left argument's order, and the left
    // side is sorted — so the element lists must match exactly
    val df = cases.toDF("a", "b").select(
      SetFunctions.sortedIntersect($"a", $"b").as("got"),
      array_intersect($"a", $"b").as("want"),
      SetFunctions.sortedIntersectCount($"a", $"b").as("n"))
    assert(df.where(not($"got" <=> $"want")).count() === 0)
    assert(df.where(size($"got") =!= $"n").count() === 0)
  }

  test("sortedIntersectCount equals size(array_intersect) on sorted distinct string arrays") {
    val alphabet = Vector("a", "b", "ab", "ba", "", "zz", "é", "😀", "the quick", "𝄞")
    val cases = (1 to 200).map { _ =>
      def arr = Seq.fill(rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.size))).distinct
      (arr, arr.drop(rnd.nextInt(3)) ++ Seq.fill(rnd.nextInt(4))(alphabet(rnd.nextInt(alphabet.size))))
    }
    // sort THROUGH Spark's array_sort so test ordering = engine ordering
    val df = cases.toDF("a0", "b0")
      .select(array_sort($"a0").as("a"), array_sort(array_distinct($"b0")).as("b"))
      .select(SetFunctions.sortedIntersectCount($"a", $"b").as("got"),
        size(array_intersect($"a", $"b")).as("want"))
    assert(df.where($"got" =!= $"want").count() === 0)
  }

  test("supplementary-plane strings: merge ordering agrees with array_sort") {
    // U+1D11E (a surrogate pair in UTF-16) sorts differently against
    // U+FFFD under UTF-8 byte order vs Java compareTo — the classic
    // disagreement. The count must be right on Spark-sorted arrays.
    val df = Seq((Seq("�", "𝄞", "x"), Seq("𝄞", "x")))
      .toDF("a0", "b0")
      .select(array_sort(array_distinct($"a0")).as("a"),
        array_sort(array_distinct($"b0")).as("b"))
    assert(df.select(SetFunctions.sortedIntersectCount($"a", $"b")).head().getInt(0) === 2)
  }

  test("null input propagates null") {
    val df = Seq(Tuple1(Seq(1L, 2L))).toDF("b")
      .select(lit(null).cast("array<bigint>").as("a"), $"b")
    assert(df.select(SetFunctions.sortedIntersectCount($"a", $"b")).head().isNullAt(0))
  }

  test("interpreted eval matches codegen") {
    val expr = graft.functions.SortedIntersectCount(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(1L, 3L, 5L, 9L),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(2L, 3L, 9L, 10L),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
    assert(expr.eval(null) === 2)
  }

  test("graft_sorted_intersect_count is SQL-callable and arity-checked") {
    graft.functions.VectorFunctions.register(spark)
    val n = spark.sql(
      "SELECT graft_sorted_intersect_count(array(1L,2L,4L), array(2L,3L,4L)) AS n")
      .head().getInt(0)
    assert(n === 2)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_sorted_intersect_count(array(1L))").collect()
    }
    assert(e.getMessage.contains("graft_sorted_intersect_count"))
  }
}
