package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
    (2L, Seq(0.0, 0.0), Seq(1.0, 1.0))).toDF("id", "a", "b")

  test("dotNative computes the ordered dot product (codegen path)") {
    val got = vecs.select($"id", VectorFunctions.dotNative($"a", $"b").as("d"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) === 32.0)
    assert(got(2L) === 0.0)
  }

  test("dotNative equals the higher-order-function formulation bit-for-bit") {
    val e = Tables.embeddings(spark, sfDir)
      .select(transform(col("embedding"), _.cast("double")).as("v"))
    val hof = aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val maxDiff = e.select(abs(hof - VectorFunctions.dotNative(col("v"), col("v"))).as("e"))
      .agg(max("e")).head().getDouble(0)
    assert(maxDiff === 0.0)
  }

  test("graft_dot is SQL-callable after registration") {
    VectorFunctions.register(spark)
    vecs.createOrReplaceTempView("vf_test")
    val got = spark.sql("SELECT id, graft_dot(a, b) AS d FROM vf_test")
      .as[(Long, Double)].collect().toMap
    assert(got(1L) === 32.0)
  }

  test("graft_hash64 and graft_eq_count are SQL-callable via the extension") {
    // extension-injected (GraftExtensions), no imperative registration
    val h = spark.sql("SELECT graft_hash64('abc') AS h").head().getLong(0)
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("abc".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    assert(h === java.lang.Long.parseLong(hex, 16))
    val n = spark.sql(
      "SELECT graft_eq_count(array(1L,2L,3L), array(1L,9L,3L)) AS n")
      .head().getInt(0)
    assert(n === 2)
  }

  test("wrong SQL arity raises an analysis error naming the signature") {
    // every injected builder validates arity up front — a bad call must
    // not surface as an IndexOutOfBoundsException from exprs(1)
    Seq(
      "SELECT graft_hash64()",
      "SELECT graft_hash64('a', 'b')",
      "SELECT graft_eq_count(array(1L))",
      "SELECT graft_dot(array(1.0))",
      "SELECT graft_lsh_buckets(array(1.0))").foreach { sql =>
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(sql).collect()
      }
      assert(e.getMessage.contains("graft_"), s"$sql: ${e.getMessage}")
    }
  }

  test("graft_hash64 is SQL-callable via the imperative register path too") {
    // a session built WITHOUT GraftExtensions relies on register(spark)
    // alone — the two registration lists must expose the same functions
    VectorFunctions.register(spark)
    val h = spark.sql("SELECT graft_hash64('abc') AS h").head().getLong(0)
    assert(h === graft.functions.PortableMd5.hash64("abc".getBytes("UTF-8")))
  }

  test("a non-literal scalar argument raises a clear error, not an opaque NPE") {
    vecs.createOrReplaceTempView("vf_scalar_test")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_freq_items(id, id) FROM vf_scalar_test").collect()
    }
    assert(e.getMessage.contains("integer literal"),
      s"expected the literal-int validation message, got: ${e.getMessage}")
  }

  test("vecSum aggregates element-wise across partitions") {
    val df = Seq(
      (0, Seq(1.0, 2.0, 3.0)),
      (0, Seq(10.0, 20.0, 30.0)),
      (1, Seq(5.0, 5.0, 5.0)))
      .toDF("g", "v").repartition(4) // force partial + merge path
    val got = df.groupBy("g").agg(VectorFunctions.vecSum($"v").as("s"))
      .as[(Int, Seq[Double])].collect().toMap
    assert(got(0) === Seq(11.0, 22.0, 33.0))
    assert(got(1) === Seq(5.0, 5.0, 5.0))
  }

  test("vecSum tolerates ragged rows and skips nulls") {
    val df = Seq(
      (0, Some(Seq(1.0, 2.0))),
      (0, Some(Seq(1.0, 2.0, 3.0))),
      (0, None: Option[Seq[Double]]))
      .toDF("g", "v")
    val got = df.groupBy("g").agg(VectorFunctions.vecSum($"v").as("s"))
      .as[(Int, Seq[Double])].collect().toMap
    assert(got(0) === Seq(2.0, 4.0, 3.0))
  }

  test("graft_vec_sum is SQL-callable after registration") {
    VectorFunctions.register(spark)
    vecs.createOrReplaceTempView("vf_test2")
    val got = spark.sql("SELECT graft_vec_sum(a) AS s FROM vf_test2")
      .as[Seq[Double]].head()
    assert(got === Seq(1.0, 2.0, 3.0)) // row2 is length-2: (0,0) adds zeros
  }

  test("eqCount counts positional matches (codegen path)") {
    val df = Seq(
      (1L, Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 4L)),
      (2L, Seq(5L, 6L), Seq(7L, 8L)))
      .toDF("id", "a", "b")
    val got = df.select($"id", VectorFunctions.eqCount($"a", $"b").as("c"))
      .as[(Long, Int)].collect().toMap
    assert(got(1L) === 3)
    assert(got(2L) === 0)
  }

  test("null inputs yield null, mismatched lengths use the shorter prefix") {
    val df = Seq(
      (1L, Some(Seq(1.0, 2.0)), Some(Seq(3.0))),
      (2L, None: Option[Seq[Double]], Some(Seq(1.0))))
      .toDF("id", "a", "b")
    val got = df.select($"id", VectorFunctions.dotNative($"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(got(1L) === 3.0)
    assert(got(2L) === null)
  }

  test("graft_md5_64 equals the conv(substring(md5)) formulation, inside codegen") {
    val docs = Tables.documents(spark, sfDir)
      .select($"text").limit(200)
      .repartition(2) // defeat ConvertToLocalRelation so codegen runs
    val cmp = docs.select(
      graft.functions.Md5Hash64($"text").as("native"),
      expr("cast(conv(substring(md5(text), 1, 15), 16, 10) as bigint)").as("composed"))
    assert(cmp.where($"native" =!= $"composed").count() === 0)
    assert(cmp.where($"native" < 0).count() === 0, "60-bit value is non-negative")
    // unicode + empty-string coverage
    val edge = Seq("", "é" * 10, "a b\tc\nd", "é世界").toDF("text")
      .repartition(2)
      .select(
        graft.functions.Md5Hash64($"text").as("native"),
        expr("cast(conv(substring(md5(text), 1, 15), 16, 10) as bigint)").as("composed"))
    assert(edge.where($"native" =!= $"composed").count() === 0)
    cmp.collect() // finalize AQE so the plan rendering shows codegen stages
    val plan = cmp.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[[^\n]*graft_md5_64""".r.findFirstIn(plan).isDefined,
      s"graft_md5_64 must stay inside whole-stage codegen:\n${plan.take(600)}")
  }
}
