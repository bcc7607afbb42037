package graft

import graft.operators.{JobParams, MapReduce, TextOps}

class MapReduceSpec extends SparkSpec {
  import spark.implicits._

  private val lines = Seq("a b a", "b c", "a")

  test("run: word count via mapper/reducer facade matches DataFrame op") {
    val ds = spark.createDataset(lines)
    val viaFacade = MapReduce.run(ds)(
      line => line.split("\\s+").filter(_.nonEmpty).map(w => (w, 1L)))(
      (k, vs) => Iterator.single((k, vs.sum)))
      .collect().toMap
    val viaDf = TextOps.wordCount(
      lines.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
      .as[(String, Long)].collect().toMap
    assert(viaFacade === viaDf)
  }

  test("runAggregating (map-side combine path) agrees with run") {
    val ds = spark.createDataset(lines)
    val mapper: String => IterableOnce[(String, Long)] =
      line => line.split("\\s+").filter(_.nonEmpty).map(w => (w, 1L))
    val general = MapReduce.run(ds)(mapper)((k, vs) => Iterator.single((k, vs.sum))).collect().toMap
    val algebraic = MapReduce.runAggregating(ds)(mapper)(0L)(_ + _)(_ + _)((b: Long) => b)
      .collect().toMap
    assert(general === algebraic)
  }

  test("runAggregating hands every group a FRESH buffer (in-place mutation safe)") {
    // Array buffer mutated in place by seqOp/combOp: if zero returned a
    // shared instance, all keys in a task would accumulate into one
    // buffer and every aggregate would be wrong
    val ds = spark.createDataset(Seq("a 1", "b 2", "a 3", "c 5"))
    val mapper: String => IterableOnce[(String, Long)] =
      line => { val Array(k, v) = line.split(" "); Iterator.single((k, v.toLong)) }
    val got = MapReduce.runAggregating(ds)(mapper)(Array(0L))(
      (b, v) => { b(0) += v; b })(
      (b1, b2) => { b1(0) += b2(0); b1 })(
      (b: Array[Long]) => b(0))
      .collect().toMap
    assert(got === Map("a" -> 4L, "b" -> 2L, "c" -> 5L))
  }

  test("runSortedByKey aggregates correctly") {
    val ds = spark.createDataset(Seq("c 1", "a 2", "b 3", "a 4"))
    val seen = MapReduce.runSortedByKey(ds)(
      line => { val Array(k, v) = line.split(" "); Iterator.single((k, v.toLong)) })(
      (k, vs) => Iterator.single((k, vs.sum)))
      .collect().toMap
    assert(seen === Map("a" -> 6L, "b" -> 3L, "c" -> 1L))
  }

  test("reference-parity pipeline: text scan → mapReduce → KV text sink → read back") {
    import graft.sources.Sources
    val base = java.nio.file.Files.createTempDirectory("graft-parity").toString
    Tables.documents(spark, sfDir).select("text").write.text(s"$base/in")
    val counted = MapReduce.run(Sources.readText(spark, s"$base/in"))(
      line => line.split("\\s+").filter(_.nonEmpty).map(w => (w, 1L)))(
      (k, vs) => Iterator.single((k, vs.sum)))
    Sources.writeText(
      MapReduce.encodeKV(counted.map { case (k, n) => (k, n.toString) }),
      s"$base/out", org.apache.spark.sql.SaveMode.Overwrite)
    val back = MapReduce.decodeKV(Sources.readText(spark, s"$base/out"))
      .map { case (k, v) => (k, v.toLong) }.collect().toMap
    val expected = graft.operators.TextOps
      .wordCount(Tables.documents(spark, sfDir)).as[(String, Long)].collect().toMap
    assert(back === expected)
  }

  test("runPerFile: one mapper per file with cross-record state (in-file positions)") {
    val base = java.nio.file.Files.createTempDirectory("graft-perfile")
    java.nio.file.Files.writeString(base.resolve("f1.txt"), "a b\nc\n")
    java.nio.file.Files.writeString(base.resolve("f2.txt"), "b\na\n")
    val out = MapReduce.runPerFile(spark, Seq(base.toString))(
      (file, lines) => {
        val name = file.substring(file.lastIndexOf('/') + 1)
        // position counter survives across records of one file — the
        // reference's per-file mapper state (mapreduce.hh:557-593)
        var pos = 0
        lines.flatMap(_.split("\\s+").filter(_.nonEmpty).map { w =>
          pos += 1; (w, s"$name:$pos")
        })
      })(
      (k, vs) => Iterator.single((k, vs.toSeq.sorted.mkString(","))))
      .collect().toMap
    assert(out("a") === "f1.txt:1,f2.txt:2")
    assert(out("b") === "f1.txt:2,f2.txt:1")
    assert(out("c") === "f1.txt:3")
  }

  test("runWithParams: parameterized threshold over two text inputs") {
    import graft.sources.Sources
    val base = java.nio.file.Files.createTempDirectory("graft-params")
    java.nio.file.Files.writeString(base.resolve("in1.txt"), "a a b\n")
    java.nio.file.Files.writeString(base.resolve("in2.txt"), "a c c c\n")
    val params = JobParams.of("2")
    assert(params.argc === 1 && params.argv(0) === "2")
    assert(params.getOrElse(5, "fallback") === "fallback")
    val ds = Sources.readText(spark, s"$base/in1.txt", s"$base/in2.txt")
    val out = MapReduce.runWithParams(ds, params)(
      (_, line) => line.split("\\s+").filter(_.nonEmpty).map(w => (w, 1L)))(
      (p, k, vs) => {
        val n = vs.sum
        if (n >= p.argv(0).toLong) Iterator.single((k, n)) else Iterator.empty
      })
      .collect().toMap
    assert(out === Map("a" -> 3L, "c" -> 3L))
  }

  // Property-style checks with seeded generation (grouping invariants the
  // reference's P1-P3 machinery guarantees: no pair lost, no key split).
  test("property: every emitted pair lands in exactly one group") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 10) {
      val words = List.fill(1 + rnd.nextInt(60))(s"w${rnd.nextInt(7)}")
      val ds = spark.createDataset(words.grouped(8).map(_.mkString(" ")).toSeq)
      val grouped = MapReduce.run(ds)(
        l => l.split(" ").map(w => (w, 1)))(
        (k, vs) => Iterator.single((k, vs.size)))
        .collect()
      assert(grouped.map(_._2).sum === words.size, s"pairs lost/duplicated for $words")
      assert(grouped.map(_._1).distinct.length === grouped.length, "key split across groups")
      assert(grouped.map(_._1).toSet === words.toSet)
    }
  }

  test("property: text KV codec round-trips space-free keys") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 10) {
      val pairs = List.fill(1 + rnd.nextInt(20))(
        (s"k${rnd.nextInt(100)}", s"v${rnd.nextInt(100)} trailing ${rnd.nextInt(10)}"))
      val back = MapReduce.decodeKV(MapReduce.encodeKV(spark.createDataset(pairs)))
        .collect().toList
      assert(back.sorted === pairs.sorted)
    }
  }
}
