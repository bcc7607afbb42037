package graft

import java.nio.file.Files

import graft.sources.Sources
import org.apache.spark.sql.SaveMode

class SourcesSpec extends SparkSpec {

  test("text write/read round-trip (newline record model)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-src").toString + "/txt"
    val lines = Seq("alpha 1", "beta 2", "gamma 3")
    Sources.writeText(spark.createDataset(lines), dir, SaveMode.Overwrite)
    val back = Sources.readText(spark, dir).collect().toSet
    assert(back === lines.toSet)
  }

  test("catalog ops: put / ls / cat / rm") {
    val store = Files.createTempDirectory("graft-store").toString
    val local = Files.createTempFile("graft-local", ".txt")
    Files.writeString(local, "line1\nline2\n")
    Sources.put(spark, local.toString, store)
    val listed = Sources.ls(spark, store)
    assert(listed.exists(_.getPath.getName == local.getFileName.toString))
    val content = Sources.cat(spark, s"$store/${local.getFileName}").toList
    assert(content === List("line1", "line2"))
    assert(Sources.rm(spark, s"$store/${local.getFileName}"))
    assert(Sources.ls(spark, store).isEmpty)
  }

  test("parquet round-trip with partitioning") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-pq").toString + "/t"
    val df = Seq((1, "a"), (2, "b"), (3, "a")).toDF("id", "part")
    Sources.writeParquet(df, dir, partitionBy = Seq("part"))
    val back = Sources.readParquet(spark, dir)
    assert(back.count() === 3)
    // partition pruning works: only one directory scanned
    assert(back.where(back("part") === "a").count() === 2)
  }
}
