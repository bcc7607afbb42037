package graft

import java.nio.file.Files

import graft.sources.Versioned

class VersionedSpec extends SparkSpec {
  import spark.implicits._

  test("commit/read round-trip, monotone versions, time travel, vacuum") {
    val root = Files.createTempDirectory("graft_versioned").toString + "/t"
    assert(Versioned.latestVersion(spark, root).isEmpty)
    assert(Versioned.versions(spark, root).isEmpty)

    val v0 = Versioned.commit(Seq((1, "a"), (2, "b")).toDF("k", "v"), root)
    val v1 = Versioned.commit(Seq((1, "a2"), (3, "c")).toDF("k", "v"), root)
    val v2 = Versioned.commit(Seq((9, "z")).toDF("k", "v"), root)
    assert(Seq(v0, v1, v2) === Seq(0L, 1L, 2L))
    assert(Versioned.latestVersion(spark, root) === Some(2L))
    assert(Versioned.versions(spark, root) === Seq(0L, 1L, 2L))

    // latest read sees the last commit; pinned reads see history
    assert(Versioned.read(spark, root).as[(Int, String)].collect().toSet
      === Set((9, "z")))
    assert(Versioned.read(spark, root, Some(0L)).as[(Int, String)].collect().toSet
      === Set((1, "a"), (2, "b")))
    assert(Versioned.read(spark, root, Some(1L)).as[(Int, String)].collect().toSet
      === Set((1, "a2"), (3, "c")))

    // vacuum keeps the trailing `keep` versions
    val dead = Versioned.vacuum(spark, root, keep = 2)
    assert(dead === Seq(0L))
    assert(Versioned.versions(spark, root) === Seq(1L, 2L))
    // latest still reads fine after vacuum
    assert(Versioned.read(spark, root).count() === 1)
  }

  test("a failed write between snapshots leaves the old snapshot serving") {
    val root = Files.createTempDirectory("graft_versioned2").toString + "/t"
    Versioned.commit(Seq((1, 10.0)).toDF("k", "x"), root)
    // simulate a writer that died after writing data but BEFORE the
    // pointer swap: an uncommitted v=1 directory appears
    Seq((2, 20.0)).toDF("k", "x").write.parquet(s"$root/v=99")
    // readers still see v0 — the pointer never moved
    assert(Versioned.latestVersion(spark, root) === Some(0L))
    assert(Versioned.read(spark, root).as[(Int, Double)].collect().toSeq
      === Seq((1, 10.0)))
  }
}
