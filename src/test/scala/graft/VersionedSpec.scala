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
    // simulate a writer that died after writing data but BEFORE its
    // _COMMITTED marker landed: an unmarked v=99 directory appears
    Seq((2, 20.0)).toDF("k", "x").write.parquet(s"$root/v=99")
    // readers still see v0 — the torn snapshot has no marker
    assert(Versioned.latestVersion(spark, root) === Some(0L))
    assert(Versioned.read(spark, root).as[(Int, Double)].collect().toSeq
      === Seq((1, 10.0)))
    // pinning the torn snapshot is refused, not silently read
    intercept[java.util.NoSuchElementException] {
      Versioned.read(spark, root, Some(99L))
    }
  }

  test("two concurrent committers: distinct versions, both retained, no lost update") {
    val root = Files.createTempDirectory("graft_versioned3").toString + "/t"
    Versioned.commit(Seq((0, "base")).toDF("k", "v"), root)
    // both writers start from latest=0 and race for v=1 — the exclusive
    // claim forces the loser onto v=2; neither overwrites the other
    val results = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val threads = Seq("left", "right").map { tag =>
      new Thread(() =>
        results.add(Versioned.commit(Seq((1, tag)).toDF("k", "v"), root)))
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val got = results.asScala.toSeq.map(_.toLong).sorted
    assert(got === Seq(1L, 2L), s"committers must land distinct versions: $got")
    assert(Versioned.versions(spark, root) === Seq(0L, 1L, 2L))
    // both snapshots are retained and readable (no orphaned data)
    val tags = Seq(1L, 2L).map(v =>
      Versioned.read(spark, root, Some(v)).as[(Int, String)].head()._2).toSet
    assert(tags === Set("left", "right"))
    assert(Versioned.latestVersion(spark, root) === Some(2L))
  }

  test("claim stress: 4 writers x 3 commits each land 12 distinct versions") {
    val root = Files.createTempDirectory("graft_versioned5").toString + "/t"
    Versioned.commit(Seq((0, "base")).toDF("k", "v"), root)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val threads = (1 to 4).map { t =>
      new Thread(() => (1 to 3).foreach { i =>
        results.add(Versioned.commit(Seq((t, s"w$t-$i")).toDF("k", "v"), root))
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val got = results.asScala.toSeq.map(_.toLong).sorted
    // O_EXCL claims: no two commits may ever share a version number
    assert(got === (1L to 12L), s"expected 12 distinct versions, got $got")
    assert(Versioned.versions(spark, root) === (0L to 12L))
    // every snapshot is intact — exactly one row each, none mixed
    (1L to 12L).foreach { v =>
      assert(Versioned.read(spark, root, Some(v)).count() === 1L, s"torn snapshot v=$v")
    }
  }

  test("a foreign v=* entry does not brick the table") {
    val root = Files.createTempDirectory("graft_versioned6").toString + "/t"
    Versioned.commit(Seq((1, "a")).toDF("k", "v"), root)
    // an operator copies a snapshot aside before a risky run — the stray
    // non-numeric entry must not make every read/commit throw
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(root, "v=0.bak"))
    assert(Versioned.versions(spark, root) === Seq(0L))
    assert(Versioned.commit(Seq((2, "b")).toDF("k", "v"), root) === 1L)
    assert(Versioned.read(spark, root).count() === 1L)
  }

  test("CAS commit: a concurrent commit fails the expected-parent check, retry lands cleanly") {
    val root = Files.createTempDirectory("graft_versioned7").toString + "/t"
    Versioned.commit(Seq((0, "base")).toDF("k", "v"), root)
    // writer A pins its base read at v0...
    val aBase = Versioned.latestVersion(spark, root).get
    // ...then writer B commits v1 before A finishes its merge
    Versioned.commit(Seq((1, "from-b")).toDF("k", "v"), root)
    // A's CAS commit must refuse rather than shadow B's merge from latest
    intercept[java.util.ConcurrentModificationException] {
      Versioned.commit(Seq((1, "from-a")).toDF("k", "v"), root,
        expectedParent = Some(aBase))
    }
    assert(Versioned.read(spark, root).as[(Int, String)].head()._2 === "from-b")
    // the aborted attempt released its claim: the retry (re-read, re-merge)
    // lands on v2, not on a number burned by the failed CAS
    val retryV = Versioned.commit(Seq((1, "from-a-retried")).toDF("k", "v"), root,
      expectedParent = Versioned.latestVersion(spark, root))
    assert(retryV === 2L)
    assert(Versioned.versions(spark, root) === Seq(0L, 1L, 2L))
    assert(Versioned.read(spark, root).as[(Int, String)].head()._2 === "from-a-retried")
  }

  test("a claim race loser bumps past a crashed writer's burned version") {
    val root = Files.createTempDirectory("graft_versioned4").toString + "/t"
    Versioned.commit(Seq((0, "base")).toDF("k", "v"), root)
    // a crashed writer claimed v=1 and died before writing anything
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(root, "v=1/_CLAIM"), false).close()
    // the next commit skips the burned number
    assert(Versioned.commit(Seq((1, "next")).toDF("k", "v"), root) === 2L)
    assert(Versioned.latestVersion(spark, root) === Some(2L))
    assert(Versioned.versions(spark, root) === Seq(0L, 2L))
  }
}
