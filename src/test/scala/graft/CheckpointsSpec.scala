package graft

import java.nio.file.{Files, Path}

import graft.operators.Graph
import graft.plans.Checkpoints

/** The reliable-checkpoint knob (`graft.checkpoint.dir`): when set, the
  * iterative loops' per-round lineage truncation writes RELIABLE
  * checkpoints under the configured directory (survives executor loss on
  * a cluster) instead of executor-local blocks — and the results are
  * bit-identical either way, because the knob changes only where the
  * materialized bytes live.
  */
class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  private def withKnob[A](dir: String)(body: => A): A = {
    spark.conf.set(Checkpoints.DirKey, dir)
    try body
    finally spark.conf.unset(Checkpoints.DirKey)
  }

  private def filesUnder(p: Path): Seq[Path] = {
    val s = Files.walk(p)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(Files.isRegularFile(_)).toList
    } finally s.close()
  }

  test("truncate routes through the reliable dir when the knob is set") {
    val tmp = Files.createTempDirectory("graft-ckpt")
    val df = (1L to 100L).toDF("v")
    assert(Checkpoints.reliableDir(spark).isEmpty)
    withKnob(tmp.toString) {
      assert(Checkpoints.reliableDir(spark).contains(tmp.toString))
      val t = Checkpoints.truncate(df)
      assert(t.as[Long].collect().sorted.toSeq === (1L to 100L))
      assert(filesUnder(tmp).nonEmpty,
        "reliable truncate must write checkpoint files under the knob dir")
    }
    // knob unset again: truncation is local, the dir gains nothing new
    val before = filesUnder(tmp).size
    Checkpoints.truncate(df).count()
    assert(filesUnder(tmp).size === before)
  }

  test("pageRank ranks are identical with and without the knob") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"),
      ("d", "a")).toDF("src", "dst")
    // 5 iterations so the loop actually truncates intermediate rounds
    val local = Graph.pageRank(edges, iters = 5)
      .as[(String, Long)].collect().toMap
    graft.plans.ReleaseRegistry.drain()
    val tmp = Files.createTempDirectory("graft-ckpt-pr")
    val reliable = withKnob(tmp.toString) {
      val r = Graph.pageRank(edges, iters = 5)
        .as[(String, Long)].collect().toMap
      assert(filesUnder(tmp).nonEmpty, "knob run must populate the dir")
      r
    }
    graft.plans.ReleaseRegistry.drain()
    assert(reliable === local)
  }

  test("kCore core is identical with and without the knob") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("src", "dst")
    val local = Graph.kCore(edges, k = 3, rounds = 3)
      .as[(Long, Long)].collect().toMap
    graft.plans.ReleaseRegistry.drain()
    val tmp = Files.createTempDirectory("graft-ckpt-kc")
    val reliable = withKnob(tmp.toString) {
      val r = Graph.kCore(edges, k = 3, rounds = 3)
        .as[(Long, Long)].collect().toMap
      assert(filesUnder(tmp).nonEmpty, "knob run must populate the dir")
      r
    }
    graft.plans.ReleaseRegistry.drain()
    assert(reliable === local)
  }
}
