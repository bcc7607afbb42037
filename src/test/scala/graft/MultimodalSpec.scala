package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.fromBinary(
    Seq(
      (1L, "payload-one".getBytes("UTF-8")),
      (2L, "payload-two".getBytes("UTF-8")),
      (3L, "payload-one".getBytes("UTF-8")))
      .toDF("id", "bytes"),
    "id", "bytes", "image")

  test("fromBinary produces the canonical media schema") {
    assert(media.schema.fieldNames.toSeq ===
      Multimodal.mediaMetaSchema.fieldNames.toSeq)
    assert(media.count() === 3)
  }

  test("extractFeatures: deterministic stub features, payload dropped") {
    val feats = Multimodal.extractFeatures(media)
    assert(!feats.schema.fieldNames.contains("payload"))
    val byId = feats.select("media_id", "features")
      .as[(Long, Seq[Float])].collect().toMap
    assert(byId(1L).length === Multimodal.MediaCodec.featureDim)
    assert(byId(1L) === byId(3L)) // same payload → same features
    assert(byId(1L) !== byId(2L))
  }

  test("metadata-only queries never read the payload column (pruned scan)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString + "/m"
    media.write.parquet(dir)
    val metaOnly = spark.read.parquet(dir).select("media_id", "kind")
    val plan = metaOnly.queryExecution.sparkPlan.toString
    assert(plan.contains("ReadSchema: struct<media_id:bigint,kind:string>"),
      s"payload should be pruned from the scan:\n$plan")
    assert(!plan.contains("payload"))
  }

  test("resizeStub rewrites payload and stamps dimensions") {
    val out = Multimodal.resizeStub(media, 32, 32)
    assert(out.count() === 3)
    val row = out.select("width", "height", "payload").head()
    assert(row.getInt(0) === 32 && row.getInt(1) === 32)
    assert(row.getAs[Array[Byte]](2).length === (32 * 32) / 64)
  }

  test("sampleFrames fans out one row per sampled frame") {
    val vids = media
      .withColumn("kind", org.apache.spark.sql.functions.lit("video"))
      .withColumn("duration_ms", org.apache.spark.sql.functions.lit(3000L))
    val frames = Multimodal.sampleFrames(vids, everyMs = 1000L)
    assert(frames.count() === 3 * 4) // 0,1000,2000,3000 per video
  }
}
