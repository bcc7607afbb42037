package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample stages
  * whose Spark-side plumbing (schema, batch shape, partitioning) is real
  * while the codec itself is STUBBED — the actual image/audio libraries are
  * not available in this environment, so `decodeStub` derives a
  * deterministic fake feature vector from the bytes. Swap
  * [[MediaCodec.decode]] for a real codec (JNI/FFI) without touching any
  * plan structure.
  *
  * North-star scope (no analog in the reference — its records are newline
  * text, SURVEY.md §1). Design notes for 100 TB:
  *  - media bytes ride in parquet binary columns; metadata columns stay
  *    prunable so metadata-only queries never deserialize payloads;
  *  - decode runs via `mapPartitions` so per-partition codec init happens
  *    once, not per row (same batching rationale as Arrow-batched UDFs);
  *  - feature vectors come back as `array<float>` ready for
  *    [[Similarity]] ANN ops.
  */
object Multimodal {

  /** Typed metadata for a media payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("payload", BinaryType, nullable = true)))

  /** The stubbed codec boundary. A real deployment replaces `decode` with
    * an actual decoder; everything else in this module is production
    * plumbing.
    */
  object MediaCodec {
    val featureDim = 16

    /** STUB: deterministic fake "decode + feature extract" — hashes the
      * payload into a fixed-dim pseudo-feature vector. Real codec goes
      * here (`???` semantics, made deterministic so tests can assert).
      */
    def decode(payload: Array[Byte]): Array[Float] = {
      val out = new Array[Float](featureDim)
      if (payload != null) {
        var h = 1125899906842597L
        var i = 0
        while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
        var d = 0
        while (d < featureDim) {
          val x = h ^ (0x9e3779b97f4a7c15L * (d + 1))
          out(d) = ((x % 1000003L).toFloat / 1000003f)
          d += 1
        }
      }
      out
    }

    /** STUB: deterministic fake "re-encode at new dimensions" — truncates /
      * zero-pads bytes where a real codec would resample pixels. Real
      * resize goes here.
      */
    def resize(payload: Array[Byte], width: Int, height: Int): Array[Byte] =
      if (payload == null) null
      else java.util.Arrays.copyOf(payload, math.max(1, (width * height) / 64))
  }

  /** Wrap raw media rows into the canonical schema (payload + metadata). */
  def fromBinary(df: DataFrame, idCol: String, payloadCol: String, kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      lit(null).cast("string").as("format"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      lit(null).cast("long").as("duration_ms"),
      col(payloadCol).cast("binary").as("payload"))

  /** Decode + feature-extract stage: mapPartitions over the payloads so
    * codec init amortizes per partition; output keeps metadata and adds
    * `features array<float>` (payload dropped — decoded data should not
    * ride forward).
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(
      media.schema.fields.filterNot(_.name == "payload") :+
        StructField("features", ArrayType(FloatType, containsNull = false)))
    val payloadIdx = media.schema.fieldIndex("payload")
    val keepIdx = media.schema.fields.indices.filterNot(_ == payloadIdx)
    implicit val enc = Encoders.row(outSchema)
    media.mapPartitions { rows =>
      // per-partition codec init would happen here (once, not per row)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val features = MediaCodec.decode(payload)
        Row.fromSeq(keepIdx.map(r.get) :+ features.toSeq)
      }
    }
  }

  /** Resize stage shape for images: rewrites the payload through the
    * batched codec boundary and stamps the new dimensions into the metadata
    * columns. Row-local (no shuffle) and, like [[extractFeatures]], runs
    * via `mapPartitions` so codec init happens once per partition — not a
    * per-row UDF.
    */
  def resizeStub(media: DataFrame, width: Int, height: Int): DataFrame = {
    val images = media.where(col("kind") === "image")
    val schema = images.schema
    val payloadIdx = schema.fieldIndex("payload")
    val widthIdx = schema.fieldIndex("width")
    val heightIdx = schema.fieldIndex("height")
    implicit val enc = Encoders.row(schema)
    images.mapPartitions { rows =>
      // per-partition codec init would happen here (once, not per row)
      rows.map { r =>
        Row.fromSeq(schema.fields.indices.map {
          case i if i == payloadIdx =>
            MediaCodec.resize(r.getAs[Array[Byte]](payloadIdx), width, height)
          case i if i == widthIdx => width
          case i if i == heightIdx => height
          case i => r.get(i)
        })
      }
    }
  }

  /** Frame-sampling stage shape for video: emit one row per sampled frame
    * index (the decode of each frame is the same stubbed codec boundary).
    * Demonstrates the explode-style fan-out plan a real sampler uses.
    */
  def sampleFrames(media: DataFrame, everyMs: Long = 1000L): DataFrame =
    media
      .where(col("kind") === "video" && col("duration_ms").isNotNull)
      .select(col("media_id"), col("duration_ms"),
        explode(sequence(lit(0L), col("duration_ms"), lit(everyMs))).as("frame_ms"))
}
