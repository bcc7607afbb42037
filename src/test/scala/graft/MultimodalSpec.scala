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

  test("media pipeline end-to-end: decoded features feed ANN search") {
    import org.apache.spark.sql.functions._
    // 6 media items; 1 and 4 share a payload, 2 and 5 share a payload
    val raw = Seq(
      (1L, "aaaa"), (2L, "bbbb"), (3L, "cccc"),
      (4L, "aaaa"), (5L, "bbbb"), (6L, "dddd"))
      .map { case (id, s) => (id, s.getBytes("UTF-8")) }
      .toDF("id", "bytes")
    val media = Multimodal.fromBinary(raw, "id", "bytes", "image")
    val embeddings = Multimodal.extractFeatures(media)
      .select(col("media_id").as("vec_id"), col("features").as("embedding"))
    val top1 = graft.operators.Similarity.cosineTopK(embeddings, embeddings, k = 1)
      .select("query_id", "nbr_id", "sim")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(top1(1L) === ((4L, 1.0)) && top1(4L) === ((1L, 1.0)))
    assert(top1(2L) === ((5L, 1.0)) && top1(5L) === ((2L, 1.0)))
  }

  private def pngBytes(w: Int, h: Int)(pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixel(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("real PNG decode round-trip: imageFeatures reflect actual pixels") {
    // left half black, right half white → grid columns 0,1 dark / 2,3 bright
    val png = pngBytes(64, 64)((x, _) => if (x < 32) 0x000000 else 0xffffff)
    val df = Seq((1L, png)).toDF("id", "bytes")
    val feats = Multimodal
      .extractFeatures(Multimodal.fromBinary(df, "id", "bytes", "image"))
      .select("features").as[Seq[Float]].head()
    assert(feats.length === Multimodal.MediaCodec.featureDim)
    for (row <- 0 until 4) {
      assert(feats(row * 4) < 0.01f && feats(row * 4 + 1) < 0.01f,
        s"left cells of row $row should be black: $feats")
      assert(feats(row * 4 + 2) > 0.99f && feats(row * 4 + 3) > 0.99f,
        s"right cells of row $row should be white: $feats")
    }
  }

  test("resize on a real PNG re-encodes at the new dimensions") {
    val png = pngBytes(64, 64)((x, y) => if ((x + y) % 2 == 0) 0xff0000 else 0x00ff00)
    val out = Multimodal.MediaCodec.resize(png, 8, 8, "image")
    val back = Multimodal.MediaCodec.readImage(out)
    assert(back != null && back.getWidth === 8 && back.getHeight === 8)
  }

  test("stub features replay the portable md5 formula (oracle contract)") {
    val payload = "payload-one".getBytes("UTF-8")
    val feats = Multimodal.MediaCodec.stubFeatures(payload)
    val residues = (0 until Multimodal.MediaCodec.featureDim).map { d =>
      graft.functions.PortableMd5.hash64(s"payload-one:$d".getBytes("UTF-8")) %
        Multimodal.MediaCodec.FeatureMod
    }
    for (d <- residues.indices)
      assert(feats(d) === residues(d).toFloat / Multimodal.MediaCodec.FeatureMod)
    // the integer digest round-trips through the Float exactly — the
    // media_features oracle depends on this
    val digest = feats.map(x => math.round(x.toDouble * 1000003)).sum
    assert(digest === residues.sum)
  }

  test("real WAV decode: RMS-envelope features reflect actual samples") {
    // mono 16-bit PCM: first half silence, second half full-scale square
    // wave (RMS 1.0) → first 8 windows ~0, last 8 ~1
    val sampleRate = 8000f
    val n = 8000
    val pcm = new Array[Byte](n * 2)
    for (i <- n / 2 until n) {
      val s: Short = if (i % 2 == 0) 32767 else -32767
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray

    val feats = Multimodal
      .extractFeatures(Multimodal.fromBinary(
        Seq((1L, wav)).toDF("id", "bytes"), "id", "bytes", "audio"))
      .select("features").as[Seq[Float]].head()
    assert(feats.length === Multimodal.MediaCodec.featureDim)
    for (w <- 0 until 8) assert(feats(w) < 0.01f, s"window $w should be silent: $feats")
    for (w <- 8 until 16) assert(feats(w) > 0.9f, s"window $w should be loud: $feats")
  }

  test("mixed corpus: images decode real, non-images fall back to stub") {
    val png = pngBytes(16, 16)((_, _) => 0x808080)
    val df = Seq((1L, png), (2L, "not an image".getBytes("UTF-8")))
      .toDF("id", "bytes")
    val feats = Multimodal
      .extractFeatures(Multimodal.fromBinary(df, "id", "bytes", "image"))
      .select("media_id", "features").as[(Long, Seq[Float])].collect().toMap
    // gray image → all cells ≈ 128/255
    assert(feats(1L).forall(f => math.abs(f - 128f / 255f) < 0.01f))
    assert(feats(2L) === Multimodal.MediaCodec.stubFeatures("not an image".getBytes("UTF-8")).toSeq)
  }

  test("classifyMedia sniffs compressed audio/video the decoder cannot handle") {
    def pad(prefix: Array[Byte]): Array[Byte] = prefix ++ Array.fill[Byte](16)(0)
    val mp3Id3 = pad("ID3".getBytes("ASCII") :+ 4.toByte)
    val mp3Sync = pad(Array(0xff.toByte, 0xfb.toByte, 0x90.toByte))
    val ogg = pad("OggS".getBytes("ASCII"))
    val mp4 = pad(Array[Byte](0, 0, 0, 0x18) ++ "ftypisom".getBytes("ASCII"))
    val webm = pad(Array(0x1a.toByte, 0x45.toByte, 0xdf.toByte, 0xa3.toByte))
    val avi = pad("RIFF0000AVI ".getBytes("ASCII"))
    val garbage = pad("not-a-media-file".getBytes("ASCII"))
    val png = pngBytes(4, 4)((_, _) => 0x808080)
    val raw = Seq(1L -> mp3Id3, 2L -> mp3Sync, 3L -> ogg, 4L -> mp4,
      5L -> webm, 6L -> avi, 7L -> garbage, 8L -> png).toDF("id", "bytes")
    val got = Multimodal.classifyMedia(
      Multimodal.fromBinary(raw, "id", "bytes", "audio"))
      .select("media_id", "format_detected", "kind_detected", "decodable")
      .as[(Long, Option[String], String, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((Some("mp3"), "audio", false)))
    assert(got(2L) === ((Some("mp3"), "audio", false)))
    assert(got(3L) === ((Some("ogg"), "audio", false)))
    assert(got(4L) === ((Some("mp4"), "video", false)))
    assert(got(5L) === ((Some("webm"), "video", false)))
    assert(got(6L) === ((Some("avi"), "video", false)))
    assert(got(7L) === ((None, "unknown", false)))
    // kind_detected comes from the bytes, not the declared kind column —
    // a PNG declared "audio" still classifies image + decodable
    assert(got(8L) === ((Some("png"), "image", true)))
    // recognized-but-undecodable media still takes the stub feature path
    // (routing info is EXTRA columns; decode behavior is unchanged)
    val mp3Feats = Multimodal.extractFeatures(
      Multimodal.fromBinary(Seq(1L -> mp3Id3).toDF("id", "bytes"),
        "id", "bytes", "audio"))
      .select("features").as[Seq[Float]].head()
    assert(mp3Feats === Multimodal.MediaCodec.stubFeatures(mp3Id3).toSeq)
  }

  test("duration probes: mp3 frame headers and mp4 mvhd, no codec involved") {
    import Multimodal.MediaCodec
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    // CBR MPEG1 Layer III @128 kbps (0xFF 0xFB 0x90): 4000 bytes of audio
    // → 4000·8/128 = 250 ms
    val frame1 = Array(0xff.toByte, 0xfb.toByte, 0x90.toByte, 0x00.toByte)
    val mp3Bare = frame1 ++ Array.fill[Byte](3996)(0x55)
    assert(MediaCodec.mp3DurationMs(mp3Bare) === Some(250L))
    // ID3v2 tag (syncsafe size 10) skipped; audio = total − 20 = 1600
    // bytes → 100 ms
    val id3 = "ID3".getBytes("ASCII") ++ Array[Byte](4, 0, 0, 0, 0, 0, 10) ++
      Array.fill[Byte](10)(0x20)
    val mp3Tagged = id3 ++ frame1 ++ Array.fill[Byte](1596)(0x55)
    assert(MediaCodec.mp3DurationMs(mp3Tagged) === Some(100L))
    // MPEG2 Layer III uses the low bitrate table (idx 9 → 80 kbps):
    // 1000 bytes → 100 ms
    val mp3V2 = Array(0xff.toByte, 0xf3.toByte, 0x90.toByte, 0x00.toByte) ++
      Array.fill[Byte](996)(0x55)
    assert(MediaCodec.mp3DurationMs(mp3V2) === Some(100L))
    // garbage after an ID3 prefix (no frame sync) → no duration
    assert(MediaCodec.mp3DurationMs(
      "ID3 plain text that is not audio at all".getBytes("ASCII")) === None)
    // mp4: ftyp + moov{mvhd v0 timescale=1000 duration=5000} → 5000 ms
    def box(name: String, payload: Array[Byte]): Array[Byte] =
      be32(8L + payload.length) ++ name.getBytes("ASCII") ++ payload
    val mvhd0 = box("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
      be32(1000) ++ be32(5000) ++ Array.fill[Byte](80)(0))
    val ftyp = be32(16) ++ "ftypisom".getBytes("ASCII") ++ be32(0)
    val mp4v0 = ftyp ++ box("moov", mvhd0)
    assert(MediaCodec.mp4DurationMs(mp4v0) === Some(5000L))
    // mvhd version 1 (64-bit times): timescale=600, duration=1200 → 2000 ms
    val mvhd1 = box("mvhd", Array[Byte](1, 0, 0, 0) ++
      be32(0) ++ be32(0) ++ be32(0) ++ be32(0) ++ // 64-bit ctime + mtime
      be32(600) ++ be32(0) ++ be32(1200) ++ Array.fill[Byte](80)(0))
    val mp4v1 = ftyp ++ box("moov", mvhd1)
    assert(MediaCodec.mp4DurationMs(mp4v1) === Some(2000L))
    // corrupt box size must bail, not loop or throw
    assert(MediaCodec.mp4DurationMs(ftyp ++ be32(3L) ++
      "moov".getBytes("ASCII")) === None)
    // end-to-end: classifyMedia surfaces the probe in duration_ms_detected
    // for quarantined formats, null for everything else
    val raw = Seq(1L -> mp3Tagged, 2L -> mp4v0, 3L -> ("OggS".getBytes("ASCII") ++
      Array.fill[Byte](16)(0))).toDF("id", "bytes")
    val got = Multimodal.classifyMedia(
      Multimodal.fromBinary(raw, "id", "bytes", "audio"))
      .select("media_id", "format_detected", "duration_ms_detected")
      .as[(Long, Option[String], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((Some("mp3"), Some(100L))))
    assert(got(2L) === ((Some("mp4"), Some(5000L))))
    assert(got(3L) === ((Some("ogg"), None)))
  }

  test("sampleFrames fans out one row per sampled frame") {
    val vids = media
      .withColumn("kind", org.apache.spark.sql.functions.lit("video"))
      .withColumn("duration_ms", org.apache.spark.sql.functions.lit(3000L))
    val frames = Multimodal.sampleFrames(vids, everyMs = 1000L)
    assert(frames.count() === 3 * 4) // 0,1000,2000,3000 per video
  }

  test("decodeFrames: y4m luma planes parse structurally, hand-computed means") {
    import graft.operators.Multimodal.MediaCodec
    // 2x2 Cmono, 3 frames with known luma bytes — the parse must walk
    // header -> FRAME lines -> raw planes and sum real bytes
    def frame(b: Seq[Int]) =
      "FRAME\n".getBytes("ISO-8859-1") ++ b.map(_.toByte).toArray
    val p = "YUV4MPEG2 W2 H2 F25:1 Ip A1:1 Cmono\n".getBytes("ISO-8859-1") ++
      frame(Seq(0, 0, 0, 0)) ++ frame(Seq(255, 255, 255, 255)) ++
      frame(Seq(100, 100, 100, 100))
    val got = Multimodal.decodeFrames(Multimodal.fromBinary(
      Seq((1L, p)).toDF("id", "bytes"), "id", "bytes", "video"))
      .as[(Long, String, Option[Long], Int, Long)].collect().sortBy(_._4)
    assert(got.map(_._2).toSet === Set("y4m"))
    assert(got.map(_._3).toSet === Set(Some(3L)))
    assert(got.map(r => r._4 -> r._5).toSeq ===
      Seq(0 -> 0L, 1 -> 1000000L, 2 -> (100L * 1000000L / 255L)))
    // a truncated stream (header promises a frame it doesn't carry in
    // full) keeps the complete frames and drops the torn tail
    val torn = p.dropRight(2)
    val t = Multimodal.decodeFrames(Multimodal.fromBinary(
      Seq((1L, torn)).toDF("id", "bytes"), "id", "bytes", "video"))
      .as[(Long, String, Option[Long], Int, Long)].collect()
    assert(t.map(_._3).toSet === Set(Some(2L)))
    // garbage with the right magic but no parsable header → stub path
    val junk = "YUV4MPEG2 garbage".getBytes("ISO-8859-1")
    val j = Multimodal.decodeFrames(Multimodal.fromBinary(
      Seq((1L, junk)).toDF("id", "bytes"), "id", "bytes", "video"))
      .as[(Long, String, Option[Long], Int, Long)].collect()
    assert(j.map(_._2).toSet === Set("stub") && j.length === 4)
    assert(j.map(_._5).toSeq === MediaCodec.stubFrameLumas(junk, 4))
  }

  test("decodeFrames: mjpeg counts SOI frames, decodes only the sampled ones") {
    def jpeg(gray: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (gray << 16) | (gray << 8) | gray
      for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    // 6 REAL JPEG frames; maxFrames=4 samples (k*6)//4 = {0,1,3,4}
    val grays = Seq(10, 200, 10, 200, 10, 128)
    val p = grays.map(jpeg).reduce(_ ++ _)
    val got = Multimodal.decodeFrames(Multimodal.fromBinary(
      Seq((1L, p)).toDF("id", "bytes"), "id", "bytes", "video"))
      .as[(Long, String, Option[Long], Int, Long)].collect().sortBy(_._4)
    assert(got.map(_._2).toSet === Set("mjpeg"))
    assert(got.map(_._3).toSet === Set(Some(6L)))
    assert(got.map(_._4).toSeq === Seq(0, 1, 3, 4))
    // decoded luminance of a solid-gray JPEG lands within 2% of gray/255
    got.foreach { r =>
      val expect = grays(r._4) * 1000000L / 255L
      assert(math.abs(r._5 - expect) < 20000L,
        s"frame ${r._4}: luma ${r._5} vs expected ~$expect")
    }
  }

  test("decodeFrames: stub pseudo-frames replay the portable md5 contract") {
    import graft.operators.Multimodal.MediaCodec
    val p = "definitely not a video".getBytes("UTF-8")
    val got = Multimodal.decodeFrames(Multimodal.fromBinary(
      Seq((7L, p)).toDF("id", "bytes"), "id", "bytes", "video"), maxFrames = 3)
      .as[(Long, String, Option[Long], Int, Long)].collect().sortBy(_._4)
    assert(got.map(_._2).toSet === Set("stub"))
    assert(got.map(_._3).toSet === Set(None))
    val expected = (0 until 3).map(f => graft.functions.PortableMd5.hash64(
      p ++ s":f$f".getBytes("UTF-8")) % 1000001L)
    assert(got.map(_._5).toSeq === expected)
  }

  test("perceptualHash: identical images collide, contrasting images differ") {
    // left-dark/right-light vs its copy vs the mirrored gradient — real
    // PNG decodes, so the bits come from actual 4x4 luminance cells
    val grad = pngBytes(64, 64)((x, _) => if (x < 32) 0x000000 else 0xffffff)
    val grad2 = pngBytes(64, 64)((x, _) => if (x < 32) 0x000000 else 0xffffff)
    val mirrored = pngBytes(64, 64)((x, _) => if (x < 32) 0xffffff else 0x000000)
    val df = Seq((1L, grad), (2L, grad2), (3L, mirrored)).toDF("id", "bytes")
    val got = Multimodal.perceptualHash(
      Multimodal.fromBinary(df, "id", "bytes", "image"))
      .as[(Long, Long)].collect().toMap
    assert(got(1L) === got(2L), "identical pixels must share the hash")
    assert(got(1L) !== got(3L), "mirrored gradient must differ")
    // bright-half cells sit above the mean: exactly half the 16 bits set
    assert(java.lang.Long.bitCount(got(1L)) === 8)
  }

  test("phashDupCounts: windowed duplicate accounting over the hash") {
    val a = pngBytes(32, 32)((x, y) => if ((x / 8 + y / 8) % 2 == 0) 0 else 0xffffff)
    val b = pngBytes(32, 32)((x, y) => if ((x / 8 + y / 8) % 2 == 0) 0 else 0xffffff)
    val c = pngBytes(32, 32)((x, _) => if (x < 16) 0 else 0xffffff)
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("id", "bytes")
    val got = Multimodal.phashDupCounts(
      Multimodal.fromBinary(df, "id", "bytes", "image"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 0L))
  }

  test("phashNearPairs: 1-2-bit flipped real images pair where " +
    "phashDupCounts provably misses them") {
    // base: left half bright -> grid cells {2,3} of each row bright, 8
    // bits set. nearOne flips ONE dark grid cell (top-left 16x16 block)
    // to bright; nearTwo flips two. The re-encoded/slightly-edited crawl
    // duplicate shape: hamming 1 and 2 off the base. far = all bits
    // inverted (hamming 8+, never a candidate at maxHamming 3).
    def img(flips: Set[Int]): Array[Byte] = pngBytes(64, 64) { (x, y) =>
      val cell = (y / 16) * 4 + (x / 16)
      val bright = (x >= 32) ^ flips.contains(cell)
      if (bright) 0xffffff else 0x000000
    }
    val df = Seq(
      (1L, img(Set.empty)), (2L, img(Set(0))), (3L, img(Set(0, 4))),
      (4L, pngBytes(64, 64)((x, _) => if (x < 32) 0xffffff else 0x000000)))
      .toDF("id", "bytes")
    val media = Multimodal.fromBinary(df, "id", "bytes", "image")
    // the exact-equality operator sees four distinct hashes: zero dups
    val exact = Multimodal.phashDupCounts(media)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(exact === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
    val near = Multimodal.phashNearPairs(media)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // (1,2) at hamming 1, (1,3) at 2, (2,3) at 1; the mirrored image
    // pairs with nothing (hamming 8/7/6 > 3)
    assert(near === Map((1L, 2L) -> 1L, (1L, 3L) -> 2L, (2L, 3L) -> 1L))
  }

  test("phashNearPairs: band-join output equals the brute-force " +
    "hamming join on the stub path") {
    val df = (0 until 100).map(i =>
      (i.toLong, s"stub-payload-$i".getBytes("UTF-8"))).toDF("id", "bytes")
    val media = Multimodal.fromBinary(df, "id", "bytes", "image")
    val hashes = Multimodal.perceptualHash(media)
      .as[(Long, Long)].collect().sortBy(_._1)
    val brute = (for {
      (a, pa) <- hashes; (b, pb) <- hashes if a < b
      h = java.lang.Long.bitCount(pa ^ pb) if h <= 3
    } yield (a, b, h.toLong)).toSet
    val got = Multimodal.phashNearPairs(media)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === brute)
    // the 16-bit stub codes over 100 payloads land some near pairs by
    // construction (deterministic md5) — the equality above is not
    // vacuous
    assert(brute.nonEmpty)
  }

  test("phashNearPairsWide: the 64-bit code separates what the 16-bit " +
    "code cannot, and brute-force equality holds on the stub path") {
    // one 8x8-grid cell flipped inside a dark 4x4-grid cell: the 16-bit
    // hash is IDENTICAL (the 4x4 cell mean stays under the row mean)
    // while the 64-bit hash differs in exactly that one bit — the finer
    // code distinguishes a near-dup from an exact-dup
    def img(flip: Boolean): Array[Byte] = pngBytes(64, 64) { (x, y) =>
      val bright = x >= 32 || (flip && x < 8 && y < 8)
      if (bright) 0xffffff else 0x000000
    }
    val df = Seq((1L, img(false)), (2L, img(true))).toDF("id", "bytes")
    val media = Multimodal.fromBinary(df, "id", "bytes", "image")
    val narrow = Multimodal.phashNearPairs(media)
      .as[(Long, Long, Long)].collect().toSeq
    assert(narrow === Seq((1L, 2L, 0L)),
      s"16-bit code must see an EXACT duplicate: $narrow")
    val wide = Multimodal.phashNearPairsWide(media)
      .as[(Long, Long, Long)].collect().toSeq
    assert(wide === Seq((1L, 2L, 1L)),
      s"64-bit code must see a 1-bit near-dup: $wide")
    // stub path: banded output equals brute force, and at 64 bits the
    // random md5 codes produce ZERO hamming<=3 collisions across 200
    // payloads — the discrimination the 16-bit code (nonEmpty at 100
    // payloads, see the narrow spec) cannot offer
    val stubs = (0 until 200).map(i =>
      (i.toLong, s"stub-payload-$i".getBytes("UTF-8"))).toDF("id", "bytes")
    val smedia = Multimodal.fromBinary(stubs, "id", "bytes", "image")
    val hashes = Multimodal.perceptualHashWide(smedia)
      .as[(Long, Long)].collect().sortBy(_._1)
    val brute = (for {
      (a, pa) <- hashes; (b, pb) <- hashes if a < b
      h = java.lang.Long.bitCount(pa ^ pb) if h <= 3
    } yield (a, b, h.toLong)).toSet
    val got = Multimodal.phashNearPairsWide(smedia)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === brute)
    assert(brute.isEmpty, "64-bit random codes must not collide at <= 3 bits")
  }

  test("perceptualHashDct survives a gamma shift that breaks the " +
    "mean-threshold aHash (the published pHash robustness claim)") {
    // a textured image — overlapping cosine waves on a gradient, the
    // spectral shape of a natural photo — whose 8x8 cell means cluster
    // around the global mean: exactly where aHash is brittle. The twin
    // is the SAME scene through a gamma-0.6 tone curve (the classic
    // re-encode/display-calibration transform: monotone, nonlinear).
    // broadband texture synthesized IN the DCT block's own frequencies —
    // every one of the 64 block coefficients gets solid magnitude (a
    // natural photo's 1/f spectrum gives the same; a sparse spectrum
    // leaves near-zero coefficients whose signs are noise), plus a mild
    // gradient that parks many 8x8 cell means NEAR the global mean:
    // aHash's brittle zone, where a concave tone curve shifts the
    // mean-crossing and flips whole gradient columns at once
    def lum(x: Int, y: Int): Double = {
      var t = 128.0 + 1.2 * (x - 32)
      for (u <- 0 to 7; v <- 0 to 7; if u + v > 0) {
        val s = if ((u * 5 + v * 3) % 2 == 0) 1.0 else -1.0
        t += 8.0 * s * math.cos(math.Pi * x * u / 64) *
          math.cos(math.Pi * y * v / 64)
      }
      t
    }
    def img(gamma: Double): Array[Byte] = pngBytes(64, 64) { (x, y) =>
      val l0 = math.max(0.0, math.min(255.0, lum(x, y))) / 255.0
      val l = math.round(math.pow(l0, gamma) * 255.0).toInt
      (l << 16) | (l << 8) | l
    }
    val df = Seq((1L, img(1.0)), (2L, img(0.6))).toDF("id", "bytes")
    val media = Multimodal.fromBinary(df, "id", "bytes", "image")
    def hamming(hashes: Map[Long, Long]): Int =
      java.lang.Long.bitCount(hashes(1L) ^ hashes(2L))
    val aWide = hamming(Multimodal.perceptualHashWide(media)
      .as[(Long, Long)].collect().toMap)
    val dct = hamming(Multimodal.perceptualHashDct(media)
      .as[(Long, Long)].collect().toMap)
    assert(aWide > 3,
      s"the gamma twin must flip >maxHamming aHash bits (got $aWide)")
    assert(dct <= 3,
      s"the DCT code must hold within maxHamming (got $dct, aHash $aWide)")
    // and the near-pair operator built on it finds the twin
    val pairs = Multimodal.phashDctNearPairs(media)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs === Seq((1L, 2L, dct.toLong)))
  }

  test("phashDctNearKeep: the gamma-twin family elects its highest-" +
    "variance member (scores from the SAME grid-32 decode pass)") {
    def lum(x: Int, y: Int): Double = {
      var t = 128.0 + 1.2 * (x - 32)
      for (u <- 0 to 7; v <- 0 to 7; if u + v > 0) {
        val s = if ((u * 5 + v * 3) % 2 == 0) 1.0 else -1.0
        t += 8.0 * s * math.cos(math.Pi * x * u / 64) *
          math.cos(math.Pi * y * v / 64)
      }
      t
    }
    def img(gamma: Double): Array[Byte] = pngBytes(64, 64) { (x, y) =>
      val l0 = math.max(0.0, math.min(255.0, lum(x, y))) / 255.0
      val l = math.round(math.pow(l0, gamma) * 255.0).toInt
      (l << 16) | (l << 8) | l
    }
    // the expected quality scores: integer variance of the 32x32
    // residue plane — hand-computed from the same codec the operator
    // decodes through
    def varOf(png: Array[Byte]): BigInt = {
      val f = Multimodal.MediaCodec.imageFeatures(
        Multimodal.MediaCodec.readImage(png), 32)
      val r = f.map(x => BigInt(Math.round(x.toDouble * 1000003)))
      BigInt(1024) * r.map(x => x * x).sum - r.sum * r.sum
    }
    val (v1, v2) = (varOf(img(1.0)), varOf(img(0.6)))
    assert(v1 !== v2, "twins must differ in variance for a real election")
    val expSurv = if (v1 >= v2) 1L else 2L
    val df = Seq((1L, img(1.0)), (2L, img(0.6))).toDF("id", "bytes")
    val media = Multimodal.fromBinary(df, "id", "bytes", "image")
    val out = Multimodal.phashDctNearKeep(media)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    graft.plans.ReleaseRegistry.drain()
    assert(out === Set(
      (1L, 1L, expSurv, 1L == expSurv),
      (2L, 1L, expSurv, 2L == expSurv)),
      s"expected survivor $expSurv (v1=$v1 v2=$v2): $out")
  }

  test("phashDctNearPairs: banded output equals brute force on the stub " +
    "path, and the stub hash replays the integer-DCT formula") {
    val stubs = (0 until 150).map(i =>
      (i.toLong, s"stub-payload-$i".getBytes("UTF-8"))).toDF("id", "bytes")
    val media = Multimodal.fromBinary(stubs, "id", "bytes", "image")
    val hashes = Multimodal.perceptualHashDct(media)
      .as[(Long, Long)].collect().sortBy(_._1)
    val brute = (for {
      (a, pa) <- hashes; (b, pb) <- hashes if a < b
      h = java.lang.Long.bitCount(pa ^ pb) if h <= 3
    } yield (a, b, h.toLong)).toSet
    val got = Multimodal.phashDctNearPairs(media)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === brute)
    // hand-replay of row 0's hash: md5 residues -> staged integer DCT
    // with the shared basis -> lower-median sign bits
    val basis = Multimodal.dctBasis(32)
    val payload = "stub-payload-0".getBytes("UTF-8")
    val feats = Multimodal.MediaCodec.stubFeatures(payload, 1024)
    val want = Multimodal.dctHash(feats, 32, basis)
    assert(hashes.find(_._1 == 0L).map(_._2) === Some(want))
    // the DC coefficient (d = 0) always exceeds the lower median on
    // non-degenerate input: bit 0 set — a structural sanity anchor
    assert((want & 1L) === 1L)
  }

  test("phashNearKeep: the near-dup family elects its SHARPEST member " +
    "(max grid variance, the blur-aware policy)") {
    // black/white grid cells: variance = b(16-b)·r² for b bright cells,
    // maximal at b = 8 — the base image (8 bright) out-sharps its 1-flip
    // (b = 9) and 2-flip (b = 10) near-dup edits, so the election must
    // keep media 1. The mirrored image (also b = 8) pairs with nothing
    // (hamming 8+) and must not appear in the multi-member output.
    def img(flips: Set[Int]): Array[Byte] = pngBytes(64, 64) { (x, y) =>
      val cell = (y / 16) * 4 + (x / 16)
      val bright = (x >= 32) ^ flips.contains(cell)
      if (bright) 0xffffff else 0x000000
    }
    val df = Seq(
      (1L, img(Set.empty)), (2L, img(Set(0))), (3L, img(Set(0, 4))),
      (4L, pngBytes(64, 64)((x, _) => if (x < 32) 0xffffff else 0x000000)))
      .toDF("id", "bytes")
    val media = Multimodal.fromBinary(df, "id", "bytes", "image")
    val got = Multimodal.phashNearKeep(media)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    graft.plans.ReleaseRegistry.drain()
    assert(got === Set(
      (1L, 1L, 1L, true), (2L, 1L, 1L, false), (3L, 1L, 1L, false)),
      s"family {1,2,3} must keep the sharpest (base) member: $got")
  }

  test("phashNearPairs: maxBucket drops degenerate buckets (flat-image " +
    "stop-hash cap)") {
    val same = pngBytes(32, 32)((x, _) => if (x < 16) 0 else 0xffffff)
    val df = (1L to 5L).map(i => (i, same)).toDF("id", "bytes")
    val media = Multimodal.fromBinary(df, "id", "bytes", "image")
    assert(Multimodal.phashNearPairs(media).count() === 10L) // C(5,2), hamming 0
    assert(Multimodal.phashNearPairs(media, maxBucket = 4).count() === 0L)
  }

  test("imageQuality: flat real frame flags is_flat, contrast frame does not") {
    val flat = pngBytes(32, 32)((_, _) => 0x808080)
    val contrast = pngBytes(32, 32)((x, _) => if (x < 16) 0 else 0xffffff)
    val df = Seq((1L, flat), (2L, contrast)).toDF("id", "bytes")
    val got = Multimodal.imageQuality(
      Multimodal.fromBinary(df, "id", "bytes", "image"))
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 === 0L && got(1L)._4, "solid fill must read flat")
    assert(got(2L)._2 > 0L && !got(2L)._4)
    // half-black/half-white grid: mean residue sits near the midpoint of
    // the two cell values (8 cells each) — sanity, not exactness
    assert(got(2L)._3 > 0L)
  }

  test("perceptualHash stub path matches the hand-computed md5 residue bits") {
    val payload = "definitely not an image".getBytes("UTF-8")
    val df = Seq((9L, payload)).toDF("id", "bytes")
    val got = Multimodal.perceptualHash(
      Multimodal.fromBinary(df, "id", "bytes", "image"))
      .as[(Long, Long)].collect().head._2
    // independent replay: rv_d = md5_60bit(payload ++ ":d") % 1000003,
    // bit d set iff rv_d * 16 > sum(rv)
    val rv = (0 until 16).map { d =>
      graft.functions.PortableMd5.hash64(
        payload ++ s":$d".getBytes("UTF-8")) % 1000003
    }
    val tot = rv.sum
    val want = rv.zipWithIndex
      .map { case (r, d) => if (r * 16 > tot) 1L << d else 0L }.sum
    assert(got === want)
  }

  // deterministic pseudo-audio: quadratic integer formula, |s| <= 2000
  private def synthSamples(k: Long, frames: Int, off: Int = 0): Array[Short] =
    Array.tabulate(frames)(t =>
      (((k + 1) * 48271L +
        (t + off + 1).toLong * (t + off + 3).toLong * 163L) % 4001L
        - 2000L).toShort)

  test("audioFingerprint matches a brute-force WHT band-energy replay") {
    import graft.operators.Multimodal.MediaCodec
    val samples = synthSamples(3L, 4 * 64)
    val got = MediaCodec.audioFingerprint(MediaCodec.wavPcm16(samples))
    assert(got != null && got.length === 3) // windows 1..3
    // independent replay: coef(k) = sum_t s(t) * (-1)^popcount(k & t)
    def bandEnergies(w: Int): Array[Long] = {
      val e = new Array[Long](16)
      for (k <- 0 until 64) {
        var c = 0L
        for (t <- 0 until 64) {
          val sign = if (java.lang.Long.bitCount((k & t).toLong) % 2 == 1) -1 else 1
          c += sign * samples(w * 64 + t)
        }
        e(k / 4) += c * c
      }
      e
    }
    val want = (1 until 4).map { w =>
      val e = bandEnergies(w)
      val pe = bandEnergies(w - 1)
      (0 until 15).map { b =>
        (if (e(b) > e(b + 1)) 1L << b else 0L) |
          (if (e(b) - e(b + 1) > pe(b) - pe(b + 1)) 1L << (15 + b) else 0L)
      }.sum
    }
    assert(got === want)
  }

  test("audioDupPairs: a window-trimmed duplicate pairs at one consistent delta") {
    import graft.operators.Multimodal.MediaCodec
    // doc 1 = 5 windows; doc 2 = doc 1 trimmed by exactly one window
    // (the common web-crawl duplicate the whole-clip RMS vector misses);
    // doc 3 = an unrelated signal
    val base = synthSamples(1L, 5 * 64)
    val trimmed = base.drop(64)
    val other = synthSamples(9L, 5 * 64)
    val media = Multimodal.fromBinary(
      Seq((1L, MediaCodec.wavPcm16(base)),
        (2L, MediaCodec.wavPcm16(trimmed)),
        (3L, MediaCodec.wavPcm16(other))).toDF("id", "bytes"),
      "id", "bytes", "audio")
    val pairs = Multimodal.audioDupPairs(media, minMatch = 3)
      .as[(Long, Long, Int, Long)].collect().toSeq
    // trimmed window w == base window w+1, so every trimmed hash
    // (win_idx 1..3) matches base win_idx 2..4: delta = -1, 3 matches
    assert(pairs.contains((1L, 2L, -1, 3L)), s"got $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated signal must not pair: $pairs")
  }

  test("audioSegmentBounds: coherent windows have zero boundaries; a " +
    "pattern transition bounds at its window; exact vs in-memory reduction") {
    import graft.operators.Multimodal.MediaCodec
    // broadband one-window patterns, repeated → windows are identical
    // WITHIN a segment (temporal coherence) and differ across segments
    val pA = synthSamples(1L, 64)
    val pB = synthSamples(9L, 64)
    val flat = Array.fill(4)(pA).flatten
    val transition = (Array.fill(2)(pA) ++ Array.fill(2)(pB)).flatten
    val media = Multimodal.fromBinary(
      Seq((1L, MediaCodec.wavPcm16(flat)),
        (2L, MediaCodec.wavPcm16(transition)),
        (3L, "not audio".getBytes("UTF-8"))).toDF("id", "bytes"),
      "id", "bytes", "audio")
    val got = Multimodal.audioSegmentBounds(media).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) -1 else r.getInt(4))).toMap
    // reference: the same reduction computed in memory from the
    // fingerprint rows (jump = popcount of consecutive-window xor)
    val want = Multimodal.audioFingerprints(media)
      .as[(Long, Boolean, Long, Int, Long)].collect()
      .groupBy(_._1).map { case (id, rows) =>
        val hs = rows.sortBy(_._4)
        val jumps = hs.sliding(2).collect { case Array(a, b) =>
          (b._4, java.lang.Long.bitCount(a._5 ^ b._5).toLong)
        }.toSeq
        val bounds = jumps.filter(_._2 >= 8L)
        id -> ((hs.head._3, bounds.size.toLong,
          if (jumps.isEmpty) 0L else jumps.map(_._2).max,
          bounds.map(_._1).minOption.getOrElse(-1)))
      }
    assert(got === want, s"got $got vs reference $want")
    // semantics: identical windows → no boundary; the segment change is
    // detected AT the first window containing the new pattern
    assert(got(1L)._2 === 0L && got(1L)._4 === -1, s"flat clip: ${got(1L)}")
    assert(got(2L)._2 >= 1L && got(2L)._4 === 2,
      s"transition must bound at window 2: ${got(2L)}")
  }

  test("audioFingerprints: stub path replays the portable md5 contract; " +
    "short real audio emits no windows") {
    import graft.operators.Multimodal.MediaCodec
    val text = "definitely not audio".getBytes("UTF-8")
    val shortWav = MediaCodec.wavPcm16(synthSamples(5L, 64)) // one window
    val got = Multimodal.audioFingerprints(Multimodal.fromBinary(
      Seq((1L, text), (2L, shortWav)).toDF("id", "bytes"),
      "id", "bytes", "audio"))
      .as[(Long, Boolean, Long, Int, Long)].collect().toSeq
    assert(got.forall(_._1 == 1L), "short-but-real audio emits zero rows")
    assert(got.map(_._4).sorted === Seq(0, 1, 2, 3))
    val want = (0 until 4).map(w => graft.functions.PortableMd5.hash64(
      text ++ s":aw$w".getBytes("UTF-8")) % (1L << 30))
    assert(got.sortBy(_._4).map(_._5) === want)
    assert(got.forall(r => !r._2 && r._3 == 4L))
  }

  test("audioQuality: silence windows and clipped samples counted exactly; " +
    "stub path replays the md5 pseudo-stats") {
    import graft.operators.Multimodal.MediaCodec
    // 3 windows: loud (|s|=1000), SILENT (|s|=50 -> E = 64*2500 < 640000),
    // clipped (alternating ±32767) + a 10-sample ragged tail (no window)
    val samples = (Array.fill(64)(1000) ++ Array.fill(64)(50) ++
      Array.tabulate(64)(i => if (i % 2 == 0) 32767 else -32767) ++
      Array.fill(10)(7)).map(_.toShort)
    val text = "not audio".getBytes("UTF-8")
    val got = Multimodal.audioQuality(Multimodal.fromBinary(
      Seq((1L, MediaCodec.wavPcm16(samples)), (2L, text))
        .toDF("id", "bytes"), "id", "bytes", "audio"))
      .as[(Long, Boolean, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val real = got(1L)
    assert(real._2 === true)
    assert(real._3 === 202L, s"n_samples: $real")
    assert(real._4 === 32767L, s"peak: $real")
    assert(real._5 === 64L, s"clipped count: $real")
    assert(real._6 === 3L && real._7 === 1L,
      s"3 full windows, 1 silent: $real")
    val stub = got(2L)
    assert(stub._2 === false)
    val want = (0 until 5).map(d => graft.functions.PortableMd5.hash64(
      text ++ s":aq$d".getBytes("UTF-8")) % 1000003L)
    assert(Seq(stub._3, stub._4, stub._5, stub._6, stub._7) === want)
  }

  // 8x4 Cmono y4m builder for the temporal-fingerprint tests: one byte
  // function per (frame, pixel), all frames complete
  private def y4m(frames: Seq[Int => Int]): Array[Byte] =
    "YUV4MPEG2 W8 H4 F25:1 Ip A1:1 Cmono\n".getBytes("ISO-8859-1") ++
      frames.flatMap(f => "FRAME\n".getBytes("ISO-8859-1") ++
        (0 until 32).map(i => f(i).toByte)).toArray

  test("videoFingerprints: per-frame aHash bits match the hand-computed " +
    "integer rule; stub path replays the portable md5 contract") {
    // frame: bright first half (cells 0..7), dark second half → the
    // exact cross-multiplied compare sets exactly the low 8 bits
    val half = (i: Int) => if (i < 16) 200 else 10
    val p = y4m(Seq(half))
    val text = "definitely not video".getBytes("UTF-8")
    val got = Multimodal.videoFingerprints(Multimodal.fromBinary(
      Seq((1L, p), (2L, text)).toDF("id", "bytes"), "id", "bytes", "video"))
      .as[(Long, Boolean, Long, Int, Long)].collect().toSeq
    val real = got.filter(_._1 == 1L)
    assert(real === Seq((1L, true, 1L, 0, 255L)), s"got $real")
    val stub = got.filter(_._1 == 2L).sortBy(_._4)
    val want = (0 until 4).map(f => graft.functions.PortableMd5.hash64(
      text ++ s":vh$f".getBytes("UTF-8")) % 65536L)
    assert(stub.map(_._5) === want)
    assert(stub.forall(r => !r._2 && r._3 == 4L))
  }

  test("videoDupPairs: a frame-trimmed duplicate pairs at one consistent " +
    "delta; unrelated clips do not pair") {
    // 5 distinct frames; the trimmed copy drops frame 0 — its frame j
    // equals the base's frame j+1, so hashes match at delta −1
    def pix(f: Int)(i: Int): Int = (f * 37 + i * i * 7 + f * i * 3) % 251
    val baseFrames = (0 until 5).map(f => pix(f) _)
    val base = y4m(baseFrames)
    val trimmed = y4m(baseFrames.drop(1))
    val other = y4m((0 until 5).map(f => pix(f + 11) _))
    val pairs = Multimodal.videoDupPairs(Multimodal.fromBinary(
      Seq((1L, base), (2L, trimmed), (3L, other)).toDF("id", "bytes"),
      "id", "bytes", "video"), minMatch = 3)
      .as[(Long, Long, Int, Long)].collect().toSeq
    graft.plans.ReleaseRegistry.drain()
    assert(pairs.contains((1L, 2L, -1, 4L)), s"got $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated clip must not pair: $pairs")
  }

  test("videoSceneCuts: a repeated frame is no cut, an inverted frame is; " +
    "single-shot clips report null first_cut") {
    val bright = (i: Int) => if (i < 16) 200 else 10
    val dark = (i: Int) => if (i < 16) 10 else 200 // complementary bits
    // clip 1: bright, bright, dark → jumps 0 then 16 → one cut at frame 2
    // clip 2: bright, bright → single shot, no cut
    val got = Multimodal.videoSceneCuts(Multimodal.fromBinary(
      Seq((1L, y4m(Seq(bright, bright, dark))),
        (2L, y4m(Seq(bright, bright)))).toDF("id", "bytes"),
      "id", "bytes", "video"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val c1 = got(1L)
    assert(c1.getLong(1) === 3L && c1.getLong(2) === 1L &&
      c1.getLong(3) === 16L && c1.getInt(4) === 2, s"clip 1: $c1")
    val c2 = got(2L)
    assert(c2.getLong(2) === 0L && c2.getLong(3) === 0L && c2.isNullAt(4),
      s"clip 2: $c2")
  }

  test("plan shape: the boundary reductions are shuffle-free " +
    "(one row per clip out of the decode pass, no Exchange)") {
    val media = Multimodal.fromBinary(
      Seq((1L, y4m(Seq((i: Int) => i % 251)))).toDF("id", "bytes"),
      "id", "bytes", "video")
    val vp = Multimodal.videoSceneCuts(media)
      .queryExecution.sparkPlan.toString
    assert(!vp.contains("Exchange"), s"videoSceneCuts must not shuffle:\n$vp")
    val ap = Multimodal.audioSegmentBounds(media)
      .queryExecution.sparkPlan.toString
    assert(!ap.contains("Exchange"),
      s"audioSegmentBounds must not shuffle:\n$ap")
  }

  test("property: videoSceneCuts equals the in-memory reduction over " +
    "random clips (mixed real y4m and stub payloads)") {
    val rnd = new scala.util.Random(21)
    for (_ <- 1 to 3) {
      val clips = (1L to 6L).map { id =>
        if (id % 3 == 0) (id, s"stub payload $id ${rnd.nextInt(99)}"
          .getBytes("UTF-8"))
        else {
          val nf = 2 + rnd.nextInt(4)
          val fns = (0 until nf).map { _ =>
            val s = rnd.nextInt(1000)
            (i: Int) => (s * 37 + i * i * 7 + s * i * 3) % 251
          }
          (id, y4m(fns))
        }
      }
      val media = Multimodal.fromBinary(clips.toDF("id", "bytes"),
        "id", "bytes", "video")
      val got = Multimodal.videoSceneCuts(media).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) -1 else r.getInt(4)))).toMap
      val want = Multimodal.videoFingerprints(media)
        .as[(Long, Boolean, Long, Int, Long)].collect()
        .groupBy(_._1).map { case (id, rows) =>
          val hs = rows.sortBy(_._4)
          val jumps = hs.sliding(2).collect { case Array(a, b) =>
            (b._4, java.lang.Long.bitCount(a._5 ^ b._5).toLong)
          }.toSeq
          val cuts = jumps.filter(_._2 >= 4L)
          id -> ((hs.head._3, cuts.size.toLong,
            if (jumps.isEmpty) 0L else jumps.map(_._2).max,
            cuts.map(_._1).minOption.getOrElse(-1)))
        }
      assert(got === want, s"got $got vs reference $want")
    }
  }

  test("videoFrameHashes: mjpeg decodes EVERY frame — identical frames " +
    "hash equal, a contrasting frame differs") {
    import graft.operators.Multimodal.MediaCodec
    def jpeg(topGray: Int, bottomGray: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) {
        val g = if (y < 4) topGray else bottomGray
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val a = jpeg(220, 20)
    val b = jpeg(20, 220) // inverted bands → complementary hash bits
    val got = MediaCodec.videoFrameHashes(a ++ a ++ b, cells = 16)
    assert(got != null)
    val (container, n, hashes) = got
    assert(container === "mjpeg" && n === 3 && hashes.length === 3)
    assert(hashes(0) === hashes(1), s"identical frames must collide: $hashes")
    assert(hashes(0) !== hashes(2), s"contrasting frame must differ: $hashes")
    // top-bright 8x8 over 16 cells = pixels 0..31 bright → low 8 bits
    assert(hashes(0) === 255L, s"hand-computed band hash: $hashes")
  }

  test("mjpeg marker walk: a thumbnail SOI nested in APP1 is not a frame") {
    def jpeg(gray: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (gray << 16) | (gray << 8) | gray
      for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    // inject an APP1 (EXIF-style) segment right after SOI whose payload
    // contains a JPEG SOI triple — the embedded-thumbnail case a raw
    // byte scan miscounts as an extra frame
    def withThumb(p: Array[Byte]): Array[Byte] = {
      val payload = "Exif  ".getBytes("ISO-8859-1") ++
        Array(0xff, 0xd8, 0xff, 0xe0, 0x01, 0x02).map(_.toByte)
      val len = payload.length + 2
      val app1 = Array(0xff.toByte, 0xe1.toByte,
        ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++ payload
      p.take(2) ++ app1 ++ p.drop(2)
    }
    val frames = Seq(withThumb(jpeg(10)), jpeg(200), withThumb(jpeg(128)))
    val p = frames.reduce(_ ++ _)
    val got = Multimodal.decodeFrames(Multimodal.fromBinary(
      Seq((1L, p)).toDF("id", "bytes"), "id", "bytes", "video"))
      .as[(Long, String, Option[Long], Int, Long)].collect()
    assert(got.map(_._2).toSet === Set("mjpeg"))
    assert(got.map(_._3).toSet === Set(Some(3L)),
      s"thumbnail SOIs must not inflate the frame count: ${got.toSeq}")
    assert(got.map(_._4).sorted.toSeq === Seq(0, 1, 2))
  }
}
