package graft

import graft.streaming.MediaStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class MediaStreamsSpec extends SparkSpec {
  import spark.implicits._

  test("incremental phash dup counts over two batches equal batch " +
    "phashDupCounts on the union") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val fixture = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .collect().toSeq.take(12)
      // batch 2 re-ingests two batch-1 payloads under new ids: identical
      // bytes → identical stub features → identical phash, so their
      // buckets MUST count across the batch boundary via carried state
      val copies = Seq((900001L, fixture.head._2), (900002L, fixture(1)._2))
      val b1 = fixture.take(6)
      val b2 = fixture.drop(6) ++ copies
      val mem = MemoryStream[(Long, String)]
      val media = operators.Multimodal.fromBinary(
        mem.toDF().toDF("doc_id", "text"), "doc_id", "text", "image")
      val q = MediaStreams.incrementalPhashDups(media)
        .writeStream.format("memory").queryName("inc_phash_parity")
        .outputMode("append").start()
      try {
        mem.addData(b1: _*); q.processAllAvailable()
        mem.addData(b2: _*); q.processAllAvailable()
        val got = spark.table("inc_phash_parity")
          .as[(Long, Long, Long)].collect().toSeq
        assert(got.size === b1.size + b2.size, "one emission per arrival")
        // per bucket, arrivals were numbered 0,1,…,size-1 whatever the
        // batch boundaries
        got.groupBy(_._2).foreach { case (_, rows) =>
          assert(rows.map(_._3).sorted === rows.indices.map(_.toLong))
        }
        // the bucket's last emission equals the batch answer on the union
        val union = operators.Multimodal.fromBinary(
          (b1 ++ b2).toDF("doc_id", "text"), "doc_id", "text", "image")
        val want = operators.Multimodal.phashDupCounts(union)
          .select("phash", "n_dups").as[(Long, Long)].collect().toSeq
        graft.plans.ReleaseRegistry.drain()
        val wantMax = want.groupBy(_._1).map { case (h, rs) => h -> rs.map(_._2).max }
        val gotMax = got.groupBy(_._2).map { case (h, rs) => h -> rs.map(_._3).max }
        assert(gotMax === wantMax)
        // the re-ingested payloads were counted against batch-1 state
        val copyRows = got.filter(r => r._1 >= 900001L)
        assert(copyRows.size === 2 && copyRows.forall(_._3 >= 1L),
          "cross-batch duplicates must see the carried bucket count")
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("incremental audio matches across batches aggregate to the batch " +
    "dup-pair table on the union") {
    import graft.operators.Multimodal
    import graft.operators.Multimodal.MediaCodec
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      def samples(k: Long, frames: Int, off: Int = 0): Array[Short] =
        Array.tabulate(frames)(t =>
          (graft.functions.PortableMd5.hash64(
            s"am:$k:${t + off}".getBytes("UTF-8")) % 4001L - 2000L).toShort)
      val base = samples(1L, 6 * 64)
      // batch 1: original + unrelated; batch 2: a one-window-trimmed
      // duplicate whose matches must verify against batch-1 STATE
      val b1 = Seq((1L, MediaCodec.wavPcm16(base)),
        (2L, MediaCodec.wavPcm16(samples(9L, 6 * 64))))
      val b2 = Seq((3L, MediaCodec.wavPcm16(base.drop(64))))
      val mem = MemoryStream[(Long, Array[Byte])]
      val media = Multimodal.fromBinary(
        mem.toDF().toDF("doc_id", "payload"), "doc_id", "payload", "audio")
      val q = MediaStreams.incrementalAudioMatches(media)
        .writeStream.format("memory").queryName("inc_audio_matches")
        .outputMode("append").start()
      try {
        mem.addData(b1: _*); q.processAllAvailable()
        mem.addData(b2: _*); q.processAllAvailable()
        // consumer-side pair aggregation over ALL emitted match events
        val got = spark.table("inc_audio_matches")
          .groupBy(col("mediaA").as("media_a"), col("mediaB").as("media_b"),
            (col("wb") - col("wa")).cast("int").as("offset_w"))
          .agg(count(lit(1)).as("n_match"))
          .where(col("n_match") >= 3)
          .as[(Long, Long, Int, Long)].collect().toSet
        val union = Multimodal.fromBinary(
          (b1 ++ b2).toDF("doc_id", "payload"), "doc_id", "payload", "audio")
        val want = Multimodal.audioDupPairs(union, minMatch = 3)
          .as[(Long, Long, Int, Long)].collect().toSet
        graft.plans.ReleaseRegistry.drain()
        assert(got === want, s"stream $got vs batch $want")
        // and the constructed cross-batch duplicate is in there
        assert(got.exists(p => p._1 == 1L && p._2 == 3L),
          s"trimmed re-ingest must pair with the batch-1 original: $got")
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("incremental video matches across batches aggregate to the batch " +
    "dup-pair table on the union") {
    import graft.operators.Multimodal
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      // y4m clips (8x4 Cmono, md5-digest pixel bytes keyed by (fam,
      // absolute frame) — the MediaSoak construction): distinct across
      // families, and trimming whole frames keeps the per-frame hashes
      def y4m(fam: Long, frames: Int, trim: Int = 0): Array[Byte] = {
        val md = java.security.MessageDigest.getInstance("MD5")
        val body = (trim until frames).toArray.flatMap { f =>
          "FRAME\n".getBytes("ISO-8859-1") ++
            md.digest(s"sv:$fam:$f:0".getBytes("UTF-8")) ++
            md.digest(s"sv:$fam:$f:1".getBytes("UTF-8"))
        }
        "YUV4MPEG2 W8 H4 F25:1 Ip A1:1 Cmono\n".getBytes("ISO-8859-1") ++ body
      }
      // batch 1: original (4 frames) + unrelated clip; batch 2: a
      // one-frame-trimmed RE-CUT of the original — its matches must
      // verify against batch-1 STATE (3 shared frames >= minMatch 3)
      val b1 = Seq((1L, y4m(1L, 4)), (2L, y4m(9L, 4)))
      val b2 = Seq((3L, y4m(1L, 4, trim = 1)))
      val mem = MemoryStream[(Long, Array[Byte])]
      val media = Multimodal.fromBinary(
        mem.toDF().toDF("doc_id", "payload"), "doc_id", "payload", "video")
      val q = MediaStreams.incrementalVideoMatches(media)
        .writeStream.format("memory").queryName("inc_video_matches")
        .outputMode("append").start()
      try {
        mem.addData(b1: _*); q.processAllAvailable()
        mem.addData(b2: _*); q.processAllAvailable()
        // consumer-side pair aggregation over ALL emitted match events —
        // exactly the grouping videoDupPairs applies to its bucket join
        val got = spark.table("inc_video_matches")
          .groupBy(col("mediaA").as("media_a"), col("mediaB").as("media_b"),
            (col("wb") - col("wa")).cast("int").as("offset_f"))
          .agg(count(lit(1)).as("n_match"))
          .where(col("n_match") >= 3)
          .as[(Long, Long, Int, Long)].collect().toSet
        val union = Multimodal.fromBinary(
          (b1 ++ b2).toDF("doc_id", "payload"), "doc_id", "payload", "video")
        val want = Multimodal.videoDupPairs(union, minMatch = 3)
          .as[(Long, Long, Int, Long)].collect().toSet
        graft.plans.ReleaseRegistry.drain()
        assert(got === want, s"stream $got vs batch $want")
        // and the constructed cross-batch re-cut is in there, at the
        // consistent frame delta -1
        assert(got.exists(p => p._1 == 1L && p._2 == 3L && p._3 == -1),
          s"trimmed re-ingest must pair with the batch-1 original: $got")
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("incremental video frame-dup counts carry buckets across batches " +
    "(stub and real paths)") {
    import graft.operators.Multimodal
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      // text payloads take the md5 stub-frame path (4 pseudo-frames each);
      // batch 2 re-ingests a batch-1 payload byte-identically — its four
      // frame hashes must count against carried batch-1 state
      val b1 = Seq((1L, "video payload alpha".getBytes("UTF-8")),
        (2L, "video payload beta".getBytes("UTF-8")))
      val b2 = Seq((3L, "video payload alpha".getBytes("UTF-8")))
      val mem = MemoryStream[(Long, Array[Byte])]
      val media = Multimodal.fromBinary(
        mem.toDF().toDF("doc_id", "payload"), "doc_id", "payload", "video")
      val q = MediaStreams.incrementalVideoFrameDups(media)
        .writeStream.format("memory").queryName("inc_video_parity")
        .outputMode("append").start()
      try {
        mem.addData(b1: _*); q.processAllAvailable()
        mem.addData(b2: _*); q.processAllAvailable()
        val got = spark.table("inc_video_parity")
          .as[(Long, Int, Long, Long)].collect().toSeq
        assert(got.size === 12, s"one emission per stub frame, got $got")
        // per hash bucket, arrivals numbered 0,1,…,size-1 across batches
        got.groupBy(_._3).foreach { case (_, rows) =>
          assert(rows.map(_._4).sorted === rows.indices.map(_.toLong))
        }
        // the re-ingested payload's frames all landed in populated buckets
        val copyRows = got.filter(_._1 == 3L)
        assert(copyRows.size === 4 && copyRows.forall(_._4 >= 1L),
          s"cross-batch frame duplicates must see carried state: $got")
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("incremental phash NEAR-pairs across batches equal batch " +
    "phashNearPairs on the union (modulo cross-band duplicates)") {
    import graft.operators.Multimodal
    def png(flips: Set[Int]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val cell = (y / 16) * 4 + (x / 16)
        val bright = (x >= 32) ^ flips.contains(cell)
        img.setRGB(x, y, if (bright) 0xffffff else 0)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      // batch 1: base image + the mirrored far image; batch 2: a ONE-cell
      // edit of the base (the re-encoded re-upload) — it must pair with
      // batch-1 STATE at hamming 1, plus a same-batch 2-cell edit
      val b1 = Seq((1L, png(Set.empty)), (2L, png((0 until 16).toSet)))
      val b2 = Seq((3L, png(Set(0))), (4L, png(Set(0, 4))))
      val mem = MemoryStream[(Long, Array[Byte])]
      val media = Multimodal.fromBinary(
        mem.toDF().toDF("doc_id", "payload"), "doc_id", "payload", "image")
      val q = MediaStreams.incrementalPhashNearPairs(media)
        .writeStream.format("memory").queryName("inc_phash_near")
        .outputMode("append").start()
      try {
        mem.addData(b1: _*); q.processAllAvailable()
        mem.addData(b2: _*); q.processAllAvailable()
        // consumers dedupe cross-band re-emissions — the batch op's
        // .distinct() applied stream-side
        val got = spark.table("inc_phash_near")
          .as[(Long, Long, Int)].collect().toSet
        val union = Multimodal.fromBinary(
          (b1 ++ b2).toDF("doc_id", "payload"), "doc_id", "payload", "image")
        val want = Multimodal.phashNearPairs(union)
          .as[(Long, Long, Long)].collect()
          .map(t => (t._1, t._2, t._3.toInt)).toSet
        graft.plans.ReleaseRegistry.drain()
        assert(got === want, s"stream $got vs batch $want")
        // the cross-batch near-dup verified against carried state
        assert(got.contains((1L, 3L, 1)),
          s"batch-2 re-upload must pair with the batch-1 original: $got")
        assert(got.contains((3L, 4L, 1)), "same-batch pair considered once")
        assert(!got.exists(p => p._1 == 2L || p._2 == 2L),
          "the mirrored image is hamming 8+ from everything: no pair")
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("incremental WIDE phash near-pairs: two-batch parity with batch " +
    "phashNearPairsWide on the 64-bit code") {
    import graft.operators.Multimodal
    def png(flips: Set[Int]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val cell = (y / 8) * 8 + (x / 8) // 8x8 grid: one px block per bit
        val bright = (x >= 32) ^ flips.contains(cell)
        img.setRGB(x, y, if (bright) 0xffffff else 0)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val b1 = Seq((1L, png(Set.empty)), (2L, png((0 until 64).toSet)))
      val b2 = Seq((3L, png(Set(0))), (4L, png(Set(0, 8))))
      val mem = MemoryStream[(Long, Array[Byte])]
      val media = Multimodal.fromBinary(
        mem.toDF().toDF("doc_id", "payload"), "doc_id", "payload", "image")
      val q = MediaStreams.incrementalPhashNearPairsWide(media)
        .writeStream.format("memory").queryName("inc_phash_near_wide")
        .outputMode("append").start()
      try {
        mem.addData(b1: _*); q.processAllAvailable()
        mem.addData(b2: _*); q.processAllAvailable()
        val got = spark.table("inc_phash_near_wide")
          .as[(Long, Long, Int)].collect().toSet
        val union = Multimodal.fromBinary(
          (b1 ++ b2).toDF("doc_id", "payload"), "doc_id", "payload", "image")
        val want = Multimodal.phashNearPairsWide(union)
          .as[(Long, Long, Long)].collect()
          .map(t => (t._1, t._2, t._3.toInt)).toSet
        graft.plans.ReleaseRegistry.drain()
        assert(got === want, s"stream $got vs batch $want")
        assert(got.contains((1L, 3L, 1)),
          s"batch-2 re-upload must pair against batch-1 state: $got")
        assert(!got.exists(p => p._1 == 2L || p._2 == 2L),
          "the inverted image is hamming 64-ish from everything: no pair")
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("incremental DCT phash near-pairs: two-batch parity with batch " +
    "phashDctNearPairs, cross-batch state carried") {
    import graft.operators.Multimodal
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      // stub path: identical payloads share the DCT hash exactly, and at
      // 64 bits distinct md5 codes never sit within hamming 3 — so the
      // expected pairs are precisely the same-payload ones, including
      // the cross-batch (1,3)/(2,3)
      val b1 = Seq((1L, "grp-a".getBytes("UTF-8")), (2L, "grp-a".getBytes("UTF-8")))
      val b2 = Seq((3L, "grp-a".getBytes("UTF-8")), (4L, "grp-b".getBytes("UTF-8")))
      val mem = MemoryStream[(Long, Array[Byte])]
      val media = Multimodal.fromBinary(
        mem.toDF().toDF("doc_id", "payload"), "doc_id", "payload", "image")
      val q = MediaStreams.incrementalPhashDctNearPairs(media)
        .writeStream.format("memory").queryName("inc_phash_dct")
        .outputMode("append").start()
      try {
        mem.addData(b1: _*); q.processAllAvailable()
        mem.addData(b2: _*); q.processAllAvailable()
        val got = spark.table("inc_phash_dct")
          .as[(Long, Long, Int)].collect().toSet
        val union = Multimodal.fromBinary(
          (b1 ++ b2).toDF("doc_id", "payload"), "doc_id", "payload", "image")
        val want = Multimodal.phashDctNearPairs(union)
          .as[(Long, Long, Long)].collect()
          .map(t => (t._1, t._2, t._3.toInt)).toSet
        graft.plans.ReleaseRegistry.drain()
        assert(got === want, s"stream $got vs batch $want")
        assert(got === Set((1L, 2L, 0), (1L, 3L, 0), (2L, 3L, 0)))
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("phash near-pair bucket overflow TOMBSTONES: the overflowing batch " +
    "and everything after emit nothing (mirror of the batch drop)") {
    import graft.operators.Multimodal
    def png0: Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64)
        img.setRGB(x, y, if (x >= 32) 0xffffff else 0)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      // identical payloads: every row lands in the SAME band buckets.
      // cap 2 — batch 1 fills the bucket exactly (pair emitted), batch 2
      // overflows it (tombstone: no pairs), batch 3 hits the tombstone.
      val mem = MemoryStream[(Long, Array[Byte])]
      val media = Multimodal.fromBinary(
        mem.toDF().toDF("doc_id", "payload"), "doc_id", "payload", "image")
      val q = MediaStreams.incrementalPhashNearPairs(media, maxBucket = 2)
        .writeStream.format("memory").queryName("inc_phash_tomb")
        .outputMode("append").start()
      try {
        mem.addData((1L, png0), (2L, png0)); q.processAllAvailable()
        mem.addData((3L, png0)); q.processAllAvailable()
        mem.addData((4L, png0)); q.processAllAvailable()
        val got = spark.table("inc_phash_tomb")
          .as[(Long, Long, Int)].collect().toSet
        assert(got === Set((1L, 2L, 0)),
          s"only the pre-overflow pair may stand: $got")
        // batch on the union drops the overfull bucket entirely — the
        // documented residual divergence is exactly the pre-overflow pair
        val union = Seq((1L, png0), (2L, png0), (3L, png0), (4L, png0))
        val want = Multimodal.phashNearPairs(
          Multimodal.fromBinary(
            union.toDF("doc_id", "payload"), "doc_id", "payload", "image"),
          maxBucket = 2).count()
        graft.plans.ReleaseRegistry.drain()
        assert(want === 0L, "batch must drop the overfull bucket")
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("incremental audio-window dup counts carry fingerprint buckets " +
    "across batches") {
    import graft.operators.Multimodal.MediaCodec
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      def samples(k: Long, frames: Int, off: Int = 0): Array[Short] =
        Array.tabulate(frames)(t =>
          (((k + 1) * 48271L +
            (t + off + 1).toLong * (t + off + 3).toLong * 163L) % 4001L
            - 2000L).toShort)
      val base = samples(1L, 4 * 64)
      // batch 1: the original + an unrelated signal; batch 2: a
      // one-window-trimmed re-ingest of the original — its windows must
      // count against batch-1 state (the cross-batch duplicate case)
      val b1 = Seq((1L, MediaCodec.wavPcm16(base)),
        (2L, MediaCodec.wavPcm16(samples(7L, 4 * 64))))
      val b2 = Seq((3L, MediaCodec.wavPcm16(base.drop(64))))
      val mem = MemoryStream[(Long, Array[Byte])]
      val media = operators.Multimodal.fromBinary(
        mem.toDF().toDF("doc_id", "payload"), "doc_id", "payload", "audio")
      val q = MediaStreams.incrementalAudioWindowDups(media)
        .writeStream.format("memory").queryName("inc_audio_parity")
        .outputMode("append").start()
      try {
        mem.addData(b1: _*); q.processAllAvailable()
        mem.addData(b2: _*); q.processAllAvailable()
        val got = spark.table("inc_audio_parity")
          .as[(Long, Int, Long, Long)].collect().toSeq
        // 3 + 3 + 2 windows emitted exactly once each
        assert(got.size === 8, s"one emission per window, got $got")
        // per hash bucket, arrivals numbered 0,1,…,size-1 across batches
        got.groupBy(_._3).foreach { case (_, rows) =>
          assert(rows.map(_._4).sorted === rows.indices.map(_.toLong))
        }
        // the trimmed re-ingest (media 3, windows 1..2, matching media
        // 1's windows 2..3) landed in already-populated buckets
        val trimmedRows = got.filter(_._1 == 3L)
        assert(trimmedRows.size === 2 && trimmedRows.forall(_._4 >= 1L),
          s"cross-batch fingerprint duplicates must see carried state: $got")
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("videoSceneCuts and audioSegmentBounds run unchanged at ingest " +
    "(stateless row-local projections), two-batch parity with batch") {
    import graft.operators.Multimodal
    implicit val sqlCtx = spark.sqlContext
    def y4m(fam: Long, frames: Int): Array[Byte] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val body = (0 until frames).toArray.flatMap { f =>
        "FRAME\n".getBytes("ISO-8859-1") ++
          md.digest(s"sc:$fam:$f:0".getBytes("UTF-8")) ++
          md.digest(s"sc:$fam:$f:1".getBytes("UTF-8"))
      }
      "YUV4MPEG2 W8 H4 F25:1 Ip A1:1 Cmono\n".getBytes("ISO-8859-1") ++ body
    }
    val b1 = Seq((1L, y4m(1L, 4)), (2L, "stub one".getBytes("UTF-8")))
    val b2 = Seq((3L, y4m(7L, 3)), (4L, "stub two".getBytes("UTF-8")))
    val mem = MemoryStream[(Long, Array[Byte])]
    val media = Multimodal.fromBinary(
      mem.toDF().toDF("doc_id", "payload"), "doc_id", "payload", "video")
    // the BATCH operator applied directly to the streaming frame — no
    // twin needed: the reduction is row-local inside the decode pass
    val q = Multimodal.videoSceneCuts(media)
      .writeStream.format("memory").queryName("stream_scene_cuts")
      .outputMode("append").start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val got = spark.table("stream_scene_cuts")
        .as[(Long, Long, Long, Long, Option[Int])].collect().toSet
      val want = Multimodal.videoSceneCuts(Multimodal.fromBinary(
          (b1 ++ b2).toDF("doc_id", "payload"), "doc_id", "payload", "video"))
        .as[(Long, Long, Long, Long, Option[Int])].collect().toSet
      assert(got === want, s"stream $got vs batch $want")
      assert(got.map(_._1) === Set(1L, 2L, 3L, 4L))
    } finally q.stop()
  }
}
