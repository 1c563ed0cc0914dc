package graft.ext

import graft.SparkSpec
import graft.engine.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media table: payloads are REAL WAV containers whose decoded " +
    "samples round-trip the source bytes, and the Catalyst container " +
    "writer is byte-identical to the Scala codec") {
    val docs = Tables.documents(spark, sf0001).limit(20)
    val media = Multimodal.mediaTable(docs)
    // decode(container) == source text, on every row
    val bad = media.join(docs, "doc_id")
      .filter(decode(graft.functions.WavSamples
        .wav_samples(col("payload")), "UTF-8") =!= col("text")).count()
    assert(bad == 0)
    assert(media.filter(col("n_bytes") <= 0).count() == 0)
    // container anatomy: RIFF magic, 44-byte header + content + pad
    assert(media
      .filter(substring(col("payload"), 1, 4) =!=
        lit("RIFF".getBytes("US-ASCII"))).count() == 0)
    assert(media.filter(length(col("payload")) =!=
      col("n_bytes") + 44 + pmod(col("n_bytes"), lit(2))).count() == 0)
    // the two writers cannot drift: Catalyst bytes == Scala bytes
    media.join(docs, "doc_id").select(col("payload"), col("text"))
      .as[(Array[Byte], String)].collect().foreach { case (p, t) =>
        assert(p.toSeq ==
          graft.functions.WavCodecUtil.encode(t.getBytes("UTF-8")).toSeq)
      }
  }

  test("WavCodec: encode/decode round-trips (odd, even, empty), and a " +
    "HAND-WRITTEN container with a foreign chunk decodes via real " +
    "chunk walking — not a fixed-offset strip") {
    import graft.functions.WavCodecUtil
    for (n <- Seq(0, 1, 2, 7, 100, 101)) {
      val samples = Array.tabulate[Byte](n)(i => (i * 37 + 5).toByte)
      val wav = WavCodecUtil.encode(samples)
      assert(wav.length == 44 + n + (n & 1)) // canonical header + pad
      assert(WavCodecUtil.samples(wav).toSeq == samples.toSeq)
    }
    // hand-written fixture: RIFF( WAVE fmt [LIST junk] data ) — the
    // LIST chunk (odd-sized, so padded) sits BETWEEN fmt and data;
    // only a parser that actually walks chunks finds the samples
    def le32(v: Int) = Array[Byte]((v & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 24) & 0xFF).toByte)
    def le16(v: Int) = Array[Byte]((v & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte)
    val data = "abcde".getBytes("US-ASCII") // 5 samples, odd
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(8000) ++ le32(8000) ++ le16(1) ++
      le16(8)
    val junk = "LIST".getBytes("US-ASCII") ++ le32(3) ++
      Array[Byte](9, 9, 9, 0) // odd size 3 + pad byte
    val dataCk = "data".getBytes("US-ASCII") ++ le32(5) ++ data ++
      Array[Byte](0) // odd size 5 + pad byte
    val body = "WAVE".getBytes("US-ASCII") ++ fmt ++ junk ++ dataCk
    val handWritten = "RIFF".getBytes("US-ASCII") ++
      le32(body.length) ++ body
    assert(WavCodecUtil.samples(handWritten).toSeq == data.toSeq)
    // malformed inputs fail LOUDLY with the reason
    def rejects(bytes: Array[Byte], why: String): Unit = {
      val e = intercept[Exception](WavCodecUtil.samples(bytes))
      assert(e.getMessage.contains(why), e.getMessage)
    }
    rejects("JUNKJUNKJUNK".getBytes("US-ASCII"), "not a RIFF file")
    rejects("RIFF".getBytes("US-ASCII") ++ le32(999) ++
      "WAVE".getBytes("US-ASCII"), "size field")
    val good = WavCodecUtil.encode("hello".getBytes("US-ASCII"))
    rejects(good.dropRight(3), "size field") // truncated file
    val stereo = good.clone(); stereo(22) = 2 // channels = 2
    rejects(stereo, "unsupported WAV profile")
    rejects("RIFF".getBytes("US-ASCII") ++ le32(4 + fmt.length) ++
      "WAVE".getBytes("US-ASCII") ++ fmt, "no data chunk")
  }

  test("byteHistogram: deterministic, L1-normalized 16-bin histogram") {
    val f1 = Multimodal.byteHistogram("hello world".getBytes("UTF-8"))
    val f2 = Multimodal.byteHistogram("hello world".getBytes("UTF-8"))
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == 16)
    assert(math.abs(f1.sum - 1.0f) < 1e-5)
  }

  test("sampleFrames: frames tile the DECODED content; stride samples " +
    "correctly") {
    val docs = Tables.documents(spark, sf0001).limit(10)
    val media = Multimodal.decodeMedia(Multimodal.mediaTable(docs))
    val all = Multimodal.sampleFrames(media, frameBytes = 64, stride = 1)
    // frames tile the payload exactly: byte totals and frame counts match
    val bad = all.groupBy("doc_id")
      .agg(sum("frame_bytes").as("total"), count(lit(1)).as("n_frames"))
      .join(media, "doc_id")
      .filter(col("total") =!= col("n_bytes") ||
        col("n_frames") =!= ceil(col("n_bytes") / 64.0))
      .count()
    assert(bad == 0)
    val sampled = Multimodal.sampleFrames(media, 64, stride = 2)
    val idx = sampled.select("frame_idx").distinct()
      .collect().map(_.getInt(0))
    assert(idx.forall(_ % 2 == 0))
    assert(sampled.count() < all.count())
  }

  test("sampleFramesInContainer == sampleFrames(decodeMedia(...)) " +
    "row-for-row — the container-offset plan slices the SAME frames " +
    "without materializing the decoded copy (q59's r14 plan)") {
    val docs = Tables.documents(spark, sf0001).limit(50)
    val media = Multimodal.mediaTable(docs)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("media_type"), col("frame_idx"),
          hex(col("frame")).as("f"), col("frame_bytes"))
        .as[(Long, String, Int, String, Int)].collect().toSet
    for ((fb, st) <- Seq((64, 2), (64, 1), (7, 3))) {
      val viaDecode = rows(Multimodal.sampleFrames(
        Multimodal.decodeMedia(media), fb, st))
      val viaSpan = rows(Multimodal.sampleFramesInContainer(media, fb, st))
      assert(viaSpan == viaDecode)
      assert(viaSpan.nonEmpty)
    }
  }

  test("WavCodec tolerance: trailing bytes AFTER the RIFF chunk (ID3 " +
    "tags some encoders append) decode fine — the size field bounds " +
    "the walk — while a size field overrunning the buffer still " +
    "fails loudly") {
    import graft.functions.WavCodecUtil
    val content = "hello world".getBytes("US-ASCII")
    val wav = WavCodecUtil.encode(content)
    val tagged = wav ++ "TAG0123456789".getBytes("US-ASCII")
    assert(WavCodecUtil.samples(tagged).toSeq == content.toSeq)
    // the span is identical with or without the trailer (the walk
    // never looks past 8 + riffSize)
    assert(WavCodecUtil.dataSpan(tagged) == WavCodecUtil.dataSpan(wav))
    assert((WavCodecUtil.dataSpan(wav) >>> 32).toInt == 44) // canonical
    assert((WavCodecUtil.dataSpan(wav) & 0xFFFFFFFFL).toInt ==
      content.length)
    // truncation (size field overruns the buffer) still rejects loudly
    val e = intercept[Exception](WavCodecUtil.samples(wav.dropRight(3)))
    assert(e.getMessage.contains("size field"), e.getMessage)
  }

  test("blockhash: hand-computed fingerprints, edit tolerance, " +
    "determinism") {
    import graft.functions.BlockhashUtil.blockhash
    // 4 bytes, 4 blocks of one byte each: means 0,0,255,255 vs overall
    // mean 127.5 → bits 2 and 3 set → fp = 0b1100 = 12
    assert(blockhash(Array[Byte](0, 0, -1, -1), 4) == 12L)
    // constant payload: no block mean strictly exceeds the overall
    // mean → fp 0; empty payload → 0 by contract
    assert(blockhash(Array.fill[Byte](64)(7), 32) == 0L)
    assert(blockhash(Array.empty[Byte], 32) == 0L)
    // 8 bytes, 4 blocks of two: block sums 0, 510, 0, 510 → bits 1, 3
    assert(blockhash(
      Array[Byte](0, 0, -1, -1, 0, 0, -1, -1), 4) == 10L)
    // perceptual tolerance: one flipped byte in a 256-byte payload
    // moves at most a couple of block bits, never the majority
    val base = Array.tabulate[Byte](256)(i => (i % 97).toByte)
    val edited = base.clone(); edited(40) = 126
    val ham = java.lang.Long.bitCount(
      blockhash(base, 32) ^ blockhash(edited, 32))
    assert(ham <= 2, s"one-byte edit moved $ham fingerprint bits")
  }

  test("blockhash banding (q237 machinery): pigeonhole recall is EXACT — " +
    "edge-set equality vs the brute-force Hamming join at sf0.001") {
    val media = Multimodal.mediaTable(Tables.documents(spark, sf0001))
    val fps = Multimodal.blockhashFingerprints(media, "doc_id")
      .localCheckpoint(true)
    val banded = Dedup.fingerprintNearDupPairs(fps, 32, 4, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = fps.as("x").join(fps.as("y"),
        col("x.pid") < col("y.pid"))
      .select(col("x.pid"), col("y.pid"),
        bit_count(col("x.fp").bitwiseXOR(col("y.fp"))).cast("int")
          .as("h"))
      .filter(col("h") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute)
    assert(banded.nonEmpty, "fixture should contain near-dup payloads")
    // repartition determinism: same pair set under a different layout
    val shuffled = Dedup.fingerprintNearDupPairs(
      fps.repartition(7), 32, 4, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(shuffled == banded)
  }

  test("cdcChunks: chunks tile the payload exactly; hashes match an " +
    "independent BigInt reference; boundaries are content-defined") {
    import graft.functions.CdcChunkUtil
    val M = BigInt(1000000007L)
    def refHash(bs: Seq[Byte]): Long =
      bs.foldLeft(BigInt(0))((a, b) => (a * 31 + (b & 0xFF)) mod M)
        .toLong
    val rnd = new scala.util.Random(42)
    for (n <- Seq(0, 1, 7, 8, 64, 500, 2000)) {
      val bytes = Array.fill[Byte](n)(rnd.nextInt().toByte)
      val chunks = CdcChunkUtil.chunks(bytes, 8, 64)
      val rows = (0 until chunks.numElements()).map { i =>
        val r = chunks.getStruct(i, 3)
        (r.getInt(0), r.getInt(1), r.getLong(2))
      }
      // tiling: contiguous, positive-length, covering [0, n)
      assert(rows.map(_._2).forall(_ > 0) || n == 0)
      assert(rows.scanLeft(0)((acc, r) => acc + r._2).init ==
        rows.map(_._1))
      assert(rows.map(_._2).sum == n)
      // each chunk hash equals the independent reference
      rows.foreach { case (off, len, h) =>
        assert(h == refHash(bytes.slice(off, off + len).toSeq)) }
    }
  }

  test("cdcChunks shift resistance: prepending bytes preserves most " +
    "chunk hashes (the property fixed-offset frames lack)") {
    import graft.functions.CdcChunkUtil
    def hashes(bytes: Array[Byte]): Seq[Long] = {
      val c = CdcChunkUtil.chunks(bytes, 8, 64)
      (0 until c.numElements()).map(i => c.getStruct(i, 3).getLong(2))
    }
    val rnd = new scala.util.Random(7)
    val base = Array.fill[Byte](4096)(rnd.nextInt().toByte)
    val shifted = Array[Byte](1, 2, 3) ++ base
    val hb = hashes(base)
    val hs = hashes(shifted).toSet
    val kept = hb.count(hs.contains)
    // only the chunks before the first content-defined boundary after
    // the edit can change; everything downstream must survive
    assert(kept >= hb.size - 2,
      s"only $kept of ${hb.size} chunk hashes survived a 3-byte prepend")
    // sanity: the same payload under fixed 64-byte frames keeps NOTHING
    val frames = base.grouped(64).map(g => g.toSeq).toSet
    val shiftedFrames = shifted.grouped(64).map(g => g.toSeq).toSet
    assert(frames.intersect(shiftedFrames).size <= 1)
  }

  test("cdcDedupPairs: identical payloads overlap 1.0; an embedded " +
    "block scores high containment against its container; unrelated " +
    "payloads stay out") {
    val rnd = new scala.util.Random(11)
    def rand(n: Int) = Array.fill[Byte](n)(rnd.nextInt().toByte)
    // 2000-byte block at divisor 32 → ~60 expected boundaries, so the
    // ≤2 edge chunks that can differ never dominate the overlap (a
    // short block can draw an unlucky low-boundary content — seed 11's
    // 600-byte draw had ONE cut — so the spec sizes the block to make
    // the property statistical, not luck)
    val block = rand(2000)
    // content framed in REAL WAV containers — cdcDedupPairs decodes
    // before chunking, so the overlap laws hold on the content
    val media = Seq(
      (0L, rand(300) ++ block ++ rand(300)), // container A
      (1L, rand(300) ++ block ++ rand(300)), // container B (different
                                             // padding, same block)
      (2L, block),                           // the embedded clip
      (3L, rand(2000)))                      // unrelated
      .toDF("doc_id", "payload")
      .withColumn("payload", Multimodal.wavEncode(col("payload")))
    val pairs = Multimodal.cdcDedupPairs(media, "doc_id",
        divisor = 32, threshold = 0.5, maxDf = 100)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    // the clip's interior chunks all live inside both containers: min
    // side is the clip, so containment-style overlap runs high (only
    // the clip's edge chunks can differ)
    assert(pairs.exists { p => p._1 == 0 && p._2 == 2 && p._6 >= 0.5 })
    assert(pairs.exists { p => p._1 == 1 && p._2 == 2 && p._6 >= 0.5 })
    assert(!pairs.exists(p => p._1 == 3 || p._2 == 3))
    // exact duplicates: identical payloads → overlap exactly 1.0
    val dup = Seq((0L, block), (1L, block))
      .toDF("doc_id", "payload")
      .withColumn("payload", Multimodal.wavEncode(col("payload")))
    val dp = Multimodal.cdcDedupPairs(dup, "doc_id",
        divisor = 32, threshold = 0.5, maxDf = 100)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(dp.map(p => (p._1, p._2, p._6)) == Seq((0L, 1L, 1.0)))
  }

  test("extractFeatures: mapPartitions path preserves rows and schema") {
    val docs = Tables.documents(spark, sf0001).limit(50)
    val out = Multimodal.extractFeatures(spark, Multimodal.mediaTable(docs))
    val rows = out.collect()
    assert(rows.length == 50)
    assert(rows.forall(_.features.length == 16))
    assert(rows.forall(r => Seq("image", "audio", "video")
      .contains(r.media_type)))
  }
}
