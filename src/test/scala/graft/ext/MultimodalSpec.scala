package graft.ext

import graft.SparkSpec
import graft.engine.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("media table: payload round-trips the source bytes") {
    val docs = Tables.documents(spark, sf0001).limit(20)
    val media = Multimodal.mediaTable(docs)
    val bad = media.join(docs, "doc_id")
      .filter(decode(col("payload"), "UTF-8") =!= col("text")).count()
    assert(bad == 0)
    assert(media.filter(col("n_bytes") <= 0).count() == 0)
  }

  test("fakeDecode: deterministic, L1-normalized 16-bin histogram") {
    val f1 = Multimodal.fakeDecode("hello world".getBytes("UTF-8"))
    val f2 = Multimodal.fakeDecode("hello world".getBytes("UTF-8"))
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == 16)
    assert(math.abs(f1.sum - 1.0f) < 1e-5)
  }

  test("sampleFrames: frames tile the payload; stride samples correctly") {
    val docs = Tables.documents(spark, sf0001).limit(10)
    val media = Multimodal.mediaTable(docs)
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
