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
