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
