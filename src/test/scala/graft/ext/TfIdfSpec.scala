package graft.ext

import graft.SparkSpec
import graft.engine.Tables
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.functions._

class TfIdfSpec extends SparkSpec {

  test("tfidf pipeline: vectors sized, stopwords removed, idf weights sane") {
    val docs = Tables.documents(spark, sf0001).limit(200)
    val (model, out) = TextOps.tfidf(docs, "text", numFeatures = 1 << 10)
    val rows = out.select("toks", "toks_clean", "tfidf").collect()
    assert(rows.length == 200)
    rows.foreach { r =>
      val toks = r.getSeq[String](0)
      val clean = r.getSeq[String](1)
      assert(clean.length <= toks.length)
      assert(!clean.contains("the") && !clean.contains("a"))
      val v = r.getAs[Vector](2)
      assert(v.size == (1 << 10))
      assert(v.toArray.forall(_ >= 0.0))
      assert(v.numNonzeros > 0)
    }
    // a ubiquitous token ("scan" appears in most docs) gets a LOWER idf
    // weight than a rare one — check via transforming two synthetic docs
    import spark.implicits._
    val probe = model.transform(Seq("scan scan", "zzzqqqxxx zzzqqqxxx")
      .toDF("text"))
    val Array(common, rare) = probe.select("tfidf").collect()
      .map(_.getAs[Vector](0).toArray.max)
    assert(common < rare || rare == 0.0) // rare term may hash to unseen idf
  }

  test("tfidf model persists and reloads") {
    val docs = Tables.documents(spark, sf0001).limit(50)
    val (model, _) = TextOps.tfidf(docs, "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-tfidf")
      .toString + "/m"
    model.write.overwrite().save(dir)
    val loaded = org.apache.spark.ml.PipelineModel.load(dir)
    val a = model.transform(docs).select("tfidf").collect()
      .map(_.getAs[Vector](0))
    val b = loaded.transform(docs).select("tfidf").collect()
      .map(_.getAs[Vector](0))
    assert(a.zip(b).forall { case (x, y) => x == y })
  }
}
