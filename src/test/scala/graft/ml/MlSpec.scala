package graft.ml

import graft.SparkSpec
import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.functions._

/** Golden ML invariants (SURVEY.md §5.2): stochastic model ⇒ no exact
  * goldens; pinned seed + floors + structural invariants instead. */
class MlSpec extends SparkSpec {

  private lazy val fitted = CrimePipeline.fit(spark, sf0001, cutoffYear = 1997)

  test("pipeline fits; accuracy beats majority-class floor") {
    val (model, _, test) = fitted
    val preds = model.transform(test).cache()
    val acc = Evaluation.accuracy(preds)
    val majority = preds.groupBy("label").count()
      .agg(max("count")).head().getLong(0).toDouble / preds.count()
    assert(acc >= majority - 0.02,
      s"acc=$acc should not be below majority=$majority")
    assert(preds.count() > 0)
  }

  test("feature vector arity matches the declared contract") {
    val (model, _, test) = fitted
    val v = model.transform(test).select("features").head()
      .getAs[org.apache.spark.ml.linalg.Vector](0)
    assert(v.size == CrimePipeline.FeatureCols.length)
  }

  test("per-class report: support sums to test size; metrics in [0,1]") {
    val (model, _, test) = fitted
    val preds = model.transform(test)
    val report = Evaluation.perClassReport(preds).collect()
    assert(report.map(_.getAs[Long]("support")).sum == preds.count())
    assert(report.forall { r =>
      Seq("precision", "recall", "f1").forall { m =>
        val v = r.getAs[Double](m); v >= 0.0 && v <= 1.0 }
    })
  }

  test("class weights are clipped to [0.1, 5.0] and train-derived") {
    val (_, train, _) = fitted
    val w = train.select("weight").distinct().collect().map(_.getDouble(0))
    assert(w.forall(v => v >= 0.1 && v <= 5.0))
  }

  test("label mapping round-trips through persistence") {
    val (model, _, test) = fitted
    val dir = java.nio.file.Files.createTempDirectory("graft-model")
      .toString + "/m"
    model.write.overwrite().save(dir)
    val loaded = PipelineModel.load(dir)
    assert(Evaluation.labelMapping(loaded) == Evaluation.labelMapping(model))
    val a = model.transform(test).select("prediction")
      .collect().map(_.getDouble(0)).toSeq
    val b = loaded.transform(test).select("prediction")
      .collect().map(_.getDouble(0)).toSeq
    assert(a == b)
  }

  test("label mapping JSON sink/source round-trip (S4/S8)") {
    import spark.implicits._
    val (model, _, _) = fitted
    val mapping = Evaluation.labelMapping(model)
    val dir = java.nio.file.Files.createTempDirectory("graft-labels")
      .toString + "/labels"
    mapping.toDF("idx", "label").coalesce(1)
      .write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
      .select("idx", "label").as[(Long, String)].collect()
      .map { case (i, l) => (i.toInt, l) }.sortBy(_._1).toSeq
    assert(back == mapping.sortBy(_._1))
  }

  test("CSV scan surface (S1): header, explicit schema, no inference") {
    val docs = graft.engine.Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "n_chars").limit(100)
    val dir = java.nio.file.Files.createTempDirectory("graft-csv")
      .toString + "/docs"
    docs.write.mode("overwrite").option("header", "true").csv(dir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_chars",
        org.apache.spark.sql.types.LongType)))
    val back = spark.read.option("header", "true").schema(schema).csv(dir)
    assert(back.schema == schema)
    assert(back.count() == 100)
    assert(back.collect().toSet == docs.collect().toSet)
  }

  test("feature importances: non-negative, sum ≈ 1, all features named") {
    val (model, _, _) = fitted
    val imp = Evaluation.featureImportances(model)
    assert(imp.length == CrimePipeline.FeatureCols.length)
    assert(imp.forall(_._2 >= 0.0))
    assert(math.abs(imp.map(_._2).sum - 1.0) < 1e-6)
  }

  test("train/serve parity: single-row serve equals batch transform") {
    val (model, train, test) = fitted
    // note: no label/category column — serving derives it from p_type
    val rawCols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
      "l_extendedprice", "l_discount", "l_shipdate", "p_brand", "p_size",
      "p_retailprice", "p_type")
    val oneRaw = test.select(rawCols.map(col): _*).limit(1)
    val served = Serve.predictOne(spark, model, oneRaw, train)
      .select("prediction").head().getDouble(0)
    val batch = model.transform(test.limit(1))
      .select("prediction").head().getDouble(0)
    assert(served == batch)
  }

  test("boosted variant (OneVsRest GBT) fits and predicts all classes") {
    val (_, train, test) = fitted
    val model = CrimePipeline.boostedPipeline(maxIter = 5).fit(train)
    val preds = model.transform(test)
    val acc = Evaluation.accuracy(preds)
    val majority = preds.groupBy("label").count()
      .agg(max("count")).head().getLong(0).toDouble / preds.count()
    assert(acc >= majority - 0.05, s"acc=$acc majority=$majority")
    assert(preds.select("prediction").distinct().count() >= 2)
    // importances must work for the OneVsRest(GBT) shape too (regression)
    val imp = Evaluation.featureImportances(model)
    assert(imp.length == CrimePipeline.FeatureCols.length)
    assert(math.abs(imp.map(_._2).sum - 1.0) < 1e-6)
  }

  test("M10 surface: GBT validationIndicatorCol trains within budget " +
      "and predicts") {
    val (_, train, _) = fitted
    // hold out the last train year as the per-binary-problem validation
    // split — the closest MLlib analogue of the reference's early stopping
    val withVal = train.withColumn("is_val", col("d_year") === 1997)
    val model = CrimePipeline.boostedPipeline(maxIter = 5,
      validationIndicatorCol = Some("is_val")).fit(withVal)
    val ovr = model.stages.last
      .asInstanceOf[org.apache.spark.ml.classification.OneVsRestModel]
    val trees = ovr.models.collect {
      case g: org.apache.spark.ml.classification.GBTClassificationModel =>
        g.getNumTrees
    }
    assert(trees.nonEmpty)
    // validation stopping may end a binary problem before maxIter but can
    // never exceed it
    assert(trees.forall(t => t > 0 && t <= 5), trees.mkString(","))
    val preds = model.transform(withVal.filter(col("is_val")))
    assert(preds.count() > 0)
    assert(preds.select("prediction").distinct().count() >= 2)
  }

  test("M10 global early stopping: pick ≤ max, pick is the argmin of the " +
      "global validation curve, curve strictly improves up to the pick") {
    val (_, train, test) = fitted
    val (best, curve, model) =
      CrimePipeline.globalEarlyStopping(train, test, maxIter = 6)
    assert(curve.length == 6)
    assert(best >= 1 && best <= 6)
    // the pick IS the global-criterion minimum…
    assert(curve(best - 1) == curve.min)
    // …and the earliest such round (no prior round ties or beats it) —
    // the validation metric is non-increasing at the pick
    assert(curve.take(best - 1).forall(_ > curve(best - 1)))
    // the refitted model carries exactly `best` trees per binary problem
    val ovr = model.stages.last
      .asInstanceOf[org.apache.spark.ml.classification.OneVsRestModel]
    val trees = ovr.models.collect {
      case g: org.apache.spark.ml.classification.GBTClassificationModel =>
        g.getNumTrees
    }
    assert(trees.nonEmpty && trees.forall(_ == best), trees.mkString(","))
    // the reported metric at the pick: global softmax mlogloss, finite
    val mll = Evaluation.ovrLogLoss(model, test)
    assert(mll > 0.0 && java.lang.Double.isFinite(mll), s"mlogloss=$mll")
  }

  test("no test-leakage: density stats computed from train only") {
    val (_, train, test) = fitted
    // a suppkey present only in test must get density 0 (filled), never >0
    val trainKeys = train.select("l_suppkey").distinct()
    val leaked = test.join(trainKeys, Seq("l_suppkey"), "left_anti")
      .filter(col("supp_density") =!= 0).count()
    assert(leaked == 0)
  }
}
