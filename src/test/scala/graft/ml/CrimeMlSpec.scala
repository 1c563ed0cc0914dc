package graft.ml

import graft.SparkSpec
import graft.engine.{CrimeEtl, CrimeFixture}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.functions._

/** The reference's entry point 2 (`python xgboost_model.py`, SURVEY.md
  * §3.2) reproduced end-to-end on the crime-shaped fixture: dirty strings →
  * cleaned/engineered → 18-feature contract → weighted multiclass forest. */
class CrimeMlSpec extends SparkSpec {

  private lazy val prepared = CrimeEtl.prepare(CrimeFixture.raw(spark))
  private lazy val fitted = CrimeMl.fit(prepared, cutoffYear = 2003)

  test("null Beats survive cleaning and are fill-0'd before assembly " +
    "(XGBoost.py:232-233 residual fillna)") {
    val nullBeats = prepared.filter(col("Beat").isNull).count()
    assert(nullBeats > 0, "fixture must produce post-cleaning null Beats")
    val (_, train, test) = fitted // would throw in VectorAssembler if unfilled
    assert(train.filter(col("Beat").isNull).count() == 0)
    assert(test.filter(col("Beat").isNull).count() == 0)
  }

  test("18-feature contract: vector arity matches the reference exactly") {
    val (model, _, test) = fitted
    assert(CrimeMl.FeatureCols.length == 18) // XGBoost.py:195-202
    val v = model.transform(test).select("features").head()
      .getAs[Vector](0)
    assert(v.size == 18) // Stramlit_app.py:135 serve-time assert
  }

  test("train-only densities and leakage-free split on crime data") {
    val (_, train, test) = fitted
    assert(train.select(max(col("d_year"))).head().getInt(0) <= 2003)
    assert(test.select(min(col("d_year"))).head().getInt(0) == 2004)
    // a district absent from train gets density 0 in test, never a count
    val trainDistricts = train.select("District").distinct()
    val leaked = test.join(trainDistricts, Seq("District"), "left_anti")
      .filter(col("District_Crime_Count") =!= 0).count()
    assert(leaked == 0)
  }

  test("predictions land in the 4-class space; weights clipped") {
    val (model, train, test) = fitted
    val preds = model.transform(test)
    assert(preds.count() > 0)
    val labels = Evaluation.labelMapping(model).map(_._2).toSet
    assert(labels.subsetOf(Set("PROPERTY_CRIME", "VIOLENT_CRIME",
      "DRUG_CRIME", "OTHER")))
    val w = train.select("weight").distinct().collect().map(_.getDouble(0))
    assert(w.forall(v => v >= 0.1 && v <= 5.0))
  }

  test("unseen Location Description at serve time → handleInvalid=keep") {
    val (model, _, test) = fitted
    val unseen = test.limit(1)
      .withColumn("Location Description", lit("MOON BASE"))
    val out = model.transform(unseen)
    assert(out.count() == 1) // keep: extra index bucket, no error
    val locIdx = out.select("Location_Index").head().getDouble(0)
    val seenCount = model.stages.head
      .asInstanceOf[org.apache.spark.ml.feature.StringIndexerModel]
      .labelsArray.head.length
    assert(locIdx == seenCount.toDouble) // the reserved unseen bucket
  }
}
