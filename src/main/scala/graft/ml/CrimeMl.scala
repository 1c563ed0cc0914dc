package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.RandomForestClassifier
import org.apache.spark.ml.feature.{StringIndexer, VectorAssembler}
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import graft.engine.{CrimeEtl, Density, Sampling}

/** The reference's ML pipeline on the crime-shaped table itself, honoring
  * the EXACT 18-feature contract (`XGBoost.py:195-202`; serve-time arity
  * assert `Stramlit_app.py:135`):
  *
  *   District, Community Area, Year, Month, Hour, DayOfWeek, Latitude,
  *   Longitude, Beat, Ward, Hour_sin, Hour_cos, IsWeekend,
  *   Distance_from_center, District_Crime_Count, Beat_Crime_Count,
  *   Community_Crime_Count, Location_Index
  *
  * All stages distributed (SURVEY.md §3.2 restructure): densities and
  * indexers fitted on train only; class weights via weightCol;
  * RandomForest stands in for XGBoost (§7.5.1). */
object CrimeMl {

  val FeatureCols: Seq[String] = Seq(
    "District", "Community Area", "d_year", "d_month", "d_hour", "d_dow",
    "Latitude", "Longitude", "Beat", "Ward", "Hour_sin", "Hour_cos",
    "IsWeekend", "Distance_from_center", "District_Crime_Count",
    "Beat_Crime_Count", "Community_Crime_Count", "Location_Index")

  /** Train-only count-encoding densities (`XGBoost.py:168-187`). */
  def withDensities(target: DataFrame, train: DataFrame): DataFrame = {
    val d1 = Density.attachCount(target, train.select("District"),
      "District", "District_Crime_Count")
    val d2 = Density.attachCount(d1, train.select("Beat"),
      "Beat", "Beat_Crime_Count")
    Density.attachCount(d2, train.select("Community Area"),
      "Community Area", "Community_Crime_Count")
  }

  /** Residual-null fill before assembly (`XGBoost.py:232-233`'s
    * fillna(0) re-homed): Beat etc. can be null after cleaning (only
    * District/coords are drop subsets; only Ward/Community Area are
    * imputed), and VectorAssembler's default handleInvalid="error" would
    * crash on them. */
  def fillResidualNulls(df: DataFrame): DataFrame =
    df.na.fill(0.0, FeatureCols.filterNot(_ == "Location_Index"))

  def pipeline(seed: Long = 42L): Pipeline = {
    val locIndexer = new StringIndexer()
      .setInputCol("Location Description").setOutputCol("Location_Index")
      .setStringOrderType("frequencyDesc")
      .setHandleInvalid("keep") // unseen serve-time locations → extra index
    val labelIndexer = new StringIndexer()
      .setInputCol("Crime_Category").setOutputCol("label")
      .setStringOrderType("frequencyDesc")
    val assembler = new VectorAssembler()
      .setInputCols(FeatureCols.toArray).setOutputCol("features")
    val rf = new RandomForestClassifier()
      .setLabelCol("label").setFeaturesCol("features")
      .setWeightCol("weight")
      .setNumTrees(20).setMaxDepth(7).setSeed(seed)
    new Pipeline().setStages(Array(locIndexer, labelIndexer, assembler, rf))
  }

  /** End-to-end on a prepared frame (CrimeEtl.prepare output): time split
    * at `cutoffYear` (`XGBoost.py:139-140`), train-only stats, fit.
    * Returns (model, train, test). */
  def fit(prepared: DataFrame, cutoffYear: Int = 2003)
      : (PipelineModel, DataFrame, DataFrame) = {
    val (trainRaw, testRaw) =
      Sampling.timeSplit(prepared, col("ts"), cutoffYear)
    // one weight table for both splits (shared CrimePipeline logic)
    val weights = CrimePipeline.classWeightTable(trainRaw, "Crime_Category")
    def prep(df: DataFrame) = fillResidualNulls(
      CrimePipeline.attachWeights(
        withDensities(df, trainRaw), weights, "Crime_Category"))
    val train = prep(trainRaw)
    val test = prep(testRaw)
    val model = pipeline().fit(train)
    (model, train, test)
  }
}
