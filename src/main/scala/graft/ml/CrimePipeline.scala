package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.RandomForestClassifier
import org.apache.spark.ml.feature.{StringIndexer, VectorAssembler}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine._

/** The reference's ML pipeline (SURVEY.md §2.11, `XGBoost.py`) re-homed
  * fully distributed over the fixture tables: label = 4-class category of
  * p_type; features mirror the reference's 18-feature recipe (temporal
  * extracts, cyclic encoding, count-encoding densities, string index).
  *
  * Key restructure vs the reference (SURVEY.md §3.2): no collect-to-driver
  * boundary — StringIndexer → weight join → VectorAssembler →
  * RandomForestClassifier all run on executors; only the fitted model
  * (KB-scale) reaches the driver. RandomForest replaces XGBoost (no
  * xgboost4j offline; the reference's own first model family,
  * `README.md:118-121`); class weights go in as a `weightCol` instead of a
  * per-row numpy array (`XGBoost.py:247-257`).
  *
  * Leakage discipline (`XGBoost.py:156,168-187`): indexers and density
  * counts are fitted on TRAIN only; test rows get `handleInvalid="keep"`
  * indices and 0-filled densities.
  */
object CrimePipeline {

  val LabelCol = "category"
  val FeatureCols: Seq[String] = Seq(
    "d_year", "d_month", "d_dow", "month_sin", "month_cos",
    "l_quantity", "l_extendedprice", "l_discount", "p_size",
    "p_retailprice", "supp_density", "part_density", "brand_idx")

  /** The ONE feature block shared by training ([[base]]) and serving
    * ([[Serve.predictOne]]) — a single definition is the train/serve-parity
    * guarantee (the reference's riskiest flaw was this logic duplicated in
    * a second language, `Stramlit_app.py:123-136`). */
  def engineerFeatures(df: DataFrame): DataFrame =
    Features.withTemporal(
      df.withColumn(LabelCol, Features.category4(col("p_type"))),
      "l_shipdate")
      .withColumn("month_sin", sin(radians(col("d_month") * 30)))
      .withColumn("month_cos", cos(radians(col("d_month") * 30)))

  /** Labeled, feature-engineered frame from lineitem ⋈ part. */
  def base(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    engineerFeatures(
      li.join(broadcast(p), li("l_partkey") === p("p_partkey")))
  }

  /** Time-based split (`XGBoost.py:139-140`): train ≤ cutoff, test after. */
  def split(df: DataFrame, cutoffYear: Int): (DataFrame, DataFrame) =
    (df.filter(col("d_year") <= cutoffYear),
      df.filter(col("d_year") > cutoffYear))

  /** Attach train-only density features (count encodings) to any frame. */
  def withDensities(target: DataFrame, train: DataFrame): DataFrame = {
    val d1 = Density.attachCount(target, train.select("l_suppkey"),
      "l_suppkey", "supp_density")
    Density.attachCount(d1, train.select("l_partkey"),
      "l_partkey", "part_density")
  }

  /** Inverse-frequency class-weight table clipped to [0.1, 5.0]
    * (`XGBoost.py:247-257`): n_classes rows, computed ONCE per training
    * run and broadcast to every consumer. */
  def classWeightTable(train: DataFrame, labelCol: String): DataFrame = {
    val counts = train.groupBy(labelCol).agg(count(lit(1)).as("cls_n"))
    val total = train.count().toDouble
    val nClasses = counts.count().toDouble
    counts.withColumn("weight",
      least(lit(5.0), greatest(lit(0.1),
        lit(total) / (lit(nClasses) * col("cls_n")))))
      .select(col(labelCol), col("weight"))
  }

  /** Attach a precomputed weight table as a weightCol (broadcast). */
  def attachWeights(df: DataFrame, weights: DataFrame,
      labelCol: String): DataFrame =
    df.join(broadcast(weights), Seq(labelCol), "left")
      .na.fill(1.0, Seq("weight"))

  def withClassWeights(df: DataFrame, train: DataFrame): DataFrame =
    attachWeights(df, classWeightTable(train, LabelCol), LabelCol)

  /** The Pipeline: brand StringIndexer (freq-ordered, handleInvalid=keep,
    * M1) → label StringIndexer (M2) → VectorAssembler (M9) →
    * weighted RandomForest (M5 stand-in). */
  def pipeline(seed: Long = 42L, numTrees: Int = 30): Pipeline = {
    val brandIndexer = new StringIndexer()
      .setInputCol("p_brand").setOutputCol("brand_idx")
      .setStringOrderType("frequencyDesc")
      .setHandleInvalid("keep")
    val labelIndexer = new StringIndexer()
      .setInputCol(LabelCol).setOutputCol("label")
      .setStringOrderType("frequencyDesc")
      .setHandleInvalid("error")
    val assembler = new VectorAssembler()
      .setInputCols(FeatureCols.toArray).setOutputCol("features")
    val rf = new RandomForestClassifier()
      .setLabelCol("label").setFeaturesCol("features")
      .setWeightCol("weight")
      .setNumTrees(numTrees).setMaxDepth(7).setSeed(seed)
    new Pipeline().setStages(Array(brandIndexer, labelIndexer, assembler, rf))
  }

  /** Boosted-trees variant (M5's gradient-boosting parity path,
    * SURVEY.md §7.5.1): MLlib's GBTClassifier is binary-only, so multiclass
    * goes through OneVsRest. Early stopping (M10, `XGBoost.py:296`) has no
    * exact MLlib analogue; the closest surface — exercised when
    * `validationIndicatorCol` is set — is GBT's validationIndicatorCol +
    * validationTol, which stops adding trees once validation-loss
    * improvement drops below the tolerance (documented semantic gap:
    * per-binary-problem validation rather than global multiclass
    * mlogloss). */
  def boostedPipeline(seed: Long = 42L, maxIter: Int = 20,
      validationIndicatorCol: Option[String] = None,
      validationTol: Double = 0.01): Pipeline = {
    import org.apache.spark.ml.classification.{GBTClassifier, OneVsRest}
    val brandIndexer = new StringIndexer()
      .setInputCol("p_brand").setOutputCol("brand_idx")
      .setStringOrderType("frequencyDesc").setHandleInvalid("keep")
    val labelIndexer = new StringIndexer()
      .setInputCol(LabelCol).setOutputCol("label")
      .setStringOrderType("frequencyDesc").setHandleInvalid("error")
    val assembler = new VectorAssembler()
      .setInputCols(FeatureCols.toArray).setOutputCol("features")
    val gbt = new GBTClassifier()
      .setLabelCol("label").setFeaturesCol("features")
      .setWeightCol("weight")
      .setMaxIter(maxIter).setMaxDepth(5).setStepSize(0.1).setSeed(seed)
    validationIndicatorCol.foreach { c =>
      // validationTol has no dedicated setter on GBTClassifier
      gbt.setValidationIndicatorCol(c).set(gbt.validationTol, validationTol)
    }
    val ovr = new OneVsRest().setClassifier(gbt)
      .setLabelCol("label").setFeaturesCol("features")
      .setWeightCol("weight")
    new Pipeline().setStages(Array(brandIndexer, labelIndexer, assembler, ovr))
  }

  /** GLOBAL early stopping for the boosted variant (M10,
    * `XGBoost.py:291-298`): the reference monitors one GLOBAL multiclass
    * validation mlogloss per boosting round and keeps the best round;
    * GBT's `validationIndicatorCol` (the other M10 surface, exercised in
    * MlSpec) stops each OneVsRest binary problem independently. This
    * measured analogue restores the global criterion:
    *
    *  1. fit OneVsRest(GBT) ONCE at `maxIter` trees;
    *  2. per class c, score the validation rows with
    *     `evaluateEachIteration` — the per-round binary validation loss
    *     curve from a single trained model (no ladder retraining);
    *  3. the global round-i criterion is Σ_c loss_c(i) — the OneVsRest
    *     total validation objective (documented approximation: the sum of
    *     binary logistic losses, not softmax mlogloss; the softmax
    *     validation mlogloss of the PICKED model is reported via
    *     [[Evaluation.ovrLogLoss]]);
    *  4. pick the EARLIEST round minimizing the criterion (the
    *     reference's best_iteration tie rule) and refit at that tree
    *     count (MLlib models cannot be truncated in place).
    *
    * Returns (bestRound, global per-round validation curve, model fitted
    * at bestRound). Cost: 2 fits + |classes| curve evaluations — vs the
    * reference's 1 fit, the price of the OneVsRest decomposition. */
  def globalEarlyStopping(train: DataFrame, validation: DataFrame,
      maxIter: Int = 20, seed: Long = 42L)
      : (Int, Seq[Double], PipelineModel) = {
    import org.apache.spark.ml.classification.{GBTClassificationModel, OneVsRestModel}
    val full = boostedPipeline(seed = seed, maxIter = maxIter).fit(train)
    // featurize validation through every stage but the classifier
    val featured = full.stages.init
      .foldLeft(validation)((df, st) => st.transform(df))
      .localCheckpoint(eager = true) // scored |classes| times
    val ovr = full.stages.last.asInstanceOf[OneVsRestModel]
    val curves = ovr.models.zipWithIndex.map { case (m, c) =>
      val g = m.asInstanceOf[GBTClassificationModel]
      // evaluateEachIteration resolves the model's OWN column params: the
      // label col is OneVsRest's internal binarized name (mc2b$…), and the
      // weight col rides along because the pipeline trains weighted
      val binary = featured.select(
        col(g.getFeaturesCol),
        when(col("label") === c.toDouble, 1.0).otherwise(0.0)
          .as(g.getLabelCol),
        col(g.getWeightCol))
      g.evaluateEachIteration(binary)
    }
    require(curves.forall(_.length == curves.head.length),
      "per-class curves must align per boosting round")
    val global = curves.transpose.map(_.sum).toSeq
    val best = global.zipWithIndex.minBy { case (v, i) => (v, i) }._2 + 1
    val model =
      if (best == maxIter) full
      else boostedPipeline(seed = seed, maxIter = best).fit(train)
    (best, global, model)
  }

  /** End-to-end fit: engineer → split → train-only stats → weights → fit.
    * Returns (model, train with features, test with features). */
  def fit(spark: SparkSession, dir: String, cutoffYear: Int = 1997)
      : (PipelineModel, DataFrame, DataFrame) = {
    val engineered = base(spark, dir)
    val (trainRaw, testRaw) = split(engineered, cutoffYear)
    trainRaw.cache()
    try {
      val weights = classWeightTable(trainRaw, LabelCol) // computed ONCE
      val train =
        attachWeights(withDensities(trainRaw, trainRaw), weights, LabelCol)
      val test =
        attachWeights(withDensities(testRaw, trainRaw), weights, LabelCol)
      val model = pipeline().fit(train)
      (model, train, test)
    } finally trainRaw.unpersist() // fitted stats are computed; don't pin
  }
}
