package graft.ml

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Single-row serving path (SURVEY.md §3.3): the raw input goes through the
  * SAME engine expressions as training (base → densities → pipeline
  * transform) — fixing the reference's riskiest design, hand-duplicated
  * feature math in a second language (`Stramlit_app.py:123-136`).
  */
object Serve {

  /** Score one raw (lineitem ⋈ part)-shaped record. `train` supplies the
    * fitted-statistics frame for density features (train-only discipline).
    * Returns (predicted label string, class probability vector). */
  def predictOne(spark: SparkSession, model: PipelineModel,
      raw: DataFrame, train: DataFrame): DataFrame = {
    // derive the category column from raw features (never required as
    // input): the fitted label indexer runs inside model.transform and
    // needs its input column present, but serving must not demand ground
    // truth — so it is re-derived from p_type through the SAME engine
    // expression the training path uses (CrimePipeline.base)
    val withLabelInput = raw.withColumn(CrimePipeline.LabelCol,
      graft.engine.Features.category4(col("p_type")))
    val engineered = graft.engine.Features
      .withTemporal(withLabelInput, "l_shipdate")
      .withColumn("month_sin", sin(radians(col("d_month") * 30)))
      .withColumn("month_cos", cos(radians(col("d_month") * 30)))
    val withDens = CrimePipeline.withDensities(engineered, train)
      .withColumn("weight", lit(1.0))
    val labels = Evaluation.labelMapping(model).sortBy(_._1).map(_._2)
    val labelArr = array(labels.map(lit): _*)
    model.transform(withDens)
      .withColumn("predicted_category",
        labelArr(col("prediction").cast("int")))
      .select(col("predicted_category"), col("probability"),
        col("prediction"))
  }
}
