package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sampling & splits — SURVEY.md §2.7.
  *
  * The reference's per-type sample loop (10 jobs, `Preprocessing.py:423-427`)
  * is re-expressed as ONE stratified `sampleBy` pass; the train/test split is
  * the reference's leakage-free complementary time filter
  * (`XGBoost.py:139-140`), which at scale is a partition-prunable predicate
  * (zero shuffle). */
object Sampling {

  /** One-pass stratified Bernoulli sample (replaces the per-stratum loop). */
  def stratified(df: DataFrame, strataCol: String,
      fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(strataCol, fractions, seed)

  /** Complementary time-based split: (train ≤ cutoff year, test = next). */
  def timeSplit(df: DataFrame, ts: Column, cutoffYear: Int)
      : (DataFrame, DataFrame) =
    (df.filter(year(ts) <= cutoffYear), df.filter(year(ts) > cutoffYear))
}
