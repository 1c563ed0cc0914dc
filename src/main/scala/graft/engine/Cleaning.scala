package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Cleaning kernel — SURVEY.md §2.2-2.3 (sentinel→null, dedup, dropna,
  * fillna, casts, timestamp parse, stray-header filter).
  *
  * All pure narrow transformations (no shuffle) except [[dropDuplicatesAll]],
  * which is a hash-aggregate over the key columns — at 100 TB that is one
  * shuffle on the dedup key, which is the minimum possible work for exact
  * dedup. Everything else stays inside whole-stage codegen.
  */
object Cleaning {

  /** Sentinel strings ("NULL", "", …) → real null, per column
    * (reference `Preprocessing.py:60-64`, `XGBoost.py:53-58`). */
  def sentinelToNull(c: Column, sentinels: Seq[String]): Column =
    when(c.isin(sentinels: _*) || c === "", lit(null)).otherwise(c)

  def sentinelsToNull(df: DataFrame, cols: Seq[String],
      sentinels: Seq[String]): DataFrame =
    df.withColumns(cols.map(c => c -> sentinelToNull(col(c), sentinels)).toMap)

  /** Exact whole-row dedup (`Preprocessing.py:53`, `XGBoost.py:51`) —
    * hash-aggregate on all columns. */
  def dropDuplicatesAll(df: DataFrame): DataFrame = df.dropDuplicates()

  /** Drop rows with nulls in any of `subset` (`Preprocessing.py:82,92`). */
  def dropNullRows(df: DataFrame, subset: Seq[String]): DataFrame =
    df.na.drop(subset)

  /** Constant fill per column (`XGBoost.py:172-187`). */
  def fillConst(df: DataFrame, fills: Map[String, Any]): DataFrame =
    df.na.fill(fills)

  /** Explicit name→type cast map (`Preprocessing.py:103-116`). Garbage
    * strings cast to null (ANSI off for this path ⇒ try_cast semantics). */
  def castColumns(df: DataFrame, casts: Map[String, DataType]): DataFrame =
    df.withColumns(casts.map { case (c, t) => c -> col(c).try_cast(t) })

  /** Stray embedded header row: `filter(col("ID") =!= "ID")`
    * (`Preprocessing.py:70`) generalized to any malformed-row predicate. */
  def dropStrayHeader(df: DataFrame, idCol: String): DataFrame =
    df.filter(col(idCol) =!= idCol)

  /** Strict timestamp parse — fails the task on malformed input
    * (`Preprocessing.py:228-231`). */
  def parseTimestamp(c: Column, pattern: String): Column =
    to_timestamp(c, pattern)

  /** Null-on-failure timestamp parse (`XGBoost.py:80`), typically followed
    * by [[dropNullRows]] (`XGBoost.py:81`). */
  def tryParseTimestamp(c: Column, pattern: String): Column =
    try_to_timestamp(c, lit(pattern))
}
