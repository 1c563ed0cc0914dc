package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is an operator from SURVEY.md §2 (or a §7.4
  * extension) expressed Spark-first; [[oracleSql]] carries the equivalent
  * ANSI SQL for the driver's DuckDB compare. Column names/aliases match
  * exactly between the two, and every query is deterministically ordered
  * (full tie-break) so hash comparison is stable.
  */
object SparkEntry {

  /** Flagship query (SURVEY.md §7.2 step 1): the reference's dominant shape —
    * CASE-WHEN category map → groupBy → count → orderBy desc → top-k
    * (`Preprocessing.py:203` + `XGBoost.py:101-114`) — over
    * lineitem ⋈ part (broadcast dim). Driver smoke-checks rows>0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    Queries.flagshipCategoryTopK(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ §7.4 ext). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all ++ ExtQueries.all

  /** [[queries]] in ascending qNN order. Bench and Verify iterate in this
    * order (a plain Map's order is hash-arbitrary) so the shared-scratch
    * OWNER (q55) always runs before its consumers (q88/q108/q125) — the
    * pair→cluster compute cost lands on the query documented as paying
    * it, not on whichever consumer a hash order happened to run first. */
  def orderedQueries: Seq[(String, (SparkSession, String) => DataFrame)] =
    queries.toSeq.sortBy { case (name, _) =>
      name.drop(1).takeWhile(_.isDigit).toInt
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracles ++ ExtQueries.oracles
}
