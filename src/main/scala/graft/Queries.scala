package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine._

/** Registry of oracle-checked queries (SparkEntry.queries / oracleSql).
  *
  * Conventions for driver-compare stability:
  *  - every aggregate/computed column is aliased identically in Spark + SQL;
  *  - every query ends with a deterministic ORDER BY (full tie-break);
  *  - double-typed aggregates over many rows go through exact DECIMAL sums
  *    cast back to DOUBLE, so Spark and DuckDB produce bit-identical values
  *    regardless of accumulation order (see sumExact below).
  */
object Queries {

  /** Exact, order-independent sum of a 2-decimal double column: cast to
    * DECIMAL(18,2), sum (exact integer arithmetic), cast back to DOUBLE.
    * Shuffle-order-proof at any scale. */
  private def sumExact(c: String): org.apache.spark.sql.Column =
    sum(col(c).cast("decimal(18,2)")).cast("double")

  /** q01 — flagship: CASE-WHEN category map → groupBy → count → top-k
    * (`Preprocessing.py:203`, `XGBoost.py:101-114`). lineitem ⋈ broadcast(part):
    * fact-to-dim join stays a BroadcastHashJoin (no shuffle of the fact side)
    * at any scale factor. */
  def flagshipCategoryTopK(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .withColumn("category", Features.category4(col("p_type")))
      .groupBy("category").count()
      .withColumnRenamed("count", "n")
      .orderBy(col("n").desc, col("category"))
      .limit(10)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_flagship_category_topk" -> (flagshipCategoryTopK _)
  )

  val oracles: Map[String, String] = Map(
    "q01_flagship_category_topk" ->
      """SELECT CASE
        |  WHEN p_type IN ('PROMO','ECONOMY') THEN 'BUDGET'
        |  WHEN p_type IN ('LARGE','MEDIUM') THEN 'BULK'
        |  WHEN p_type = 'STANDARD' THEN 'STANDARD'
        |  ELSE 'OTHER' END AS category,
        |  count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY n DESC, category LIMIT 10""".stripMargin
  )
}
