package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Derived-column (feature) expressions — the reference's `withColumn`
  * workhorse surface (SURVEY.md §2.2 P3/P6, §2.8).
  *
  * Everything here is a pure Catalyst `Column` expression: codegen-friendly,
  * no UDFs, so the whole feature block stays inside one WholeStageCodegen
  * span and costs a single projection at any scale.
  *
  * Reference semantics replicated over fixture columns (FIXTURES.md §2):
  *  - 4-class category map: `XGBoost.py:101-114` (CASE WHEN + isin)
  *  - 7-class category map: `Preprocessing.py:807-817`
  *  - temporal extracts: `Preprocessing.py:234-237` (year/month/hour/dayofweek)
  *  - cyclic hour encoding sin/cos(radians(h*15)): `XGBoost.py:119-124`
  *  - IsWeekend (dayofweek 1=Sunday, 7=Saturday): `XGBoost.py:125-126`
  *  - planar distance-from-center * 111 km: `XGBoost.py:127-132`
  *  - boolean flag parse (case-insensitive, fixing the reference's
  *    'True' vs "true" discrepancy): `Preprocessing.py:119-126` vs
  *    `XGBoost.py:91-92`
  */
object Features {

  /** 4-class category map over `p_type` — stand-in for the reference's
    * crime-category CASE WHEN (`XGBoost.py:101-114`): `isin` buckets with an
    * OTHER fallback. */
  def category4(c: Column): Column =
    when(c.isin("PROMO", "ECONOMY"), "BUDGET")
      .when(c.isin("LARGE", "MEDIUM"), "BULK")
      .when(c === "STANDARD", "STANDARD")
      .otherwise("OTHER")

  /** 7-class variant (`Preprocessing.py:807-817`) keyed on p_type × p_size —
    * a wider CASE WHEN chain exercising multi-branch + compound predicates. */
  def category7(pType: Column, pSize: Column): Column =
    when(pType === "PROMO" && pSize <= 10, "PROMO_SMALL")
      .when(pType === "PROMO", "PROMO_LARGE")
      .when(pType === "ECONOMY", "ECONOMY")
      .when(pType === "STANDARD" && pSize <= 25, "STANDARD_SMALL")
      .when(pType === "STANDARD", "STANDARD_LARGE")
      .when(pType.isin("LARGE", "MEDIUM"), "BULK")
      .otherwise("OTHER")

  /** Temporal extracts (`Preprocessing.py:234-237`). Spark `dayofweek`:
    * 1=Sunday … 7=Saturday. */
  def withTemporal(df: DataFrame, ts: String): DataFrame =
    df.withColumns(Map(
      "d_year" -> year(col(ts)),
      "d_month" -> month(col(ts)),
      "d_hour" -> hour(col(ts)),
      "d_dow" -> dayofweek(col(ts))))

  /** Cyclic encoding of an hour-of-day column: sin/cos(radians(h*15))
    * (`XGBoost.py:119-124`). Invariant sin²+cos²≈1 (property-tested). */
  def hourSin(h: Column): Column = sin(radians(h * 15))
  def hourCos(h: Column): Column = cos(radians(h * 15))

  /** IsWeekend with Spark dayofweek semantics (1=Sun, 7=Sat)
    * (`XGBoost.py:125-126`). */
  def isWeekend(dow: Column): Column =
    when(dow === 1 || dow === 7, 1.0).otherwise(0.0)

  /** Planar distance from a fixed center, degrees→km via *111
    * (`XGBoost.py:127-132`). */
  def distanceFromCenter(lat: Column, lon: Column,
      cLat: Double, cLon: Double): Column =
    sqrt(pow(lat - cLat, 2) + pow(lon - cLon, 2)) * 111.0

  /** Case-insensitive boolean-string → 1.0/0.0/null flag. The reference's two
    * scripts disagree on casing ('True' at `Preprocessing.py:121-126`, "true"
    * at `XGBoost.py:91-92`); the engine canonicalizes via lower(). */
  def boolFlag(c: Column): Column =
    when(lower(c) === "true", 1.0).when(lower(c) === "false", 0.0)
      .otherwise(lit(null).cast("double"))
}
