package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's full batch lifecycle (SURVEY.md §3.1-§3.2) as one
  * composable module over a crime-shaped raw table (22 string columns, as
  * loaded with inferSchema=False — `Preprocessing.py:20`):
  *
  *   raw strings → stray-header filter → dedup → sentinel→null → dropna
  *   subsets → typed casts → boolean parse → 12-hour timestamp parse →
  *   median imputation → temporal extracts → engineered features →
  *   category label → cached fan-out for the aggregation battery.
  *
  * Anti-patterns from the reference deliberately NOT replicated
  * (SURVEY.md §4.2): the cleaned frame is cached once at the fan-out point
  * (not after 10 recounts); null profiling is the single-pass conditional
  * sum; the multi-granularity counts are one rollup; per-type sampling is
  * one stratified pass. */
object CrimeEtl {

  val RawColumns: Seq[String] = Seq(
    "ID", "Case Number", "Date", "Block", "IUCR", "Primary Type",
    "Description", "Location Description", "Arrest", "Domestic", "Beat",
    "District", "Ward", "Community Area", "FBI Code", "X Coordinate",
    "Y Coordinate", "Year", "Updated On", "Latitude", "Longitude",
    "Location")

  val rawSchema: StructType =
    StructType(RawColumns.map(StructField(_, StringType)))

  private val numericCasts: Map[String, DataType] = Map(
    "District" -> DoubleType, "Ward" -> DoubleType,
    "Community Area" -> DoubleType, "X Coordinate" -> DoubleType,
    "Y Coordinate" -> DoubleType, "Latitude" -> DoubleType,
    "Longitude" -> DoubleType, "Year" -> IntegerType,
    "Beat" -> IntegerType)

  /** 4-class crime category map (`XGBoost.py:101-114`): WEAPONS VIOLATION
    * merges into VIOLENT_CRIME; unmapped types → OTHER. */
  def crimeCategory4(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    when(c.isin("THEFT", "BURGLARY", "MOTOR VEHICLE THEFT", "ARSON",
      "CRIMINAL DAMAGE", "ROBBERY"), "PROPERTY_CRIME")
      .when(c.isin("BATTERY", "ASSAULT", "HOMICIDE",
        "CRIM SEXUAL ASSAULT", "SEX OFFENSE", "KIDNAPPING",
        "WEAPONS VIOLATION"), "VIOLENT_CRIME")
      .when(c.isin("NARCOTICS", "OTHER NARCOTIC VIOLATION"), "DRUG_CRIME")
      .otherwise("OTHER")

  /** Full cleaning kernel over the raw string table. */
  def clean(raw: DataFrame): DataFrame = {
    val noHeader = Cleaning.dropStrayHeader(raw, "ID")
    val deduped = Cleaning.dropDuplicatesAll(noHeader)
    val nulled = Cleaning.sentinelsToNull(deduped, RawColumns, Seq("NULL"))
    val dropped = Cleaning.dropNullRows(nulled,
      Seq("Location Description", "District", "X Coordinate",
        "Y Coordinate", "Latitude", "Longitude"))
    val casted = Cleaning.castColumns(dropped, numericCasts)
    casted
      .withColumn("Arrest_Flag", Features.boolFlag(col("Arrest")))
      .withColumn("Domestic_Flag", Features.boolFlag(col("Domestic")))
      .withColumn("ts",
        Cleaning.tryParseTimestamp(col("Date"), "MM/dd/yyyy hh:mm:ss a"))
      .na.drop(Seq("ts"))
  }

  /** Median imputation for Ward / Community Area (`Preprocessing.py:144-168`
    * — including the fix for its Ward/Community mislabeling bug). */
  def imputeMedians(df: DataFrame): DataFrame = {
    val wardMed = Aggregates.approxMedian(df, "Ward", 0.01)
    val commMed = Aggregates.approxMedian(df, "Community Area", 0.01)
    df.na.fill(Map("Ward" -> wardMed, "Community Area" -> commMed))
  }

  /** Feature block (`XGBoost.py:83-132`): temporal extracts, cyclic hour,
    * weekend flag, planar distance from the Loop, 4-class label. */
  def engineer(df: DataFrame): DataFrame =
    Features.withTemporal(df, "ts")
      .withColumn("Hour_sin", Features.hourSin(col("d_hour")))
      .withColumn("Hour_cos", Features.hourCos(col("d_hour")))
      .withColumn("IsWeekend", Features.isWeekend(col("d_dow")))
      .withColumn("Distance_from_center", Features.distanceFromCenter(
        col("Latitude"), col("Longitude"), 41.8781, -87.6298))
      .withColumn("Crime_Category", crimeCategory4(col("Primary Type")))

  /** End-to-end: raw strings → analysis-ready cached frame. */
  def prepare(raw: DataFrame): DataFrame =
    engineer(imputeMedians(clean(raw))).cache()

  /** The EDA aggregation battery (§3.1): one cached parent, many shapes. */
  def edaReport(df: DataFrame): Map[String, DataFrame] = Map(
    "type_freq" -> Aggregates.freqTable(df, Seq("Primary Type")),
    "rollup" -> Aggregates.rollupCounts(df,
      Seq("District", "d_year", "Primary Type")),
    "category_by_dow" -> Aggregates.pivotCounts(
      df.withColumn("dow_s", col("d_dow").cast("string")),
      "Crime_Category", "dow_s", (1 to 7).map(_.toString)),
    "centroids" -> df.groupBy("District")
      .agg(avg("Latitude").as("Avg_Lat"), avg("Longitude").as("Avg_Long"),
        count(lit(1)).as("n")),
    "null_profile" -> Aggregates.nullProfile(df, Seq("Ward", "Beat"),
      Seq("NULL")),
    "arrest_rate" -> df.groupBy("Crime_Category")
      .agg(avg("Arrest_Flag").as("arrest_rate"), count(lit(1)).as("n")))
}
