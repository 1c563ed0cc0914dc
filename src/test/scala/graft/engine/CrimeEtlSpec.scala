package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end reference-semantics proof over the dirty crime-shaped fixture:
  * every cleaning edge from FIXTURES.md §3 flows through the same module
  * chain a reference user would run (SURVEY.md §3.1-3.2). */
class CrimeEtlSpec extends SparkSpec {

  private lazy val raw = CrimeFixture.raw(spark).cache()
  private lazy val cleaned = CrimeEtl.clean(raw)
  private lazy val prepared = CrimeEtl.prepare(raw)

  test("cleaning removes header, dups, null-subset and malformed-date rows") {
    assert(raw.count() == 108)
    assert(cleaned.filter(col("ID") === "ID").count() == 0)
    assert(cleaned.count() == cleaned.dropDuplicates().count())
    // exactly the 100 base rows survive: the 8 dirty rows (header, 2 dup
    // copies, 3 null-subset copies, 2 bad-date copies) are all removed
    assert(cleaned.count() == 100)
    Seq("Location Description", "District", "Latitude").foreach { c =>
      assert(cleaned.filter(col(c).isNull).count() == 0, c)
    }
  }

  test("typed casts: numeric columns are numeric, flags are 0/1 doubles") {
    val schema = cleaned.schema
    assert(schema("District").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(schema("Beat").dataType == org.apache.spark.sql.types.IntegerType)
    val flags = cleaned.select("Arrest_Flag").distinct()
      .collect().map(_.getDouble(0)).toSet
    assert(flags.subsetOf(Set(0.0, 1.0))) // mixed-case input all parsed
  }

  test("median imputation fills all Ward/Community Area nulls") {
    val imputed = CrimeEtl.imputeMedians(cleaned)
    assert(imputed.filter(col("Ward").isNull).count() == 0)
    assert(imputed.filter(col("Community Area").isNull).count() == 0)
    // imputed value is the approx median of the observed values
    val med = Aggregates.approxMedian(cleaned, "Ward", 0.01)
    val filled = imputed.join(cleaned.select(col("ID"), col("Ward").as("w0")),
      "ID").filter(col("w0").isNull)
    assert(filled.filter(col("Ward") =!= med).count() == 0)
  }

  test("12-hour timestamps parse with AM/PM; years span the split range") {
    val years = prepared.select("d_year").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(years == Set(2001, 2002, 2003, 2004))
    val hours = prepared.select("d_hour").distinct()
      .collect().map(_.getInt(0))
    assert(hours.forall(h => h >= 0 && h <= 23))
  }

  test("4-class category map: WEAPONS merges into VIOLENT, unmapped → OTHER") {
    val m = prepared.select("Primary Type", "Crime_Category").distinct()
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("WEAPONS VIOLATION") == "VIOLENT_CRIME")
    assert(m("THEFT") == "PROPERTY_CRIME")
    assert(m("NARCOTICS") == "DRUG_CRIME")
    assert(m("GAMBLING") == "OTHER")
    assert(m("RITUAL MUTILATION") == "OTHER")
  }

  test("time split (≤2003 / =2004) is disjoint and complete") {
    val (train, test) = Sampling.timeSplit(prepared, col("ts"), 2003)
    assert(train.count() + test.count() == prepared.count())
    assert(test.select("d_year").distinct().collect()
      .map(_.getInt(0)).toSet == Set(2004))
  }

  test("EDA battery runs off one cached parent; shapes are sane") {
    val report = CrimeEtl.edaReport(prepared)
    val typeFreq = report("type_freq").collect()
    assert(typeFreq.map(_.getLong(1)).sum == prepared.count())
    val rollup = report("rollup")
    assert(rollup.filter(col("District").isNull &&
      col("d_year").isNull && col("Primary Type").isNull)
      .head().getLong(3) == prepared.count()) // grand total row
    val arrest = report("arrest_rate").collect()
    assert(arrest.forall { r =>
      val v = r.getDouble(1); v >= 0.0 && v <= 1.0 })
    val pivot = report("category_by_dow")
    assert(pivot.columns.length == 8) // category + 7 dow columns
  }

  test("cyclic hour encoding invariant holds on real parsed hours") {
    val bad = prepared.select(
      (pow(col("Hour_sin"), 2) + pow(col("Hour_cos"), 2)).as("s"))
      .filter(abs(col("s") - 1.0) > 1e-9).count()
    assert(bad == 0)
  }
}
