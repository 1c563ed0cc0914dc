package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Edge semantics the reference depends on (SURVEY.md §5.2): sentinel-null
  * replacement, garbage casts → null, dedup, stray header, 12-hour
  * timestamp parse, dayofweek Sunday=1. */
class CleaningSpec extends SparkSpec {
  import spark.implicits._

  test("sentinel strings and empties become null") {
    val df = Seq("NULL", "", "ok", "N/A").toDF("v")
    val out = Cleaning.sentinelsToNull(df, Seq("v"), Seq("NULL", "N/A"))
      .collect().map(r => Option(r.getString(0)))
    assert(out.toSeq == Seq(None, None, Some("ok"), None))
  }

  test("cleaning is idempotent: clean(clean(x)) == clean(x)") {
    val df = Seq("NULL", "", "ok", "x").toDF("v")
    val once = Cleaning.sentinelsToNull(df, Seq("v"), Seq("NULL"))
    val twice = Cleaning.sentinelsToNull(once, Seq("v"), Seq("NULL"))
    assert(once.collect().toSeq == twice.collect().toSeq)
  }

  test("try_cast garbage strings → null, valid strings → typed") {
    val df = Seq("12.5", "abc", "", "7").toDF("v")
    val out = Cleaning.castColumns(df, Map("v" -> DoubleType))
      .collect().map(r => Option(r.get(0)))
    assert(out.toSeq == Seq(Some(12.5), None, None, Some(7.0)))
  }

  test("dropDuplicates removes exact dups, keeps distinct count") {
    val df = Seq((1, "a"), (1, "a"), (2, "b")).toDF("k", "v")
    assert(Cleaning.dropDuplicatesAll(df).count() == 2)
  }

  test("stray header row filtered (ID == \"ID\")") {
    val df = Seq("ID", "123", "456").toDF("ID")
    assert(Cleaning.dropStrayHeader(df, "ID").count() == 2)
  }

  test("12-hour pattern MM/dd/yyyy hh:mm:ss a parses AM/PM correctly") {
    val df = Seq("07/15/2003 11:30:00 PM", "07/15/2003 11:30:00 AM")
      .toDF("d")
    val out = df.select(
      Cleaning.parseTimestamp(col("d"), "MM/dd/yyyy hh:mm:ss a").as("ts"))
      .select(hour(col("ts"))).as[Int].collect()
    assert(out.toSeq == Seq(23, 11))
  }

  test("try_to_timestamp: malformed → null (XGBoost.py:80 semantics)") {
    val df = Seq("07/15/2003 11:30:00 PM", "garbage", "13/45/2003 99:99:99 XM")
      .toDF("d")
    val out = df.select(
      Cleaning.tryParseTimestamp(col("d"), "MM/dd/yyyy hh:mm:ss a").as("ts"))
      .collect().map(r => Option(r.get(0)))
    assert(out(0).isDefined && out(1).isEmpty && out(2).isEmpty)
  }

  test("dayofweek: Sunday = 1, Saturday = 7 (Spark semantics pinned)") {
    val df = Seq("2022-01-02", "2022-01-08").toDF("d") // Sun, Sat
    val out = df.select(dayofweek(col("d").cast("date"))).as[Int].collect()
    assert(out.toSeq == Seq(1, 7))
  }

  test("fillConst fills only nulls") {
    val df = Seq(Some(1), None, Some(3)).toDF("v")
    val out = Cleaning.fillConst(df, Map("v" -> 0)).as[Int].collect()
    assert(out.toSeq == Seq(1, 0, 3))
  }
}
