package graft.engine

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Deterministic crime-shaped dirty fixture (FIXTURES.md §3): ~120 rows of
  * all-string raw data replicating every cleaning edge the reference
  * handles — sentinel "NULL"/"" strings, exact duplicate rows, an embedded
  * header row, null-bearing drop subsets, ~36% missing Ward/Community Area,
  * unparseable dates, AM/PM 12-hour values across 2001–2004, mixed-case
  * booleans, every category-map branch incl. WEAPONS VIOLATION and an
  * unmapped type, tied label frequencies. */
object CrimeFixture {

  private val types = Seq(
    "THEFT", "BATTERY", "NARCOTICS", "WEAPONS VIOLATION", "ARSON",
    "ASSAULT", "GAMBLING", "RITUAL MUTILATION") // last two → OTHER

  def raw(spark: SparkSession): DataFrame = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
    var id = 1000
    // deterministic LCG so the fixture never changes between runs
    var seed = 12345L
    def nextInt(n: Int): Int = {
      seed = (seed * 6364136223846793005L + 1442695040888963407L)
      (((seed >>> 33) % n).toInt + n) % n
    }
    for (i <- 0 until 100) {
      val t = types(i % types.size)
      val year = 2001 + (i % 4)
      val month = 1 + nextInt(12)
      val day = 1 + nextInt(28)
      val hour12 = 1 + nextInt(12)
      val ampm = if (nextInt(2) == 0) "AM" else "PM"
      val date = f"$month%02d/$day%02d/$year $hour12%02d:${nextInt(60)}%02d:00 $ampm"
      val ward = if (i % 3 == 0) "NULL" else (1 + nextInt(50)).toString
      val comm = if (i % 3 == 1) "" else (1 + nextInt(77)).toString
      // a few null Beats survive cleaning (not a drop subset, not imputed)
      // and exercise the residual fillna(0) path (XGBoost.py:232-233)
      val beat = if (i % 25 == 7) "NULL" else (100 + nextInt(25)).toString
      val arrest = Seq("True", "true", "False", "false")(nextInt(4))
      val lat = (41.6 + nextInt(500) / 1000.0).toString
      val lon = (-87.9 + nextInt(500) / 1000.0).toString
      rows += Row(
        id.toString, s"HN$id", date, s"0${nextInt(99)}XX W STREET", "0110",
        t, "DESC", Seq("STREET", "RESIDENCE", "APARTMENT")(nextInt(3)),
        arrest, Seq("True", "false")(nextInt(2)), beat,
        (1 + nextInt(25)).toString, ward, comm, "08B",
        (1100000 + nextInt(90000)).toString, (1800000 + nextInt(90000)).toString,
        year.toString, date, lat, lon, s"($lat, $lon)")
      id += 1
    }
    // dirty rows, by construction (FIXTURES.md §3):
    rows += rows(5).copy()                          // exact duplicate
    rows += rows(17).copy()                         // exact duplicate
    rows += Row(CrimeEtl.RawColumns: _*)            // embedded header row
    // null Location Description / District / coordinates → drop subsets
    rows += rowWith(rows(3), 7, "NULL")
    rows += rowWith(rows(4), 11, "")
    rows += rowWith(rows(6), 19, "NULL")
    // unparseable dates → try_to_timestamp null → dropped
    rows += rowWith(rows(8), 2, "13/45/2003 99:99:99 XM")
    rows += rowWith(rows(9), 2, "garbage")
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.toSeq.asJava, CrimeEtl.rawSchema)
  }

  private def rowWith(r: Row, idx: Int, v: String): Row = {
    val vals = r.toSeq.toArray
    vals(idx) = v
    Row(vals: _*)
  }
}
