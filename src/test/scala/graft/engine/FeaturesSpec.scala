package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Test => SCTest}

class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("category4 is total: every p_type maps to exactly one category") {
    val types = Seq("PROMO", "ECONOMY", "LARGE", "MEDIUM", "STANDARD",
      "NEVER-SEEN", null)
    val out = types.toDF("p_type")
      .select(Features.category4(col("p_type"))).collect().map(_.getString(0))
    assert(out.forall(c =>
      Seq("BUDGET", "BULK", "STANDARD", "OTHER").contains(c)))
    assert(out.last == "OTHER") // null falls through to otherwise
  }

  test("category7 is total and maps WEAPONS-style merges") {
    val df = Seq(("PROMO", 5), ("PROMO", 50), ("STANDARD", 10),
      ("STANDARD", 30), ("LARGE", 1), ("XXX", 1)).toDF("p_type", "p_size")
    val out = df.select(Features.category7(col("p_type"), col("p_size")))
      .as[String].collect()
    assert(out.toSeq == Seq("PROMO_SMALL", "PROMO_LARGE", "STANDARD_SMALL",
      "STANDARD_LARGE", "BULK", "OTHER"))
  }

  test("cyclic encoding invariant: sin² + cos² ≈ 1 for all hours") {
    val df = (0 to 23).toDF("h")
    val bad = df.select(
      (pow(Features.hourSin(col("h")), 2) +
        pow(Features.hourCos(col("h")), 2)).as("s"))
      .filter(abs(col("s") - 1.0) > 1e-9).count()
    assert(bad == 0)
  }

  test("isWeekend: Sunday(1) and Saturday(7) only") {
    val out = (1 to 7).toDF("dow")
      .select(Features.isWeekend(col("dow"))).as[Double].collect()
    assert(out.toSeq == Seq(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0))
  }

  test("boolFlag is case-insensitive (fixes reference discrepancy)") {
    val out = Seq("True", "true", "TRUE", "False", "false", "x", null)
      .toDF("v").select(Features.boolFlag(col("v")))
      .collect().map(r => Option(r.get(0)))
    assert(out.toSeq == Seq(Some(1.0), Some(1.0), Some(1.0),
      Some(0.0), Some(0.0), None, None))
  }

  test("distanceFromCenter: zero at center, scales by ~111 km/degree") {
    val df = Seq((41.8781, -87.6298), (42.8781, -87.6298))
      .toDF("lat", "lon")
    val out = df.select(Features.distanceFromCenter(col("lat"), col("lon"),
      41.8781, -87.6298)).as[Double].collect()
    assert(math.abs(out(0)) < 1e-9)
    assert(math.abs(out(1) - 111.0) < 1e-6)
  }

  test("property: time split is disjoint and complete (ScalaCheck)") {
    val years = Gen.listOfN(50, Gen.choose(1995, 2005))
    val prop = forAll(years) { ys =>
      val df = ys.map(y => (y, s"$y-06-15")).toDF("y", "d")
        .withColumn("ts", col("d").cast("timestamp"))
      val (train, test) = Sampling.timeSplit(df, col("ts"), 1999)
      train.count() + test.count() == ys.length &&
        train.filter(year(col("ts")) > 1999).count() == 0 &&
        test.filter(year(col("ts")) <= 1999).count() == 0
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(5),
      prop).passed)
  }
}
