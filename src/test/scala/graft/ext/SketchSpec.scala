package graft.ext

import graft.SparkSpec
import graft.engine.Tables
import org.apache.spark.sql.functions._

/** HLL sketch invariants (q56): estimates near exact, and sketch UNION
  * equals re-sketching the union — the mergeability that makes HLL the
  * right distinct-count tool at 100 TB. */
class SketchSpec extends SparkSpec {

  test("hll estimate within 5% of exact per group") {
    val ev = Tables.events(spark, sf0001)
    val rows = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id")))
        .as("approx"),
        countDistinct(col("user_id")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (approx, exact) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
  }

  test("count-min: never underestimates any key; merge of half-sketches " +
    "== sketch of the whole (counter addition, same seed)") {
    import org.apache.spark.util.sketch.CountMinSketch
    def sketchOf(df: org.apache.spark.sql.DataFrame): CountMinSketch =
      CountMinSketch.readFrom(new java.io.ByteArrayInputStream(
        df.agg(count_min_sketch(col("l_suppkey"), lit(0.0001), lit(0.999),
          lit(42)).as("sk")).head().getAs[Array[Byte]](0)))
    val li = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_suppkey")
    val whole = sketchOf(li)
    val a = sketchOf(li.filter(col("l_orderkey") % 2 === 0))
    val b = sketchOf(li.filter(col("l_orderkey") % 2 =!= 0))
    a.mergeInPlace(b)
    val exact = li.groupBy("l_suppkey").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(exact.nonEmpty)
    exact.foreach { case (k, n) =>
      val key = java.lang.Long.valueOf(k)
      // the one-sided CMS guarantee is hard, not probabilistic
      assert(whole.estimateCount(key) >= n,
        s"suppkey $k: est ${whole.estimateCount(key)} < exact $n")
      // same seed ⇒ same hash functions ⇒ counters add exactly
      assert(a.estimateCount(key) == whole.estimateCount(key),
        s"suppkey $k: merged != whole")
    }
  }

  test("sketch union == sketch of union (mergeability)") {
    val ev = Tables.events(spark, sf0001)
    val merged = ev.groupBy("event_type")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .head().getLong(0)
    val direct = ev.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id"))))
      .head().getLong(0)
    assert(merged == direct)
  }

  test("day-grain distinct partials: week estimates from unioned day " +
    "sketches == estimates sketched directly from the raw week") {
    import graft.engine.Aggregates
    val ev = Tables.events(spark, sf0001)
    val fromPartials = Aggregates.weeklyDistinctFromPartials(
        Aggregates.dailyDistinctPartials(ev, "ts", "user_id"))
      .orderBy("week").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)))
    val direct = ev
      .groupBy(date_trunc("week", col("ts").cast("timestamp"))
        .cast("date").as("week"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .orderBy("week").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)))
    assert(fromPartials.nonEmpty && fromPartials.sameElements(direct))
  }

  test("hll inclusion-exclusion intersection: partial overlap estimated " +
    "inside the 0.2-union band at estimation-mode cardinalities") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val a = (1 to 10000).map(_.toLong).toList.toDF("id")
    val b = (5001 to 15000).map(_.toLong).toList.toDF("id")
    val est = a.agg(hll_sketch_agg(col("id")).as("ska"))
      .crossJoin(b.agg(hll_sketch_agg(col("id")).as("skb")))
      .crossJoin(a.unionByName(b)
        .agg(hll_sketch_agg(col("id")).as("sku")))
      .select((hll_sketch_estimate(col("ska")) +
        hll_sketch_estimate(col("skb")) -
        hll_sketch_estimate(col("sku"))).as("est"))
      .collect()(0).getLong(0)
    // exact: |A∩B| = 5000, |A∪B| = 15000 — the band the q152 contract pins
    assert(math.abs(est - 5000L) <= 0.2 * 15000, s"est=$est")
    // and in practice far tighter: each sketch is within ~2% here
    assert(math.abs(est - 5000L) <= 0.05 * 15000, s"est=$est")
  }
}
