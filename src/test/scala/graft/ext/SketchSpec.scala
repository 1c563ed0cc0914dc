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
}
