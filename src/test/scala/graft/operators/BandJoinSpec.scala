package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BandJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = Seq(
    (1L, 0.4), (2L, 1.0), (3L, 5.5), (4L, -2.3), (5L, 99.9), (6L, 7.0))
    .toDF("pt_id", "v")
  private lazy val intervals = Seq(
    (10L, 0.0, 1.0),   // catches 0.4 and 1.0 (inclusive ends)
    (11L, 5.5, 7.0),   // catches 5.5 and 7.0 — both exactly on an edge
    (12L, -3.0, -2.0), // catches -2.3 (negative bucket math)
    (13L, 8.0, 4.0))   // inverted: matches nothing
    .toDF("iv_id", "lo", "hi")

  private def pairs(width: Double, bloom: Boolean) =
    BandJoin.join(points, "v", intervals, "lo", "hi", width, bloom)
      .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet

  private val expected = Set(
    (10L, 1L), (10L, 2L), (11L, 3L), (11L, 6L), (12L, 4L))

  test("matches BETWEEN semantics incl. edges, negatives, inverted " +
    "intervals — and each pair appears exactly once") {
    val out = BandJoin.join(points, "v", intervals, "lo", "hi", 1.0)
      .select("iv_id", "pt_id").as[(Long, Long)].collect()
    assert(out.length == out.toSet.size, "duplicate pairs emitted")
    assert(out.toSet == expected)
  }

  test("result is width-invariant (bucketing is invisible)") {
    for (w <- Seq(0.25, 1.0, 3.0, 100.0); bloom <- Seq(true, false))
      assert(pairs(w, bloom) == expected, s"width=$w bloom=$bloom")
  }

  test("plan: bucketed equi-join, no nested-loop/cartesian; bloom probe " +
    "sits on the point side") {
    val p = BandJoin.join(points, "v", intervals, "lo", "hi", 1.0)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("might_contain"), p)
  }

  test("raw non-equi join WOULD be a nested loop (the scale-killer the " +
    "operator exists to avoid)") {
    val raw = points.join(intervals,
      col("v") >= col("lo") && col("v") <= col("hi"))
    assert(raw.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
  }
}
