package graft.ext

import graft.SparkSpec
import graft.engine.Tables
import org.apache.spark.sql.functions._

class ParetoSpec extends SparkSpec {
  import spark.implicits._

  test("skyline: hand-computed 2-dim case; duplicates all kept") {
    // (5,5) twice: equal rows dominate nothing → BOTH stay
    // (4,6) and (6,1): incomparable to (5,5) → stay
    // (4,4): dominated by (5,5) → out
    // (5,4): dominated by (5,5) (weak on x, strict on y) → out
    val pts = Seq((1L, 5.0, 5L), (2L, 5.0, 5L), (3L, 4.0, 6L),
      (4L, 4.0, 4L), (5L, 6.0, 1L), (6L, 5.0, 4L))
      .toDF("id", "x", "y")
    val out = Pareto.skyline(pts, Seq("id"), Seq("x", "y"))
      .select("id").as[Long].collect().toSet
    assert(out == Set(1L, 2L, 3L, 5L))
  }

  test("skyline: grid pruning is exact — gridQ=1 (pure pairwise) " +
      "and gridQ=8 agree on the fixture profile") {
    val prof = Tables.orders(spark, sf0001).groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
        .cast("double").as("spend"),
        count(lit(1)).as("n_orders"),
        max(col("o_orderdate")).as("last_order"))
    val dims = Seq("spend", "n_orders", "last_order")
    val naive = Pareto.skyline(prof, Seq("o_custkey"), dims, gridQ = 1)
      .select("o_custkey").as[Long].collect().toSet
    val grid = Pareto.skyline(prof, Seq("o_custkey"), dims, gridQ = 8)
      .select("o_custkey").as[Long].collect().toSet
    assert(naive == grid)
    assert(naive.nonEmpty)
    // sanity: the max-spend profile is always undominated
    val top = prof.orderBy(col("spend").desc).select("o_custkey")
      .as[Long].head()
    assert(naive.contains(top))
  }

  test("skyline plan: dominance joins are broadcast nested loops over " +
      "bounded frames — never an unbroadcast cartesian of the data") {
    val prof = Tables.orders(spark, sf0001).groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
        .cast("double").as("spend"),
        count(lit(1)).as("n_orders"))
    val plan = Pareto.skyline(prof, Seq("o_custkey"),
      Seq("spend", "n_orders")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("skyline: single dim degenerates to argmax set") {
    val pts = Seq((1L, 3.0), (2L, 7.0), (3L, 7.0), (4L, 1.0))
      .toDF("id", "x")
    val out = Pareto.skyline(pts, Seq("id"), Seq("x"))
      .select("id").as[Long].collect().toSet
    assert(out == Set(2L, 3L))
  }
}
