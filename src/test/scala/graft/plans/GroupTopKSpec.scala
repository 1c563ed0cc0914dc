package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom GROUP TOP-K operator must agree exactly with the window
  * row_number formulation (the semantics oracle) while planning as
  * partial→exchange→final bounded heaps (the scale contract). */
class GroupTopKSpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("__rn", row_number().over(
        Window.partitionBy("g").orderBy(col("v").desc, col("id"))))
      .filter(col("__rn") <= k).drop("__rn")

  private def collectSet(df: org.apache.spark.sql.DataFrame) =
    df.select("g", "id", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.get(2))).toSet

  test("== window row_number on random data with heavy ties, any layout") {
    val rng = new scala.util.Random(7)
    val rows = (0 until 500).map { i =>
      (s"g${rng.nextInt(5)}", i.toLong, rng.nextInt(10).toDouble)
    }
    for (parts <- Seq(1, 13); k <- Seq(1, 3, 10)) {
      val df = rows.toDF("g", "id", "v").repartition(parts)
      val got = collectSet(GroupTopK.topK(df, Seq("g"), "v", "id", k))
      val want = collectSet(windowTopK(df, k))
      assert(got == want, s"parts=$parts k=$k")
    }
  }

  test("k larger than group; empty input; single group") {
    val df = Seq(("a", 1L, 5.0), ("a", 2L, 3.0), ("b", 3L, 1.0))
      .toDF("g", "id", "v")
    assert(collectSet(GroupTopK.topK(df, Seq("g"), "v", "id", 10)) ==
      collectSet(df))
    val empty = Seq.empty[(String, Long, Double)].toDF("g", "id", "v")
    assert(GroupTopK.topK(empty, Seq("g"), "v", "id", 3).count() == 0)
    val one = Seq(("a", 1L, 5.0), ("a", 2L, 7.0)).toDF("g", "id", "v")
    assert(collectSet(GroupTopK.topK(one, Seq("g"), "v", "id", 1)) ==
      Set(("a", 2L, 7.0)))
  }

  test("null ord sorts last; null keys group together (window semantics)") {
    val df = Seq(("a", 1L, Some(5.0)), ("a", 2L, None), ("a", 3L, Some(1.0)),
      (null, 4L, Some(2.0)), (null, 5L, Some(9.0)))
      .toDF("g", "id", "v")
    val got = collectSet(GroupTopK.topK(df, Seq("g"), "v", "id", 2))
    val want = collectSet(windowTopK(df, 2))
    assert(got == want)
    // the null-ord row must be the one dropped from group a
    assert(!got.exists { case (g, id, _) => g == "a" && id == 2L })
  }

  test("string ord values copied out of reused row buffers (regression)") {
    // many groups + string ordering column: a view into the iterator's
    // UnsafeRow buffer would be overwritten by later rows
    val rows = (0 until 300).map(i => (s"g${i % 40}", i.toLong, s"s${i % 7}"))
    val df = rows.toDF("g", "id", "v").repartition(7)
    val got = collectSet(GroupTopK.topK(df, Seq("g"), "v", "id", 2))
    val want = collectSet(windowTopK(df, 2))
    assert(got == want)
  }

  test("plan: partial and final heap execs around one exchange, no Window") {
    val df = graft.engine.Tables.orders(spark, sf0001)
    val out = GroupTopK.topK(df, Seq("o_orderpriority"), "o_totalprice",
      "o_orderkey", 3)
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("GroupTopKPartial") && p.contains("GroupTopKFinal"), p)
    // partial feeds the exchange, final consumes it
    assert(p.indexOf("GroupTopKFinal") < p.indexOf("Exchange"), p)
    assert(p.indexOf("Exchange") < p.indexOf("GroupTopKPartial"), p)
    assert("Exchange".r.findAllIn(p).length == 1, p)
    assert(!p.contains("Window"), p)
    // and it agrees with the window formulation on real data
    val viaWindow = df.withColumn("__rn", row_number().over(
        Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("__rn") <= 3).drop("__rn")
      .select("o_orderpriority", "o_orderkey").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val viaOp = out.select("o_orderpriority", "o_orderkey").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(viaOp == viaWindow)
  }
}
