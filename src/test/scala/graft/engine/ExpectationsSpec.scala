package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._
  import Expectations._

  test("columnChecks: one pass, planted violations counted per check") {
    val d = Seq((0.0, "x"), (25.0, null), (60.0, "y"))
      .toDF("qty", "tag")
    val out = columnChecks(d, Seq(
        Check("qty_range", col("qty") < 1 || col("qty") > 50),
        Check("tag_notnull", col("tag").isNull)))
      .as[(String, Long)].collect().toMap
    assert(out == Map("qty_range" -> 2L, "tag_notnull" -> 1L))
  }

  test("uniqueCheck and fkCheck: dup keys and orphans counted; report " +
    "flags pass only at zero violations") {
    val parent = Seq(1L, 2L).toDF("pk")
    // 9 is an orphan; keys 1,1,1 carry TWO surplus duplicates
    val child = Seq(1L, 1L, 1L, 2L, 9L).toDF("fk")
    val rep = report(Seq(
        uniqueCheck(child, "child_unique", "fk"),
        fkCheck(child, "child_fk", "fk", parent, "pk")))
      .orderBy("check")
      .as[(String, Long, Boolean)].collect().toSeq
    assert(rep == Seq(("child_fk", 1L, false), ("child_unique", 2L, false)))
    val clean = report(Seq(
        fkCheck(Seq(1L).toDF("fk"), "ok_fk", "fk", parent, "pk")))
      .as[(String, Long, Boolean)].collect().head
    assert(clean == (("ok_fk", 0L, true)))
  }

  test("columnChecks on an EMPTY table reports zero violations and " +
    "passes — never NULL") {
    val empty = Seq.empty[(Double, String)].toDF("qty", "tag")
    val rep = report(Seq(columnChecks(empty, Seq(
        Check("qty_range", col("qty") < 0)))))
      .as[(String, Long, Boolean)].collect().toSeq
    assert(rep == Seq(("qty_range", 0L, true)))
  }

  test("columnChecks plan: all checks share ONE aggregate over one scan") {
    val d = Seq((1.0, "x")).toDF("qty", "tag")
    val plan = columnChecks(d, Seq(
        Check("a", col("qty") < 0), Check("b", col("tag").isNull)))
      .queryExecution.optimizedPlan.toString
    assert(plan.split("Aggregate").length - 1 == 1, plan)
  }
}
