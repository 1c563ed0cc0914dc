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

  test("tableDigest: invariant to row order and partitioning; moves " +
      "on any single-value mutation; NULL is a distinct state") {
    val base = Seq((1L, Some("aa"), 10L), (2L, Some("bb"), 20L),
      (3L, (None: Option[String]), 30L)).toDF("id", "s", "v")
    val cols = Seq("id", "s", "v")
    def dig(df: org.apache.spark.sql.DataFrame) =
      Expectations.tableDigest(df, cols)
        .as[(Long, Long)].head()
    val d0 = dig(base)
    assert(d0._1 == 3L)
    assert(dig(base.orderBy(col("v").desc)) == d0)    // row order
    assert(dig(base.repartition(7)) == d0)            // partitioning
    val mutated = Seq((1L, Some("aa"), 10L), (2L, Some("bB"), 20L),
      (3L, (None: Option[String]), 30L)).toDF("id", "s", "v")
    assert(dig(mutated) != d0)                        // one char flips it
    // a NULL hashes as the literal sentinel, not as an empty string
    val empty = Seq((1L, Some("aa"), 10L), (2L, Some("bb"), 20L),
      (3L, Some(""), 30L)).toDF("id", "s", "v")
    assert(dig(empty) != d0)
  }
}
