package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Misra–Gries frequent-items sketch: the heavy-hitter guarantee
  * (candidates ⊇ every item with freq > n/(k+1)) must hold under ANY
  * physical partitioning — that is what makes the q90 exact-recount
  * pattern exact. */
class FreqItemsSpec extends SparkSpec {
  import spark.implicits._

  private def candidates(df: org.apache.spark.sql.DataFrame,
      k: Int): Set[String] =
    df.agg(FreqItems.mg_candidates(col("tok"), k))
      .head().getSeq[String](0).toSet

  test("guarantee: heavy item survives adversarial dilution, any layout") {
    // 300 copies of one key drowned in 3000 singletons: with k=16 the
    // guarantee bound is n/(k+1) = 3300/17 ≈ 194 < 300, so "heavy" must
    // be in the candidate set no matter how the stream is partitioned
    val rows = Seq.fill(300)("heavy") ++ (0 until 3000).map(i => s"u$i")
    for (parts <- Seq(1, 7, 32)) {
      val df = rows.toDF("tok").repartition(parts)
      val c = candidates(df, 16)
      assert(c.contains("heavy"), s"parts=$parts: $c")
      assert(c.size <= 16, s"parts=$parts: ${c.size}")
    }
  }

  test("exact when distinct <= k: all items kept") {
    val df = (0 until 1000).map(i => s"t${i % 10}").toDF("tok")
    assert(candidates(df, 64) ==
      (0 until 10).map(i => s"t$i").toSet)
  }

  test("nulls carry no mass; empty input yields empty array") {
    val df = Seq[Option[String]](Some("a"), None, Some("a"), None)
      .toDF("tok")
    assert(candidates(df, 4) == Set("a"))
    val empty = Seq.empty[String].toDF("tok")
    assert(candidates(empty, 4) == Set.empty[String])
  }

  test("grouped sketch: per-group candidates, size-bounded") {
    val df = ((0 until 500).map(i => ("g1", "dom")) ++
      (0 until 500).map(i => ("g1", s"u$i")) ++
      (0 until 50).map(i => ("g2", s"v${i % 3}"))).toDF("g", "tok")
    val out = df.groupBy("g")
      .agg(FreqItems.mg_candidates(col("tok"), 8).as("c"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSet)
      .toMap
    assert(out("g1").contains("dom")) // 500 > 1000/9
    assert(out("g1").size <= 8)
    assert(out("g2") == Set("v0", "v1", "v2"))
  }

  test("prefilter + exact recount == plain groupBy heavy hitters") {
    // the q90 pattern: threshold n/20, k=32 (32+1 > 20 ⇒ exact)
    val rows = (0 until 2000).map { i =>
      if (i % 3 == 0) "alpha" else if (i % 7 == 0) "beta" else s"u$i"
    }
    for (parts <- Seq(1, 13)) {
      val toks = rows.toDF("tok").repartition(parts)
      val row = toks.agg(FreqItems.mg_candidates(col("tok"), 32).as("c"),
        count(lit(1)).as("n")).head()
      val cands = row.getSeq[String](0)
      val n = row.getLong(1)
      val got = toks.filter(col("tok").isin(cands: _*))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * 20 >= lit(n))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val want = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * 20 >= lit(n))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == want, s"parts=$parts")
      // alpha ≈ 667 and beta ≈ 191 both clear n/20 = 100; singletons don't
      assert(want.map(_._1) == Set("alpha", "beta"))
    }
  }

  test("serde round-trip preserves the buffer") {
    val agg = MisraGriesAgg(
      org.apache.spark.sql.graft.shim.toExpression(col("x")), 8)
    val buf = scala.collection.mutable.HashMap(
      "a" -> 5L, "üñïçödé" -> 3L, "" -> 1L)
    assert(agg.deserialize(agg.serialize(buf)) == buf)
  }
}
