package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: hand-computed chain 1-2-3 after one iteration; center " +
    "dominates; mass conserved") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val r1 = GraphOps.pageRank(pairs, iterations = 1)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    // deg: 1→1, 2→2, 3→1; init 1/3 each
    // rank(1) = 0.15/3 + 0.85·(1/3)/2 ; rank(2) = 0.15/3 + 0.85·(1/3+1/3)
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    // contributions round at 12 dp (the engine/oracle contract); only
    // the final rank rounds at 9 dp
    def r12(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val third = r9(1.0 / 3)
    val end = r9((1.0 - 0.85) / 3 + 0.85 * r12(third / 2))
    val mid = r9((1.0 - 0.85) / 3 + 0.85 * (r12(third) + r12(third)))
    assert(r1 == Seq((1L, end), (2L, mid), (3L, end)))
    assert(mid > end)
    // total mass stays ~1 (no dangling nodes in the edge subgraph)
    val total = r1.map(_._2).sum
    assert(math.abs(total - 1.0) < 1e-6)
  }

  test("personalizedPageRank: hand-computed chain 1-2-3 with seed {1} — " +
    "teleport goes only to the seed; mass conserved; q188's contract") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val seeds = Seq(1L).toDF("id")
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r12(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    // deg: 1→1, 2→2, 3→1; ns=1 ⇒ rank₀ = (1, 0, 0)
    // iter 1: inflow(2) = r12(1/1) = 1; rank₁(1) = 0.15·1, rank₁(2) =
    // 0.85·1, rank₁(3) = 0 — the seed keeps only its teleport share
    val r1 = GraphOps.personalizedPageRank(pairs, seeds, iterations = 1)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(r1 == Seq((1L, 0.15), (2L, 0.85), (3L, 0.0)))
    // iter 2: inflows 1←0.85/2, 2←0.15/1, 3←0.85/2
    val i1 = r12(0.85 / 2)
    val r2 = GraphOps.personalizedPageRank(pairs, seeds, iterations = 2)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(r2 == Seq(
      (1L, r9(0.15 + 0.85 * i1)),
      (2L, r9(0.85 * r12(0.15))),
      (3L, r9(0.85 * i1))))
    // seed > its neighbor-of-neighbor 3 > the pass-through node 2 at
    // this step, and total mass stays 1 (no dangling nodes on the
    // undirected subgraph)
    assert(r2(0)._2 > r2(2)._2 && r2(2)._2 > r2(1)._2)
    assert(math.abs(r1.map(_._2).sum - 1.0) < 1e-6)
    assert(math.abs(r2.map(_._2).sum - 1.0) < 1e-6)
  }

  test("personalizedPageRank: seeds outside the edge subgraph are " +
    "rejected; real-graph run is deterministic across partitionings " +
    "and concentrates mass near the seeds") {
    val pairs = Dedup.jaccardPairs(
      graft.engine.Tables.documents(spark, sf0001), "doc_id", "text",
      3, 0.1, maxDf = 100)
    intercept[IllegalArgumentException] {
      GraphOps.personalizedPageRank(pairs,
        Seq(-999L).toDF("id"), iterations = 1)
    }
    val seeds = pairs.select(col("id_a").as("id"))
      .union(pairs.select(col("id_b").as("id")))
      .filter(col("id") % 4 === 0).distinct()
    val a = GraphOps.personalizedPageRank(pairs, seeds, iterations = 5)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    val b = GraphOps.personalizedPageRank(pairs.repartition(7), seeds,
        iterations = 5)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(a == b)
    assert(a.nonEmpty && math.abs(a.map(_._2).sum - 1.0) < 1e-5)
    // personalization: seed-set mass exceeds its uniform share
    val seedSet = seeds.as[Long].collect().toSet
    val seedMass = a.filter(x => seedSet(x._1)).map(_._2).sum
    assert(seedMass > seedSet.size.toDouble / a.size)
  }

  test("pageRankDirected: hand-computed chain 1→2→3 (node 3 dangling) " +
    "after one iteration; dangling redistribution conserves mass") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val r1 = GraphOps.pageRankDirected(pairs, iterations = 1)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r12(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    // N=3, outdeg 1→1, 2→1; node 3 has no out-edges ⇒ D = its rank
    val third = r9(1.0 / 3)
    val dm = r12(third)
    val base = (1.0 - 0.85) / 3
    // node 1: no in-edges — teleport + dangling share only
    val head = r9(base + 0.85 * (0.0 + dm / 3))
    // nodes 2, 3: one unit-degree in-edge each
    val tail = r9(base + 0.85 * (r12(third / 1) + dm / 3))
    assert(r1 == Seq((1L, head), (2L, tail), (3L, tail)))
    assert(head < tail)
    // the point of dangling redistribution: total mass stays 1 even
    // though node 3 has nowhere to send its rank
    assert(math.abs(r1.map(_._2).sum - 1.0) < 1e-6)
  }

  test("pageRankDirected on the real near-dup graph: deterministic " +
    "across partitionings, positive, mass-conserving") {
    val pairs = Dedup.jaccardPairs(
      graft.engine.Tables.documents(spark, sf0001), "doc_id", "text",
      3, 0.1, maxDf = 100)
    val a = GraphOps.pageRankDirected(pairs, iterations = 3)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    val b = GraphOps.pageRankDirected(pairs.repartition(7), iterations = 3)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(a == b)
    assert(a.nonEmpty && a.forall(_._2 > 0))
    assert(math.abs(a.map(_._2).sum - 1.0) < 1e-5)
  }

  test("pageRank on the real near-dup graph: converging, deterministic " +
    "across partitionings, all ranks positive") {
    val pairs = Dedup.jaccardPairs(
      graft.engine.Tables.documents(spark, sf0001), "doc_id", "text",
      3, 0.1, maxDf = 100)
    val a = GraphOps.pageRank(pairs, iterations = 5)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    val b = GraphOps.pageRank(pairs.repartition(7), iterations = 5)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(a == b)
    assert(a.nonEmpty && a.forall(_._2 > 0))
    assert(math.abs(a.map(_._2).sum - 1.0) < 1e-5)
  }

  test("kcorePeel: triangle survives 2-core, pendant chain peels away " +
    "over successive rounds") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), // triangle: the 2-core
      (3L, 4L), (4L, 5L), (5L, 6L))               // chain peels off
      .toDF("id_a", "id_b")
    val out = GraphOps.kcorePeel(edges, "id_a", "id_b", k = 2, rounds = 4)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
    // one round is NOT enough: only the leaf 6 and its edge go first —
    // fixed-round semantics are well-defined pre-convergence
    val r1 = GraphOps.kcorePeel(edges, "id_a", "id_b", k = 2, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1.contains(4L) && !r1.contains(6L))
  }

  test("labelPropagation: hand 2-round synchronous trace — previously-" +
    "labeled nodes FLIP as mass arrives, weight tie breaks to min " +
    "label, isolated node stays null, seeds clamp") {
    val nodes = (1L to 6L).toDF("id")
    val edges = Seq((1L, 2L, 0.9), (2L, 3L, 0.8), (3L, 4L, 0.7),
      (4L, 5L, 0.7), (2L, 5L, 0.7)).toDF("id_a", "id_b", "sim")
    val seeds = Seq((1L, 0), (4L, 1)).toDF("id", "seed_label")
    // r1 (from seeds only): 2←{1:0·.9}→0; 3←{4:1·.7}→1; 5←{4:1·.7}→1
    val r1 = GraphOps.labelPropagation(nodes, edges, seeds, rounds = 1)
      .as[(Long, Option[Int], Boolean)].collect().toSeq
    assert(r1 == Seq((1L, Some(0), true), (2L, Some(0), false),
      (3L, Some(1), false), (4L, Some(1), true), (5L, Some(1), false),
      (6L, None, false)))
    // r2 reads r1 synchronously:
    //   2: {1:0·.9, 3:1·.8, 5:1·.7} → 1 (1.5 > .9) — FLIPS 0→1
    //   3: {2:0·.8, 4:1·.7} → 0 (.8 > .7) — FLIPS 1→0
    //   5: {2:0·.7, 4:1·.7} → TIE → min label 0
    val r2 = GraphOps.labelPropagation(nodes, edges, seeds, rounds = 2)
      .as[(Long, Option[Int], Boolean)].collect().toSeq
    assert(r2 == Seq((1L, Some(0), true), (2L, Some(1), false),
      (3L, Some(0), false), (4L, Some(1), true), (5L, Some(0), false),
      (6L, None, false)))
  }

  test("triangleStats: K4 + star hand census; reversed/duplicate edges " +
    "canonicalize; star hub generates no wedge pivots") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val star = Seq((10L, 11L), (10L, 12L), (13L, 10L), (12L, 10L)) // dup+rev
    val edges = (k4 ++ star).toDF("id_a", "id_b")
    val out = GraphOps.triangleStats(edges, "id_a", "id_b")
      .as[(Long, Long, Long, Double)].collect()(0)
    // K4: 6 edges, 12 wedges, 4 triangles; star: 3 edges, 3 wedges, 0
    assert(out == ((9L, 15L, 4L, BigDecimal(12.0 / 15)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("localClustering: hand-computed lcc; isolated node reports 0s") {
    // triangle {1,2,3} plus pendant 3–4; node 5 isolated
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .toDF("id_a", "id_b")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val out = GraphOps.localClustering(nodes, "id", edges, "id_a", "id_b")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 1L, 1.0),       // both neighbors connected
      (2L, 2L, 1L, 1.0),
      (3L, 3L, 1L, 0.333333),  // 2·1/(3·2)
      (4L, 1L, 0L, 0.0),       // degree < 2
      (5L, 0L, 0L, 0.0)))      // isolated, passes through
  }

  test("localClustering: K4 — every node lcc 1; sums match census ×3") {
    val k4 = (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b))
      .toDF("id_a", "id_b")
    val nodes = (1L to 4L).toDF("id")
    val out = GraphOps.localClustering(nodes, "id", k4, "id_a", "id_b")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out.forall { case (_, d, t, c) => d == 3 && t == 3 && c == 1.0 })
    // Σ per-node triangles = 3 × global count (each triangle has 3 corners)
    val global = GraphOps.triangleStats(k4, "id_a", "id_b")
      .select("n_triangles").as[Long].head()
    assert(out.map(_._3).sum == 3 * global)
  }
}
