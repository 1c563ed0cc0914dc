package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Iterative graph analytics over relational edge lists — the companion
  * to [[Dedup.dupClusters]]' connected components: joins + aggregates
  * per round, no driver-side graph, no GraphX dependency.
  */
object GraphOps {

  /** PageRank over an UNDIRECTED edge list (id_a, id_b), restricted to
    * the subgraph of nodes with ≥ 1 edge (isolated nodes carry no
    * structural signal and excluding them leaves no dangling mass to
    * redistribute — which also keeps the SQL oracle to a single
    * recursive self-reference). Fixed iteration count; damping `d`.
    *
    * Determinism contract (oracle-checkable): per-edge contributions are
    * rounded to 12 dp and summed as exact decimals, and each new rank is
    * rounded to 9 dp — every iteration's state is therefore identical
    * under ANY partitioning or join order, in this engine or the oracle's.
    *
    * Scale shape: per round ONE join (ranks ⋈ edges on the source) and
    * one hash-agg on the destination; ranks frame is |V| rows; per-round
    * localCheckpoint keeps the iterative plan flat (the dupClusters
    * discipline). Degrees compute once. At 100 TB the edge list shuffles
    * once per round on the join key — the relational PageRank trade-off;
    * for low round counts (5–10) this beats specialized-system handoff. */
  def pageRank(pairs: DataFrame, iterations: Int, d: Double = 0.85)
      : DataFrame = {
    require(iterations >= 1, s"need >= 1 iteration, got $iterations")
    val edges0 = Dedup.symmetrized(pairs)
      .localCheckpoint(eager = true)
    val degrees = edges0.groupBy("src").agg(count(lit(1)).as("deg"))
    // deg is loop-invariant: pre-join it onto the edge list ONCE so each
    // round pays a single ranks⋈edges join, not an extra |V|-frame join
    val edges = edges0.join(degrees, "src")
      .select(col("src"), col("dst"), col("deg"))
      .localCheckpoint(eager = true)
    val n = degrees.count() // |V| of the edge subgraph — KB-scale action
    // LAZY checkpoints for the rank frames: each intermediate is consumed
    // exactly once (the next round's join), so an eager materialization
    // job per round would double the job count for nothing; the
    // checkpoint still cuts the lineage when the consumer runs
    var ranks = degrees.select(col("src").as("id"),
        round(lit(1.0 / n), 9).as("rank"))
      .localCheckpoint(eager = false)
    for (_ <- 1 to iterations) {
      val contribs = ranks
        .join(edges, ranks("id") === edges("src"))
        .select(col("dst"),
          round(col("rank") / col("deg"), 12).cast("decimal(28,12)")
            .as("c"))
        .groupBy("dst")
        .agg(sum(col("c")).cast("double").as("inflow"))
      // every subgraph node has deg >= 1 AND >= 1 in-edge (undirected),
      // so the join keeps all |V| rows — no outer join needed
      ranks = contribs
        .select(col("dst").as("id"),
          round(lit((1.0 - d) / n) + lit(d) * col("inflow"), 9)
            .as("rank"))
        .localCheckpoint(eager = false)
    }
    ranks
  }

  /** PERSONALIZED PageRank over the undirected edge subgraph: the random
    * walk teleports to the SEED set instead of uniformly —
    *
    *   rank'(v) = (1−d)·s(v) + d·Σ_{u→v} rank(u)/deg(u),
    *   s(v) = 1/|S ∩ V| for seeds, 0 otherwise; rank₀ = s
    *
    * — the graph-proximity score behind "more like these" retrieval,
    * seed-anchored dedup weighting, and topic-sensitive ranking; ranks
    * concentrate around the seeds instead of rewarding global degree.
    *
    * Same determinism contract as [[pageRank]] (12-dp decimal
    * contributions, 9-dp ranks — state identical under any partitioning,
    * in this engine or a recursive-CTE oracle), same per-round cost (ONE
    * ranks⋈edges join + one destination hash-agg). The teleport term is
    * per-node, so each round closes with a left join onto the |V|-row
    * seed-share frame (zero-inflow nodes cannot occur on the undirected
    * ≥1-edge subgraph, but non-seed nodes must still lose their teleport
    * share — coalesce handles the seed side only). */
  def personalizedPageRank(pairs: DataFrame, seeds: DataFrame,
      iterations: Int, d: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"need >= 1 iteration, got $iterations")
    val edges0 = Dedup.symmetrized(pairs)
      .localCheckpoint(eager = true)
    val degrees = edges0.groupBy("src").agg(count(lit(1)).as("deg"))
    val edges = edges0.join(degrees, "src")
      .select(col("src"), col("dst"), col("deg"))
      .localCheckpoint(eager = true)
    val seedIds = seeds.select(col(seeds.columns.head).as("id")).distinct()
    val nodeS = degrees.select(col("src").as("id"))
      .join(seedIds.withColumn("__isSeed", lit(1)), Seq("id"), "left")
      .localCheckpoint(eager = true) // loop-invariant, read every round
    val ns = nodeS.filter(col("__isSeed") === 1).count()
    require(ns > 0, "seed set does not intersect the edge subgraph")
    def sv: org.apache.spark.sql.Column =
      when(col("__isSeed") === 1, round(lit(1.0 / ns), 9)).otherwise(0.0)
    var ranks = nodeS.select(col("id"), sv.as("rank"))
      .localCheckpoint(eager = false)
    for (_ <- 1 to iterations) {
      val contribs = ranks
        .join(edges, ranks("id") === edges("src"))
        .select(col("dst"),
          round(col("rank") / col("deg"), 12).cast("decimal(28,12)")
            .as("c"))
        .groupBy("dst")
        .agg(sum(col("c")).cast("double").as("inflow"))
      ranks = nodeS
        .join(contribs, nodeS("id") === contribs("dst"), "left")
        .select(nodeS("id"),
          round(lit(1.0 - d) * sv +
            lit(d) * coalesce(col("inflow"), lit(0.0)), 9).as("rank"))
        .localCheckpoint(eager = false)
    }
    ranks
  }

  /** General DIRECTED PageRank with dangling-mass redistribution over an
    * (id_a → id_b) edge list — the form a real link-graph (or directed
    * provenance/dedup-weighting graph) needs, where nodes without
    * out-edges exist and their rank must not leak:
    *
    *   rank'(v) = (1−d)/N + d·( Σ_{u→v} rank(u)/outdeg(u) + D/N ),
    *   D = Σ_{dangling u} rank(u),  N = |nodes incident to any edge|.
    *
    * Determinism contract (mirrors [[pageRank]], oracle-checkable):
    * per-edge contributions AND the dangling mass D are rounded to 12 dp
    * and summed as exact decimals; each new rank rounds to 9 dp — every
    * iteration's state is identical under any partitioning/join order in
    * this engine or the oracle's.
    *
    * Scale shape per round: ONE ranks⋈edges join + dest hash-agg (the
    * inflow), one 1-row aggregate for D (computed distributed, carried by
    * a broadcast crossJoin — never a driver action inside the loop), and
    * one left join onto the |V|-row node frame so zero-inflow nodes keep
    * their teleport+dangling share. outdeg pre-joins onto the edge list
    * once (loop-invariant). */
  def pageRankDirected(pairs: DataFrame, iterations: Int,
      d: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"need >= 1 iteration, got $iterations")
    val edges0 = pairs
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .distinct()
      .localCheckpoint(eager = true)
    val nodes = edges0.select(col("src").as("id"))
      .union(edges0.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint(eager = true)
    val outdeg = edges0.groupBy("src").agg(count(lit(1)).as("deg"))
    val edges = edges0.join(outdeg, "src")
      .select(col("src"), col("dst"), col("deg"))
      .localCheckpoint(eager = true)
    val n = nodes.count() // |V| of the edge-incident graph — KB-scale
    var ranks = nodes
      .select(col("id"), round(lit(1.0 / n), 9).as("rank"))
      .localCheckpoint(eager = false)
    for (_ <- 1 to iterations) {
      // dangling mass: rank held by nodes with no out-edges, as an exact
      // 12-dp decimal sum (ranks are 9-dp, so the round is lossless and
      // keeps the decimal sum engine-independent)
      val dangling = ranks
        .join(outdeg, ranks("id") === outdeg("src"), "left")
        .agg(coalesce(
          sum(when(col("src").isNull,
            round(col("rank"), 12).cast("decimal(28,12)"))),
          lit(0).cast("decimal(28,12)")).as("dm"))
      val contribs = ranks
        .join(edges, ranks("id") === edges("src"))
        .select(col("dst"),
          round(col("rank") / col("deg"), 12).cast("decimal(28,12)")
            .as("c"))
        .groupBy("dst")
        .agg(sum(col("c")).cast("double").as("inflow"))
      ranks = nodes
        .join(contribs, nodes("id") === contribs("dst"), "left")
        .crossJoin(broadcast(dangling))
        .select(nodes("id"),
          round(lit((1.0 - d) / n) + lit(d) *
              (coalesce(col("inflow"), lit(0.0)) +
                col("dm").cast("double") / n), 9)
            .as("rank"))
        .localCheckpoint(eager = false)
    }
    ranks
  }

  /** Fixed-round k-core peeling of an undirected edge list: each round
    * drops every node with degree < k and restricts edges to survivors;
    * after `rounds` rounds, returns the surviving nodes with their
    * degrees. The dense-community extractor for near-dup graphs (a
    * template family survives 2-core peeling; a chain of incidental
    * pairs does not). Fixed-round semantics (not run-to-fixpoint) keep
    * the operator oracle-replicable by CTE unrolling and the cost
    * envelope explicit: per round one degree agg + two semi-joins, all
    * keyed on node ids; the edge frame only shrinks. Convergence for
    * k-cores is typically a handful of rounds — callers needing the
    * exact fixpoint iterate until the edge count stops changing (same
    * discipline as dupClusters' pointer jumping). */
  def kcorePeel(pairs: DataFrame, aCol: String, bCol: String, k: Int,
      rounds: Int): DataFrame = {
    var edges = pairs
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint(eager = true)
    for (_ <- 1 to rounds) {
      val keep = edges.select(explode(array(col("a"), col("b"))).as("v"))
        .groupBy("v").agg(count(lit(1)).as("n"))
        .filter(col("n") >= k).select("v")
        .localCheckpoint(eager = true) // both semi-joins read it
      edges = edges
        .join(keep.withColumnRenamed("v", "a"), Seq("a"), "leftsemi")
        .join(keep.withColumnRenamed("v", "b"), Seq("b"), "leftsemi")
        .localCheckpoint(eager = true)
    }
    edges.select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("deg"))
  }

  /** Global triangle census of an undirected edge list: edge count,
    * wedge (length-2 path) count, triangle count, and the global
    * clustering coefficient 3·T/W — the graph-shape profile of a
    * near-dup graph (cliquish = template families, sparse = organic).
    *
    * Degree orientation (the scale trick): each edge is directed from
    * its (degree, id)-smaller endpoint to the larger, making the graph
    * acyclic with out-degree bounded by O(√|E|) on ANY graph — so wedge
    * generation from a pivot's out-neighbors is arboricity-bounded, not
    * hub-quadratic (a star node of degree 10⁶ generates ZERO wedges here
    * instead of 5·10¹¹: its edges all point inward). Each triangle is
    * counted exactly once at its order-minimal vertex. Three shuffles
    * total (degree agg, wedge self-join, closing-edge join); wedges for
    * W come from the closed-form Σ C(deg,2), not enumeration. */
  /** Semi-supervised label propagation over a weighted undirected edge
    * list (id_a, id_b, sim): seed nodes carry fixed labels; every
    * round, each NON-seed node synchronously takes the weighted-
    * majority label of its labeled neighbors (sum of edge weights per
    * label), staying unlabeled if no neighbor is labeled. The cheap
    * transductive classifier for "I hand-labeled 1 % of the corpus,
    * extend over the near-dup / kNN graph" — labels ride exactly the
    * similarity structure dedup already built, no model fit.
    *
    * Determinism contract: weights round to 9 dp before the per-(node,
    * label) DECIMAL(28,9) sum (add-order free); majority ties break on
    * min label; updates are SYNCHRONOUS (round r reads only round r−1
    * state) — so any partitioning, and the oracle's unrolled CTE
    * chain, reproduce the state bit-for-bit. A labeled non-seed CAN
    * flip later as mass arrives (spec pins one) — the standard
    * synchronous-LPA semantics, not greedy keep-first.
    *
    * Scale shape per round: ONE join (directed edges ⋈ labeled state
    * on src) + one (dst, label) hash-agg with map-side partials + one
    * |V|-row argmax window; state is |V| rows, edges shuffle on the
    * join key. `nodes` is the output universe — isolated nodes emit
    * null labels rather than vanishing. */
  def labelPropagation(nodes: DataFrame, edges: DataFrame,
      seeds: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"need rounds >= 1, got $rounds")
    val e = edges.select(col("id_a").as("src"), col("id_b").as("dst"),
        round(col("sim"), 9).as("w"))
      .unionByName(edges.select(col("id_b").as("src"),
        col("id_a").as("dst"), round(col("sim"), 9).as("w")))
    val base = nodes.select(col("id"))
      .join(seeds.select(col("id"), col("seed_label")), Seq("id"),
        "left")
    var state = base.select(col("id"),
      col("seed_label").as("label"))
    for (_ <- 1 to rounds) {
      val msg = e.join(state.filter(col("label").isNotNull)
          .select(col("id").as("src"), col("label")), Seq("src"))
        .groupBy(col("dst").as("id"), col("label"))
        .agg(sum(col("w").cast("decimal(28,9)")).as("sc"))
      val w2 = Window.partitionBy("id")
        .orderBy(col("sc").desc, col("label"))
      val best = msg.withColumn("rn", row_number().over(w2))
        .filter(col("rn") === 1)
        .select(col("id"), col("label").as("new_label"))
      state = base.join(best, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("seed_label"), col("new_label")).as("label"))
    }
    state
      .join(seeds.select(col("id"), lit(true).as("__s")), Seq("id"),
        "left")
      .select(col("id"), col("label"), col("__s").isNotNull.as("is_seed"))
      .orderBy("id")
  }

  /** Canonical simple edges (a < b, deduped, no loops) + the
    * degree-ordered triangle enumeration both census flavors share.
    * Returns (e, deg, triRows) where triRows is ONE row (s, a, b) per
    * distinct triangle: the wedge pivots at the triangle's min-(deg,id)
    * vertex, so wedge work is bounded by arboricity (hubs never pivot),
    * and the closure check is an equi-join on the canonical edge — no
    * nested loop anywhere. */
  private def triangleFrames(pairs: DataFrame, aCol: String,
      bCol: String): (DataFrame, DataFrame, DataFrame) = {
    val e = pairs
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint(eager = true) // degrees + orientation + count
    val deg = e.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val withDeg = e
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
    val oriented = withDeg.select(
      when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("src"), col("b").as("dst"), col("db").as("dd")))
        .otherwise(
          struct(col("b").as("src"), col("a").as("dst"), col("da").as("dd")))
        .as("o"))
      .select(col("o.src"), col("o.dst"), col("o.dd"))
      .localCheckpoint(eager = true) // wedge join reads it twice
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.src") === col("e2.src") &&
          (col("e1.dd") < col("e2.dd") ||
            (col("e1.dd") === col("e2.dd") &&
              col("e1.dst") < col("e2.dst"))))
      .select(col("e1.src").as("s"),
        least(col("e1.dst"), col("e2.dst")).as("a"),
        greatest(col("e1.dst"), col("e2.dst")).as("b"))
    val triRows = wedges.join(e, Seq("a", "b"), "leftsemi")
    (e, deg, triRows)
  }

  def triangleStats(pairs: DataFrame, aCol: String, bCol: String)
      : DataFrame = {
    val (e, deg, triRows) = triangleFrames(pairs, aCol, bCol)
    val tri = triRows.agg(count(lit(1)).as("t"))
    val totals = deg.agg(
      sum(shiftright(col("d") * (col("d") - 1), 1)).as("w"))
    e.agg(count(lit(1)).as("n_edges"))
      .crossJoin(broadcast(totals)).crossJoin(broadcast(tri))
      .select(col("n_edges"), col("w").as("n_wedges"),
        col("t").as("n_triangles"),
        round(when(col("w") > 0,
          lit(3.0) * col("t") / col("w")).otherwise(0.0), 6)
          .as("clustering"))
  }

  /** Per-node triangle participation and local clustering coefficient
    * — the node-level refinement of [[triangleStats]]' global census:
    * lcc(v) = 2·T(v) / (deg(v)·(deg(v)−1)), 0 below degree 2. In a
    * similarity graph this separates tight near-dup cliques (lcc → 1)
    * from hub-through-traffic (high degree, low lcc) — the signal a
    * dedup cascade uses to trust or distrust a neighborhood.
    *
    * Same triangle enumeration as the census (min-(deg,id) pivot, so
    * counting stays arboricity-bounded under skew); each triangle row
    * then fans out to its 3 vertices for ONE hash-agg — never a
    * per-vertex neighborhood intersection. `nodes` passes through so
    * isolated vertices report (0, 0, 0.0) instead of vanishing. */
  def localClustering(nodes: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val (_, deg, triRows) = triangleFrames(pairs, aCol, bCol)
    val tri = triRows
      .select(explode(array(col("s"), col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("t"))
    nodes.select(col(idCol).as("id"))
      .join(deg.select(col("v").as("id"), col("d")), Seq("id"), "left")
      .join(tri.select(col("v").as("id"), col("t")), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("d"), lit(0L)).as("degree"),
        coalesce(col("t"), lit(0L)).as("triangles"),
        round(when(coalesce(col("d"), lit(0L)) >= 2,
          lit(2.0) * coalesce(col("t"), lit(0L)) /
            (col("d") * (col("d") - 1)))
          .otherwise(lit(0.0)), 6).as("lcc"))
      .orderBy("id")
  }
}
