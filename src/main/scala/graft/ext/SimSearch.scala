package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`) —
  * SURVEY.md §7.4.
  *
  * - [[bruteForceTopK]] is the exact baseline: broadcast the (small) query
  *   set against the corpus — one pass over the corpus, no corpus shuffle,
  *   distributed top-k via window over (query, sim). At 100 TB the corpus
  *   side streams; cost is O(|corpus|·|queries|·dim).
  * - [[lshBuckets]]/[[lshTopK]] is the scale path: sign-of-projection
  *   bucketing (random-hyperplane LSH) with deterministic hyperplanes;
  *   candidates only from the query's bucket ⇒ cost drops by ~2^bits with
  *   recall traded off (recall measured in the test suite, not assumed).
  *
  * All float math is widened to double *before* accumulation, and the dot
  * product folds sequentially (functions.aggregate), so results are
  * bit-identical to an oracle evaluating the same expression order.
  */
object SimSearch {

  /** Sequential-fold dot product of two float vectors in double (lambda
    * form, kept for parity testing of the native expression). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Lambda form of [[cosine]] (parity testing only). */
  def cosineLambda(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val den = norm(a) * norm(b)
    when(den > 0, d / den)
  }

  /** Cosine similarity (null on zero norms / length mismatch) — native
    * single-pass codegen expression ([[graft.functions.CosineSimExpr]]);
    * bit-identical to [[cosineLambda]] and to the SQL oracle's
    * sequential-fold formula. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.expressions.cosine_sim(a, b)

  /** Exact top-k cosine neighbors for each query vector (excluding self).
    * `queries` must be small (it is broadcast). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int)
      : DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"),
      col("embedding").as("q_emb"))
    val joined = corpus.select(col("vec_id"), col("embedding"))
      .join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("sim", cosine(col("q_emb"), col("embedding")))
    val w = Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("vec_id"))
    joined.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("vec_id").as("n_id"), col("sim"),
        col("rnk"))
      .orderBy("q_id", "rnk")
  }

  /** Deterministic pseudo-random hyperplane component r(i,j) in [-1, 1):
    * a fixed LCG-style mix of (plane, dim) — identical formula is
    * expressible in SQL for oracle checks and costs no stored model. */
  def planeComponent(plane: Int, j: Column): Column =
    (((lit(plane.toLong * 2654435761L) + j * 40503L) % 8191L) / lit(4095.5))
      .cast("double") - 1.0

  /** LSH bucket id: `bits` sign-of-projection bits packed into a long.
    * `planeOffset` selects an independent hyperplane set (table t uses
    * offset t·bits) — the single helper serves both single- and
    * multi-table paths so the hash formula lives in one place. Native
    * codegen single pass ([[graft.functions.LshBucketExpr]]); the lambda
    * form below runs `bits` interpreted array scans per row. */
  def lshBucket(emb: Column, bits: Int, planeOffset: Int = 0): Column =
    graft.functions.VectorHash.lsh_bucket(emb, bits, planeOffset)

  /** Per-bit lambda form of [[lshBucket]] (parity testing only). */
  def lshBucketLambda(emb: Column, bits: Int, planeOffset: Int = 0)
      : Column = {
    val bitCols = (0 until bits).map { b =>
      val p = planeOffset + b
      val proj = aggregate(
        zip_with(emb, sequence(lit(0L), size(emb).cast("long") - 1),
          (x, j) => x.cast("double") * planeComponent(p, j)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << b)).otherwise(0L)
    }
    bitCols.reduce(_ + _)
  }

  /** (table, bucket) struct array for `tables` independent hyperplane
    * sets (table t uses planes t·bits … t·bits+bits−1) — the ONE place
    * the multi-table bucket encoding lives; [[lshTopKMulti]],
    * [[cosineNearDupPairsLsh]] and the SQL oracle's multiBucketCols all
    * mirror it. */
  def multiTableBuckets(emb: Column, bits: Int, tables: Int): Column =
    array((0 until tables).map { t =>
      struct(lit(t).as("t"),
        lshBucket(emb, bits, planeOffset = t * bits).as("bk"))
    }: _*)

  /** Multi-table LSH ANN: `tables` independent hyperplane sets (table t
    * uses planes t·bits … t·bits+bits−1); a corpus vector is a candidate
    * if it shares ANY table's bucket with the query (OR-amplification:
    * miss probability (1−p^bits)^tables). The recall/cost dial the
    * single-table form lacks. */
  def lshTopKMulti(corpus: DataFrame, queries: DataFrame, k: Int,
      bits: Int, tables: Int): DataFrame = {
    val cb = corpus.select(col("vec_id"), col("embedding"),
      explode(multiTableBuckets(col("embedding"), bits, tables))
        .as("bucket"))
    val qb = queries.select(col("vec_id").as("q_id"),
        col("embedding").as("q_emb"))
      .select(col("q_id"), col("q_emb"),
        explode(multiTableBuckets(col("q_emb"), bits, tables))
          .as("bucket"))
    val cands = cb.join(broadcast(qb), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select("q_id", "q_emb", "vec_id", "embedding")
      .dropDuplicates("q_id", "vec_id") // a pair may collide in >1 table
    val w = Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("vec_id"))
    cands.withColumn("sim", cosine(col("q_emb"), col("embedding")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("vec_id").as("n_id"), col("sim"), col("rnk"))
      .orderBy("q_id", "rnk")
  }

  /** Approximate top-k: candidates restricted to the query's LSH bucket.
    * At scale the corpus is hash-partitioned (and can be written bucketed)
    * by `bucket`, so a query probes one partition instead of the corpus. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, bits: Int)
      : DataFrame = {
    val cb = corpus.withColumn("bucket", lshBucket(col("embedding"), bits))
    val qb = queries.select(col("vec_id").as("q_id"),
        col("embedding").as("q_emb"))
      .withColumn("bucket", lshBucket(col("q_emb"), bits))
    val joined = cb.join(broadcast(qb), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim", cosine(col("q_emb"), col("embedding")))
    val w = Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("vec_id"))
    joined.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("vec_id").as("n_id"), col("sim"), col("rnk"))
      .orderBy("q_id", "rnk")
  }

  /** Symmetric int8 quantization of a float vector: q_i = round(x_i·127/m)
    * with m = max|x| (per-vector scale). 4× storage/bandwidth reduction
    * for 100 TB embedding corpora; reconstruction x̂_i = q_i·m/127.
    * Native one-pass kernel ([[graft.functions.QuantizeInt8Expr]]) —
    * quantized arrays write as parquet int8 columns; the lambda form below
    * re-evaluates the array_max subtree per element (no let-binding in the
    * Column DSL), O(dim²) interpreted. */
  def quantizeInt8(emb: Column): Column =
    graft.functions.QuantizeInt8.quantize_int8(emb)

  /** Lambda form of [[quantizeInt8]] (parity testing only). */
  def quantizeInt8Lambda(emb: Column): Column = {
    val m = array_max(transform(emb, x => abs(x.cast("double"))))
    struct(
      m.cast("float").as("scale"),
      transform(emb, x =>
        when(m > 0, round(x.cast("double") * 127.0 / m))
          .otherwise(0.0).cast("tinyint")).as("q"))
  }

  /** Reconstruct a float vector from [[quantizeInt8]] output. */
  def dequantizeInt8(qs: Column): Column =
    transform(qs("q"), q =>
      (q.cast("double") * qs("scale").cast("double") / 127.0).cast("float"))

  /** IVF (inverted-file) ANN: a KMeans coarse quantizer partitions the
    * corpus into `nClusters` cells; each query probes only the `nProbe`
    * nearest cells. The 100 TB shape: the assigned corpus is written
    * partitioned/bucketed by `cluster`, so a probe reads nProbe/nClusters
    * of the data; the centroid table is broadcast (KB-scale).
    * Returns the same schema as [[bruteForceTopK]]. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nClusters: Int, nProbe: Int, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    val withVec = corpus.withColumn("fv", array_to_vector(col("embedding")))
    // a handful of Lloyd iterations is plenty for a QUANTIZER — recall is
    // governed by nProbe, not centroid polish — so cap the fit cost
    // explicitly rather than rely on tol-based early exit
    val km = new KMeans().setK(nClusters).setSeed(seed).setMaxIter(8)
      .setFeaturesCol("fv").setPredictionCol("cluster")
      .fit(withVec)
    val assigned = km.transform(withVec)
      .select(col("vec_id"), col("embedding"), col("cluster"))
    // centroid table: nClusters rows, broadcast everywhere
    import spark.implicits._
    val centroids = km.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toDF("cluster", "centroid")
    // probe set: per query, the nProbe nearest centroids (euclidean, the
    // quantizer's own metric)
    val q = queries.select(col("vec_id").as("q_id"),
      col("embedding").as("q_emb"))
    val dist2 = aggregate(
      zip_with(col("q_emb"), col("centroid"),
        (x, y) => (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)
    val wP = Window.partitionBy("q_id").orderBy(col("d2"), col("cluster"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("d2", dist2)
      .withColumn("pr", row_number().over(wP))
      .filter(col("pr") <= nProbe)
      .select(col("q_id"), col("q_emb"), col("cluster"))
    // search only the probed cells
    val joined = assigned.join(broadcast(probes), Seq("cluster"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim", cosine(col("q_emb"), col("embedding")))
    val w = Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("vec_id"))
    joined.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("vec_id").as("n_id"), col("sim"), col("rnk"))
      .orderBy("q_id", "rnk")
  }

  /** LSH-blocked embedding near-dup pairs — the 100 TB form of
    * [[cosineNearDupPairs]]: candidates are pairs sharing a
    * random-hyperplane bucket, so the pair count scales with bucket
    * occupancy (~n²/2^bits per bucket), not n². `bits` must therefore
    * scale with the corpus (2^bits ≳ n keeps expected occupancy O(1);
    * a too-small bits turns the within-bucket all-pairs join back into
    * ~n²/2^bits with single-key shuffle skew — the spec asserts a
    * max-occupancy bound). Recall follows the LSH collision curve: a pair
    * at cosine θ shares all `bits` sign bits of one table with probability
    * (1 − acos(θ)/π)^bits; `tables` independent hyperplane sets
    * OR-amplify it to 1 − (1 − p^bits)^tables, the recall dial that makes
    * high-bits configs usable (recall measured, not assumed, in the
    * spec). */
  def cosineNearDupPairsLsh(corpus: DataFrame, threshold: Double,
      bits: Int, tables: Int = 1): DataFrame = {
    val b = corpus.select(col("vec_id"), col("embedding"),
      explode(multiTableBuckets(col("embedding"), bits, tables))
        .as("bucket"))
    // sim computed BEFORE the pair dedupe, filter BEFORE the shuffle: a
    // pair colliding in k tables recomputes its (cheap, native) cosine k
    // times, but the dedupe then shuffles only (id, id, sim) scalars that
    // already passed the threshold — HashAggregate instead of the
    // SortAggregate that carrying embedding arrays through dropDuplicates
    // would force, and a map-side filter that drops almost every candidate
    val scored = b.as("x").join(b.as("y"),
        col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"),
        cosine(col("x.embedding"), col("y.embedding")).as("sim"))
      .filter(col("sim") >= threshold)
    scored.dropDuplicates("id_a", "id_b")
      .orderBy("id_a", "id_b")
  }

  /** Corpus-side embedding LSH scratch for CROSS-RUN incremental
    * near-dup on the EMBEDDING path — the q242 recrawl pattern moved to
    * vector space: the persisted state is the exploded
    * (bucket = (table, bk), vec_id, embedding) frame of
    * [[multiTableBuckets]] keys. Bucket keys are PER-VECTOR
    * deterministic (fixed hyperplanes), so — exactly as with MinHash
    * band keys — nothing in this scratch shifts when a batch arrives
    * and the incremental decomposition below is exact with no
    * correction algebra. On disk the index buckets by `bucket`, making
    * the batch join the zero-exchange shape. */
  def corpusEmbeddingLshIndex(corpus: DataFrame, bits: Int,
      tables: Int): DataFrame =
    // NO fan-out here (round-18, measured and reverted): the
    // hyperplane projections are light relative to an extra AQE stage
    // at this fixture's vector count — the family's index/upsert/
    // retract queries read a net REGRESSION from the conditional
    // exchange (q255 +0.48 s, q256 +0.19 s, group net +0.3 s), unlike
    // the text/payload modalities whose per-row map work dominates
    corpus.select(col("vec_id"), col("embedding"),
      explode(multiTableBuckets(col("embedding"), bits, tables))
        .as("bucket"))

  /** Full corpus near-dup pairs FROM the persisted
    * [[corpusEmbeddingLshIndex]] — the state-only form of
    * [[cosineNearDupPairsLsh]] (the embedding sibling of
    * [[graft.ext.Dedup.minhashBandPairsFromIndex]]): the exploded-row
    * state carries vectors AND bucket keys, so a pipeline holding the
    * index derives its corpus pair set — and its cluster table — from
    * state alone; corpus embeddings are never rescanned. Same buckets,
    * same native cosine verify before the pair-dedupe shuffle ⇒
    * identical output (SimSearchSpec). */
  def cosinePairsFromIndex(index: DataFrame, threshold: Double,
      ordered: Boolean = true): DataFrame = {
    val scored = index.as("x").join(index.as("y"),
        col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"),
        cosine(col("x.embedding"), col("y.embedding")).as("sim"))
      .filter(col("sim") >= threshold)
    val out = scored.dropDuplicates("id_a", "id_b")
    if (ordered) out.orderBy("id_a", "id_b") else out
  }

  /** Merge a new batch of vectors into a persisted
    * [[corpusEmbeddingLshIndex]] — the maintenance upsert for the
    * EMBEDDING modality's index state (the exploded-row sibling of
    * [[graft.ext.Dedup.upsertPostingsIndex]]): because the state keeps
    * one ROW per (vec_id, table-bucket) rather than grouped lists,
    * the merge is an anti-join + union, no per-key set algebra at all.
    * The BATCH WINS on overlapping ids: a re-crawled vec_id's stale
    * rows are anti-joined out before its fresh rows (bucketed from the
    * embedding it has NOW) union in, so a re-delivered identical batch
    * is a no-op and a changed embedding replaces its buckets — and the
    * upserted index equals the fresh corpus∪batch rebuild EXACTLY
    * (bucket keys are per-vector deterministic; the q255 oracle IS
    * that rebuild, and a SimSearchSpec case pins idempotency +
    * batch-wins).
    *
    * Scale shape: ONE id-keyed anti-join (broadcast when the batch is
    * small) + union — the corpus embeddings are never rescanned; batch
    * buckets compute map-side. */
  def upsertEmbeddingIndex(index: DataFrame, batch: DataFrame,
      bits: Int, tables: Int): DataFrame =
    index.join(batch.select("vec_id"), Seq("vec_id"), "left_anti")
      .unionByName(corpusEmbeddingLshIndex(batch, bits, tables))

  /** Remove deleted vectors from a persisted
    * [[corpusEmbeddingLshIndex]] — [[upsertEmbeddingIndex]]'s takedown
    * half, completing maintenance on the fourth and last persisted
    * index modality. Exploded-row state makes retraction ONE id-keyed
    * anti-join: no band recompute, no list surgery — the takedown
    * request's id list is the only input (state-only by construction;
    * embeddings are never rescanned), a re-delivered takedown is a
    * no-op, and the retracted index equals the fresh rebuild over the
    * retained corpus EXACTLY (the q256 oracle IS that rebuild). */
  def retractEmbeddingIndex(index: DataFrame, deletedIds: DataFrame,
      idCol: String): DataFrame =
    index.join(deletedIds.select(col(idCol).as("vec_id")),
      Seq("vec_id"), "left_anti")

  /** Batch-vs-corpus INCREMENTAL embedding near-dup
    * ([[cosineNearDupPairsLsh]]'s recrawl form): given the persisted
    * [[corpusEmbeddingLshIndex]] and a NEW batch of vectors, produce
    * exactly the full corpus∪batch recompute's qualifying pairs
    * incident to the batch — candidates decompose into batch-batch
    * bucket matches plus batch×index matches (per-vector-deterministic
    * keys ⇒ exact, the q242 argument verbatim), each verified by the
    * same native-codegen cosine BEFORE the pair-dedupe shuffle. The
    * corpus embedding table is touched only through the index; cost is
    * O(batch buckets × occupancy), independent of corpus pair
    * structure. Equality with the filtered full recompute is the q245
    * oracle and a SimSearchSpec assertion. */
  def incrementalCosinePairsLsh(index: DataFrame, batch: DataFrame,
      threshold: Double, bits: Int, tables: Int): DataFrame = {
    val bb = batch.select(col("vec_id"), col("embedding"),
        explode(multiTableBuckets(col("embedding"), bits, tables))
          .as("bucket"))
      .localCheckpoint(eager = false) // consumed by BOTH branches
    val withinBatch = bb.as("x").join(bb.as("y"),
        col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"),
        cosine(col("x.embedding"), col("y.embedding")).as("sim"))
    // corpus and batch ids are disjoint; cosine is symmetric, so
    // ordering the pair by value keeps sim unchanged
    val batchCorpus = bb.as("x").join(index.as("y"),
        col("x.bucket") === col("y.bucket"))
      .select(least(col("x.vec_id"), col("y.vec_id")).as("id_a"),
        greatest(col("x.vec_id"), col("y.vec_id")).as("id_b"),
        cosine(col("x.embedding"), col("y.embedding")).as("sim"))
    withinBatch.unionByName(batchCorpus)
      .filter(col("sim") >= threshold)
      .dropDuplicates("id_a", "id_b")
      .orderBy("id_a", "id_b")
  }

  /** All near-duplicate pairs by cosine ≥ threshold within a blocking key
    * (here: `label`), the embedding-space analogue of Dedup.jaccardPairs.
    * Blocking bounds the pair count; at 100 TB the blocking key is an LSH
    * bucket — see [[cosineNearDupPairsLsh]]. */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val a = corpus.select(col("label"), col("vec_id").as("id_a"),
      col("embedding").as("emb_a"))
    val b = corpus.select(col("label"), col("vec_id").as("id_b"),
      col("embedding").as("emb_b"))
    a.join(b, Seq("label"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("emb_a"), col("emb_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
      .orderBy("id_a", "id_b")
  }

  /** Mutual (reciprocal) k-NN pairs from an undirected similarity pair
    * frame (id_a < id_b, sim): keep (a, b) iff b is among a's top-k
    * neighbors AND a is among b's top-k — the SemDeDup-style filter
    * that kills hub-driven false merges (a generic near-centroid "hub"
    * appears in everyone's top-k, but almost nobody is in ITS top-k, so
    * hub edges never survive the reciprocity test). Emits both ranks;
    * rank ties break on neighbor id, so the output is deterministic
    * under any partitioning.
    *
    * Takes the PAIR FRAME as input rather than computing it: at test
    * scale feed the exact all-pairs frame (the q33/q35 baseline
    * discipline); at 100 TB feed LSH candidate pairs
    * ([[cosineNearDupPairsLsh]]) — reciprocity is a rank predicate over
    * whatever candidate graph the blocker produced, and ranks within
    * the candidate graph are exactly what the production pipeline has.
    *
    * Scale shape: one explode to directed edges (2·|pairs|), ONE
    * shuffle on src for the per-node rank window, then a self-join of
    * the two ≤ n·k halves on (a, b) — never touches vectors, never
    * quadratic beyond the input pair frame itself. */
  def mutualKnnPairs(pairs: DataFrame, k: Int): DataFrame = {
    // map-side direction duplication (round-18; the Dedup.symmetrized
    // pattern): the old two-branch union evaluated the (possibly
    // expensive — q194 feeds the full |emb|²/2 cosine frame) pairs
    // pipeline once per branch; one explode duplicates each row after
    // a single evaluation. Same rows, same window, same output.
    val directed = pairs
      .select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst"),
          col("sim")),
        struct(col("id_b").as("src"), col("id_a").as("dst"),
          col("sim")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"),
        col("e.sim").as("sim"))
    val w = Window.partitionBy("src").orderBy(col("sim").desc, col("dst"))
    val top = directed.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
    val fwd = top.filter(col("src") < col("dst"))
      .select(col("src").as("id_a"), col("dst").as("id_b"), col("sim"),
        col("rnk").as("rank_ab"))
    val bwd = top.filter(col("src") > col("dst"))
      .select(col("dst").as("id_a"), col("src").as("id_b"),
        col("rnk").as("rank_ba"))
    fwd.join(bwd, Seq("id_a", "id_b"))
      .select(col("id_a"), col("id_b"), col("sim"),
        col("rank_ab"), col("rank_ba"))
      .orderBy("id_a", "id_b")
  }

  /** Per-group embedding centroids as (group, dim, value) rows — the
    * IVF-training / domain-signature primitive (mean vector per label,
    * source, or cluster) in a relational, oracle-checkable shape.
    *
    * Scale shape: `posexplode` fans each vector out to `dim` rows, then a
    * single hash-agg shuffle on (group, dim) — cardinality |groups|·dim,
    * tiny — with map-side partial sums carrying the corpus scan. No
    * vector ever crosses the wire whole, no driver collect (contrast the
    * KMeans path in [[ivfIndex]], which collects centroids by design).
    * Components are rounded to 6 dp BEFORE the exact decimal sum so the
    * result is independent of float add order across partitions. */
  /** Reciprocal-rank fusion of two ranked candidate lists:
    * rrf(d) = Σ_lists 1/(k + rank_list(d)), the standard hybrid-search
    * combiner (lexical BM25 + vector ANN) — rank-based, so the two
    * scores need no calibration; a doc missing from one list simply
    * contributes nothing from it. Inputs are (id, rank) candidate
    * lists — BOUNDED (top-N per retriever), which is what makes fusion
    * scale-free: the full-outer join and the top-K both run over ≤ 2N
    * rows regardless of corpus size. k=60 is the published default. */
  def rrfFuse(a: DataFrame, rankACol: String, b: DataFrame,
      rankBCol: String, idCol: String, k: Int = 60, topK: Int = 20)
      : DataFrame =
    a.join(b, Seq(idCol), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(k) + col(rankACol)), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k) + col(rankBCol)), lit(0.0)), 9))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(topK)

  /** Covariance matrix of the embedding dimensions — the input PCA /
    * whitening / drift monitoring start from, computed relationally in
    * ONE pass. Returns (i, j, cov) for the upper triangle i ≤ j
    * (0-based), sample covariance.
    *
    * The pseudo-dimension trick: prepend a constant 1.0 to each vector,
    * then all of n (= Σ1·1), the marginal sums Σxᵢ (= Σ1·xᵢ), and the
    * cross sums Σxᵢxⱼ fall out of ONE upper-triangle outer-product
    * accumulation.
    *
    * The accumulation is per-partition imperative (`mapPartitions` over
    * a flat (d+1)(d+2)/2 array — the genuine dense-kernel case: the
    * first, declarative version exploded d²/2 struct rows per vector
    * and spent 30 s at sf0.1 where this spends ~1 s). Each partition
    * emits ONE partial frame of (pos, exact-decimal sum) rows — the
    * mergeable-partials shape, so the shuffle carries ~2k rows per
    * partition, never the vectors — and the merge is a relational
    * decimal SUM. Per-product rounding matches the SQL oracle's
    * `CAST(x AS DECIMAL(38,12))` exactly (BigDecimal.valueOf +
    * HALF_UP, Spark's own cast semantics), and exact-decimal addition
    * is associative ⇒ result independent of row/partition order. Final
    * cov assembly is broadcast joins over the d-row marginal slice. */
  def dimCovariance(df: DataFrame, vecCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val d = df.select(size(col(vecCol))).as[Int].head() // dims: KB-scale
    val d1 = d + 1
    val nPairs = d1 * (d1 + 1) / 2
    val partials = df
      .select(transform(col(vecCol), x => x.cast("double")).as("v"))
      .as[Seq[Double]]
      .mapPartitions { it =>
        val acc = Array.fill(nPairs)(java.math.BigDecimal.ZERO)
        val a = new Array[Double](d1)
        a(0) = 1.0
        var any = false
        while (it.hasNext) {
          any = true
          val vec = it.next()
          var x = 0
          while (x < d) { a(x + 1) = vec(x); x += 1 }
          var p = 0
          var i = 0
          while (i < d1) {
            var j = i
            while (j < d1) {
              acc(p) = acc(p).add(
                java.math.BigDecimal.valueOf(a(i) * a(j))
                  .setScale(12, java.math.RoundingMode.HALF_UP))
              j += 1; p += 1
            }
            i += 1
          }
        }
        if (!any) Iterator.empty
        else Iterator.range(0, nPairs)
          .map(p => (p, scala.math.BigDecimal(acc(p))))
      }
      .toDF("pos", "ps")
    val posMap = (for { i <- 0 until d1; j <- i until d1 }
      yield (i.toLong, j.toLong)).zipWithIndex
      .map { case ((i, j), p) => (p, i, j) }
      .toDF("pos", "i", "j")
    val sums = partials.groupBy("pos")
      .agg(sum(col("ps")).cast("double").as("s"))
      .join(broadcast(posMap), "pos")
      .select(col("i"), col("j"), col("s"))
    val n = sums.filter(col("i") === 0 && col("j") === 0)
      .select(col("s").as("nn"))
    val mi = sums.filter(col("i") === 0 && col("j") >= 1)
      .select(col("j").as("i"), col("s").as("si"))
    val mj = mi.select(col("i").as("j"), col("si").as("sj"))
    sums.filter(col("i") >= 1)
      .join(broadcast(mi), "i").join(broadcast(mj), "j")
      .crossJoin(broadcast(n))
      .select((col("i") - 1).as("i"), (col("j") - 1).as("j"),
        round((col("s") - col("si") * col("sj") / col("nn")) /
          (col("nn") - 1), 6).as("cov"))
  }

  def groupCentroids(df: DataFrame, groupCol: String, vecCol: String)
      : DataFrame =
    df.select(col(groupCol),
        posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy(col(groupCol), col("dim"))
      .agg(round(
        sum(round(col("v").cast("double"), 6).cast("decimal(28,6)"))
          .cast("double") / count(lit(1)), 6).as("centroid"))

  /** Greedy k-center coreset (Gonzalez 1985) over the embedding corpus:
    * seed with the min-id point, then `k−1` rounds of farthest-point
    * selection — add the point whose squared Euclidean distance to its
    * NEAREST chosen center is maximal (ties by min id). The classic
    * 2-approximation to the k-center cover, and the standard diversity
    * selector for "which k exemplars should a human label / an eval set
    * keep" — the opposite pole from centroid sampling, which
    * over-represents dense regions.
    *
    * Returns one row per selected center: (sel 1..k, id,
    * d2_at_selection = its min-distance when chosen; 0 for the seed) —
    * d2_at_selection is non-increasing in sel (spec-pinned) and
    * sel=k's value is the corpus cover radius² of the k−1 prefix.
    *
    * Determinism contract: per-pair d² folds sequentially
    * (zip_with + aggregate, [[dot]]'s convention) and rounds at 9 dp
    * before ANY comparison; argmax ties break on id — bit-identical
    * under any partitioning and in the oracle's unrolled-CTE replica.
    *
    * Scale shape: each round is ONE broadcast crossJoin projection
    * (update the running min-distance against the single new center —
    * the 1-row frame is the only thing exchanged) + one
    * TakeOrderedAndProject(1) for the argmax; the corpus is scanned k
    * times and never shuffled. State (id, v, md) localCheckpoints per
    * round, so the plan stays flat over rounds (the dupClusters
    * discipline). */
  /** Squared Euclidean distance in double ([[dot]]'s convention — fold
    * order is the array order, so an oracle evaluating the same
    * expression order is bit-identical). Native single-pass codegen
    * kernel ([[graft.functions.SqDistExpr]]) on the k-center / cell
    * assignment / ADC hot paths; [[sqDistLambda]] keeps the
    * higher-order-function form for parity testing. */
  def sqDist(a: Column, b: Column): Column =
    graft.functions.expressions.sq_dist(a, b)

  /** Lambda form of [[sqDist]] (parity testing only). */
  def sqDistLambda(a: Column, b: Column): Column = aggregate(
    zip_with(a, b, (x, y) =>
      (x.cast("double") - y.cast("double")) *
        (x.cast("double") - y.cast("double"))),
    lit(0.0), (acc, v) => acc + v)

  /** Nearest-centroid cell assignment: (id, v, cell) with d² rounded at
    * 9 dp BEFORE the argmin and ties broken on centroid id — the
    * determinism discipline of [[kCenterCoreset]]. One broadcast
    * crossJoin (k small) + one id-keyed window; the n·k assignment
    * frame shuffles once. */
  private def assignCells(pts: DataFrame, centroids: DataFrame)
      : DataFrame = {
    val w = Window.partitionBy("id").orderBy(col("__d2"), col("cid"))
    pts.crossJoin(broadcast(centroids))
      .withColumn("__d2", round(sqDist(col("v"), col("cv")), 9))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("id"), col("v"), col("cid").as("cell"))
  }

  /** SemDeDup-style semantic near-duplicate pruning: partition the
    * corpus into coarse cells (nearest centroid — here any small
    * (cid, cv) frame: k-center seeds, a KMeans fit, an IVF codebook),
    * then WITHIN each cell mark every doc that has a smaller-id
    * neighbor at cosine ≥ `threshold` as a duplicate. Returns one row
    * per doc: (id, cell, keep) — keep=false iff a smaller-id same-cell
    * partner clears the threshold (the dominance rule of
    * Dedup.cascadeSurvival: elimination is by ANY smaller-id partner,
    * not only by surviving ones, so the result is order- and
    * partitioning-independent).
    *
    * The clustering is what makes embedding dedup tractable at 100 TB:
    * candidate pairs exist only within a cell, so pair count drops from
    * n²/2 to Σ|cell|²/2 — with balanced cells a k× reduction — and the
    * within-cell self-join is an equi-join on cell, shuffled once.
    * Cross-cell near-dups are the documented recall loss (SemDeDup's
    * own trade-off); raise k for speed, lower it for recall. */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, threshold: Double): DataFrame = {
    val pts = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    val assigned = assignCells(pts, centroids)
    val a = assigned.select(col("cell"), col("id").as("id_a"),
      col("v").as("va"))
    val b = assigned.select(col("cell"), col("id").as("id_b"),
      col("v").as("vb"))
    val elim = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(cosine(col("va"), col("vb")) >= threshold)
      .select(col("id_b").as("id")).distinct()
    assigned.select("id", "cell")
      .join(elim.withColumn("__dup", lit(true)), Seq("id"), "left")
      .select(col("id"), col("cell"), col("__dup").isNull.as("keep"))
      .orderBy("id")
  }

  /** Lloyd k-means refinement from a given seed codebook: `rounds` of
    * (assign to nearest centroid → exact-decimal per-(cell, dim) mean).
    * Returns the final codebook as (cell, dim, centroid, n_members)
    * rows, n_members from the assignment that produced the final mean.
    * The codebook trainer for the IVF index (q49) whose seeds come from
    * [[kCenterCoreset]] — Gonzalez gives the spread, Lloyd pulls the
    * centers onto the density.
    *
    * Determinism: assignment is [[assignCells]] (9-dp d², min-cid
    * ties); means are [[groupCentroids]]' arithmetic — components
    * rounded to 6 dp BEFORE an exact DECIMAL(28,6) sum, so every round
    * is independent of float add order and the oracle's unrolled CTE
    * chain reproduces the run bit-for-bit.
    *
    * Scale shape per round: one broadcast crossJoin + id-window
    * (assignment) and one posexplode + (cell, dim) hash-agg with
    * map-side partials (means) — the corpus shuffles on id once per
    * round and nothing else moves; the codebook itself (k·dim rows)
    * reassembles via a k-row collect_list agg. Empty cells drop out,
    * exactly as in Lloyd. */
  def lloydRefine(corpus: DataFrame, idCol: String, vecCol: String,
      seeds: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"need rounds >= 1, got $rounds")
    val pts = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .localCheckpoint(eager = false) // scanned every round
    var cent = seeds
    var means: DataFrame = null
    for (_ <- 1 to rounds) {
      val assigned = assignCells(pts, cent)
      means = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cell", "dim")
        .agg(round(
          sum(round(col("x").cast("double"), 6).cast("decimal(28,6)"))
            .cast("double") / count(lit(1)), 6).as("centroid"),
          count(lit(1)).as("n_members"))
      cent = means.groupBy("cell")
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("centroid")))),
          s => s.getField("centroid")).as("cv"))
        .select(col("cell").as("cid"), col("cv"))
    }
    means.select(col("cell"), col("dim"), col("centroid"),
        col("n_members"))
      .orderBy("cell", "dim")
  }

  def kCenterCoreset(df: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    def d2(a: Column, b: Column): Column = sqDist(a, b)
    val pts = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .localCheckpoint(eager = true) // scanned every round
    val seed = pts.orderBy("id").limit(1)
      .select(col("id").as("cid"), col("v").as("cv"),
        lit(1).as("sel"), lit(0.0).as("d2sel"))
      .localCheckpoint(eager = true)
    var picked = Seq(seed)
    var state = pts
      .crossJoin(broadcast(seed.select(col("cv"))))
      .select(col("id"), col("v"), round(d2(col("v"), col("cv")), 9).as("md"))
      .localCheckpoint(eager = false)
    for (i <- 2 to k) {
      val next = state
        .orderBy(col("md").desc, col("id")).limit(1)
        .select(col("id").as("cid"), col("v").as("cv"),
          lit(i).as("sel"), col("md").as("d2sel"))
        .localCheckpoint(eager = true) // read by state update AND output
      picked = picked :+ next
      if (i < k) state = state
        .crossJoin(broadcast(next.select(col("cv"))))
        .select(col("id"), col("v"),
          least(col("md"), round(d2(col("v"), col("cv")), 9)).as("md"))
        .localCheckpoint(eager = false)
    }
    picked.map(_.select(col("sel"), col("cid"), col("d2sel")))
      .reduce(_.unionAll(_))
  }

  /** Product-quantization index: split each vector into `m` contiguous
    * subspaces, learn a deterministic k-center codebook per subspace
    * (Gonzalez — same machinery as [[kCenterCoreset]], so codebooks
    * are reproducible with no RNG and no iterative convergence), and
    * encode every vector as its m nearest-centroid codes. m·log₂k bits
    * replace d·32 — the storage layout behind IVF-PQ ANN serving at
    * corpus scale. Returns (codes, books): codes one (id, sub, code)
    * row per vector-subspace; books the (sub, cid, cv) codebooks
    * (m·k rows, broadcastable by construction).
    *
    * Everything is relational: per subspace one sliced projection of
    * the corpus (map-side `slice`, no shuffle), the k-round Gonzalez
    * scan, and one broadcast nearest-centroid assignment (9-dp d²,
    * min-code tie — [[assignCells]]' exact contract, mirrored by the
    * oracle). Code c is the ORDER the centroid was selected in (c=0
    * is the min-id seed), so code values are themselves stable across
    * runs and partitionings. */
  def pqIndex(emb: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int): (DataFrame, DataFrame) = {
    val d = emb.select(size(col(vecCol)).cast("int")).first().getInt(0)
    require(d % m == 0, s"dim $d not divisible into $m subspaces")
    val len = d / m
    // The m subspace builds are INDEPENDENT but each is internally
    // sequential (Gonzalez picks k centers one action at a time), so a
    // serial loop runs ~m·k tiny jobs back to back while most of the
    // cluster idles. Submit the subspaces from a small thread pool
    // (guide §2.6 "overlap independent jobs": actions are only
    // sequential because driver code calls them sequentially) — wall
    // time becomes ONE subspace's chain, and each subspace's jobs
    // back-fill the others' stragglers. Results are deterministic:
    // every part's content is independent of scheduling, and the union
    // below keeps subspace order.
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(m)
    val parts = try {
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutorService(pool)
      Await.result(Future.sequence((0 until m).map { s => Future {
        val sliced = emb.select(col(idCol).as("id"),
          slice(col(vecCol), s * len + 1, len).as("v"))
          .localCheckpoint(eager = false) // Gonzalez + assignment reread
        val sel = kCenterCoreset(sliced, "id", "v", k)
        val cb = sel.select((col("sel") - 1).cast("int").as("cid"),
            col("cid").as("pid"))
          .join(sliced.select(col("id").as("pid"), col("v").as("cv")),
            "pid")
          .select(col("cid"), col("cv"))
        val codes = assignCells(sliced, cb)
          .select(col("id"), lit(s).as("sub"), col("cell").as("code"))
        val books = cb.select(lit(s).as("sub"), col("cid"), col("cv"))
        (codes, books)
      }}), Duration.Inf)
    } finally pool.shutdown()
    (parts.map(_._1).reduce(_.unionAll(_)),
      parts.map(_._2).reduce(_.unionAll(_)))
  }

  /** [[pqIndex]] codes pivoted wide: (id, c0 … c{m-1}). */
  def pqCodesWide(emb: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int): DataFrame = {
    val (codes, _) = pqIndex(emb, idCol, vecCol, m, k)
    pqCodesWideFrom(codes, idCol, m)
  }

  /** Wide pivot of a (possibly scratch-read) codes frame. */
  def pqCodesWideFrom(codes: DataFrame, idCol: String, m: Int)
      : DataFrame = {
    val aggs = (0 until m).map(s =>
      max(when(col("sub") === s, col("code"))).as(s"c$s"))
    codes.groupBy(col("id").as(idCol))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(idCol)
  }

  /** Asymmetric-distance (ADC) top-k over the [[pqIndex]] codes: the
    * query stays FULL precision; per subspace a (query × centroid)
    * distance table of |q|·m·k rows is broadcast, and each corpus
    * vector's approximate distance is the sum of its m table lookups —
    * the corpus is scanned as CODES ONLY (m small ints per vector),
    * never as raw floats: at 100 TB the scan reads the ~100×-smaller
    * code columns and one hash-join against a KB table, the entire
    * point of PQ serving. Per-lookup d² is 9-dp rounded and the m
    * terms sum exactly as DECIMAL(28,9), so ranking is add-order free;
    * ties break on candidate id. Self-matches are excluded. */
  def adcTopK(emb: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, m: Int, k: Int, topK: Int): DataFrame = {
    val (codes, books) = pqIndex(emb, idCol, vecCol, m, k)
    val d = emb.select(size(col(vecCol)).cast("int")).first().getInt(0)
    adcTopKFrom(codes, books, queries, idCol, vecCol, m, d / m, topK)
  }

  /** [[adcTopK]] against a PRECOMPUTED index — the serving entry: codes
    * and books come off scratch/parquet (the q55 materialize-once
    * discipline; ints and float arrays round-trip exactly, so results
    * match the inline build bit-for-bit). `cand` optionally restricts
    * scoring to (q_id, id) candidate pairs — the IVF hook. */
  def adcTopKFrom(codes: DataFrame, books: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, m: Int,
      len: Int, topK: Int, cand: Option[DataFrame] = None)
      : DataFrame = {
    val qsub = (0 until m).map(s =>
        queries.select(col(idCol).as("q_id"), lit(s).as("sub"),
          slice(col(vecCol), s * len + 1, len).as("qv")))
      .reduce(_.unionAll(_))
    val dtab = qsub.join(broadcast(books), Seq("sub"))
      .select(col("q_id"), col("sub"), col("cid").as("code"),
        round(sqDist(col("qv"), col("cv")), 9).as("qd2"))
    val base = cand match {
      case Some(c) => c.join(codes, Seq("id"))
        .join(broadcast(dtab), Seq("q_id", "sub", "code"))
      case None => codes.join(broadcast(dtab), Seq("sub", "code"))
    }
    val scored = base
      .filter(col("id") =!= col("q_id"))
      .groupBy("q_id", "id")
      .agg(sum(col("qd2").cast("decimal(28,9)")).cast("double")
        .as("adist"))
    val w = Window.partitionBy("q_id").orderBy(col("adist"), col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("id").as("n_id"), col("adist"),
        col("rank"))
      .orderBy("q_id", "rank")
  }

  /** Full IVF-PQ serving path: a coarse k-center quantizer partitions
    * the corpus into `ivfK` cells; each query probes only its `nprobe`
    * nearest cells and ADC-ranks the candidates there via the
    * [[pqIndex]] codes. The two compressions compose: IVF cuts the
    * CANDIDATE COUNT by ~nprobe/ivfK, PQ cuts the BYTES PER CANDIDATE
    * by ~d·32/(m·log₂k) — at 100 TB the scan reads small code columns
    * of a cell-pruned slice, which is the production ANN serving
    * shape. Both quantizers are deterministic Gonzalez (no RNG), the
    * probe ranks 9-dp d² with min-centroid-id ties, and ADC sums
    * decimal-exact — the whole path is oracle-replicable. Recall is a
    * measured trade (cells probed × code resolution), not an
    * assumption — same discipline as the LSH family (q49). */
  def ivfAdcTopK(emb: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, ivfK: Int, nprobe: Int, m: Int, k: Int,
      topK: Int): DataFrame = {
    val (codes, books) = pqIndex(emb, idCol, vecCol, m, k)
    val d = emb.select(size(col(vecCol)).cast("int")).first().getInt(0)
    ivfAdcTopKFrom(emb, idCol, vecCol, queries, ivfK, nprobe,
      codes, books, m, d / m, topK)
  }

  /** [[ivfAdcTopK]] against a PRECOMPUTED PQ index (coarse quantizer
    * still built here — it is one ivfK-round Gonzalez over the corpus,
    * owned by its sole caller). */
  def ivfAdcTopKFrom(emb: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, ivfK: Int, nprobe: Int, codes: DataFrame,
      books: DataFrame, m: Int, len: Int, topK: Int): DataFrame = {
    val pts = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
    val sel = kCenterCoreset(pts, "id", "v", ivfK)
    val cent = sel.select(col("cid").as("pid"))
      .join(pts.select(col("id").as("pid"), col("v").as("cv")), "pid")
      .select(col("pid").as("cid"), col("cv"))
    val assigned = assignCells(pts, cent).select(col("id"), col("cell"))
    val wProbe = Window.partitionBy("q_id")
      .orderBy(col("__d2"), col("cid"))
    val probe = queries
      .select(col(idCol).as("q_id"), col(vecCol).as("qv"))
      .crossJoin(broadcast(cent))
      .withColumn("__d2", round(sqDist(col("qv"), col("cv")), 9))
      .withColumn("__rn", row_number().over(wProbe))
      .filter(col("__rn") <= nprobe)
      .select(col("q_id"), col("cid").as("cell"))
    val cand = probe.join(assigned, Seq("cell"))
      .select(col("q_id"), col("id"))
    adcTopKFrom(codes, books, queries, idCol, vecCol, m, len, topK,
      cand = Some(cand))
  }

  /** Result of [[pc1]]: 0-based per-dimension loadings of the dominant
    * eigenvector (sign-canonicalized: first nonzero loading positive),
    * the unrounded Rayleigh eigenvalue estimate, and the unrounded
    * covariance trace (total variance). */
  final case class Pc1(loadings: Array[Double], lambda: Double,
      trace: Double)

  private def dec12(x: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(x)
      .setScale(12, java.math.RoundingMode.HALF_UP)

  private def round9(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Exact-decimal sum of `scale`-dp-rounded terms, back to double —
    * the driver-side twin of `CAST(SUM(CAST(t AS DECIMAL(38,scale)))
    * AS DOUBLE)`, add-order free.
    *
    * Scale choice is a CORRECTNESS decision, not precision vanity: a
    * product of two short decimals (6-dp cov × 9-dp iterate) is an
    * EXACT 15-dp decimal, so rounding it at 12 dp lands exactly on
    * .5 ties — where BigDecimal's shortest-repr rounding and DuckDB's
    * scaled-float cast disagree. At scale 15 no rounding occurs and
    * both agree bit-for-bit; 12 dp is safe only for arbitrary-double
    * terms whose decimal tails make ties measure-zero. */
  private def sumDec(ts: Iterator[Double], scale: Int): Double =
    ts.foldLeft(java.math.BigDecimal.ZERO)((a, t) =>
      a.add(java.math.BigDecimal.valueOf(t)
        .setScale(scale, java.math.RoundingMode.HALF_UP)))
      .doubleValue()

  private def sumDec12(ts: Iterator[Double]): Double = sumDec(ts, 12)

  /** Dominant eigenpair of the [[dimCovariance]] matrix via `rounds`
    * deterministic power-iteration steps — the top principal component,
    * feeding whitening / drift monitoring / diversity scoring of an
    * embedding corpus.
    *
    * Scale shape: the expensive pass (covariance) is the distributed
    * one-scan [[dimCovariance]]; its d×d output is CORPUS-INDEPENDENT
    * (KB for d=64), so collecting it and eigensolving on the driver is
    * the documented KB-scale-scalar pattern, not a driver bottleneck —
    * the corpus itself never leaves the executors.
    *
    * Determinism contract (mirrored verbatim by the DuckDB oracle):
    * start v0 ∝ (1,2,…,d) (a uniform start can be ⊥ the dominant
    * eigenvector for sign-alternating structure; an index ramp has a
    * nonzero overlap for any non-pathological matrix), each step
    * w = C·v with per-product 12-dp HALF_UP rounding into an exact
    * decimal sum (add-order free), normalize in IEEE double, re-round
    * the iterate to 9 dp. At 9-dp granularity the iterate reaches a
    * fixed point once converged, so `rounds` beyond convergence is
    * idempotent. λ is the Rayleigh quotient vᵀ(Cv) under the same
    * rounding; v is sign-flipped so its first nonzero entry is
    * positive (+0.0 canonicalizes any -0.0 produced by the flip). */
  def pc1(cov: DataFrame, rounds: Int = 20): Pc1 = {
    val rows = cov.select(col("i").cast("int"), col("j").cast("int"),
      col("cov").cast("double")).collect()
    val d = rows.iterator.map(_.getInt(1)).max + 1
    val c = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      val (i, j, v) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      c(i)(j) = v; c(j)(i) = v
    }
    val n0 = math.sqrt((1 to d).map(k => k.toDouble * k).sum)
    var v = Array.tabulate(d)(i => round9((i + 1) / n0))
    var w = new Array[Double](d)
    for (_ <- 1 to rounds) {
      w = Array.tabulate(d)(i =>
        sumDec(Iterator.range(0, d).map(j => c(i)(j) * v(j)), 15))
      val nrm = math.sqrt(sumDec12(w.iterator.map(x => x * x)))
      v = w.map(x => round9(x / nrm))
    }
    val wf = Array.tabulate(d)(i =>
      sumDec(Iterator.range(0, d).map(j => c(i)(j) * v(j)), 15))
    val lambda = sumDec12(Iterator.range(0, d).map(i => v(i) * wf(i)))
    val trace = sumDec12(Iterator.range(0, d).map(i => c(i)(i)))
    val s = v.find(_ != 0.0).map(x => if (x < 0) -1.0 else 1.0)
      .getOrElse(1.0)
    Pc1(v.map(x => x * s + 0.0), lambda, trace)
  }

  /** [[pc1]] as a frame: (dim, loading, lambda1, explained) — one row
    * per dimension, eigenvalue and explained-variance ratio repeated
    * (6 dp). */
  def pc1Frame(spark: org.apache.spark.sql.SparkSession, cov: DataFrame,
      rounds: Int = 20): DataFrame = {
    import spark.implicits._
    val r = pc1(cov, rounds)
    val lam = round6(r.lambda)
    val exp = round6(r.lambda / r.trace)
    r.loadings.zipWithIndex
      .map { case (l, i) => (i.toLong, l, lam, exp) }.toSeq
      .toDF("dim", "loading", "lambda1", "explained")
  }

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Per-vector projection onto a driver-known direction (e.g. the
    * [[pc1]] loadings): each product is HALF_UP-rounded to 12-dp
    * "micros" (×10¹² through a DECIMAL(38,0) cast — the same rounding
    * DuckDB's cast performs), summed EXACTLY as a long fold, then
    * rescaled — add-order free without decimal-precision drift (a pure
    * DECIMAL(38,12) fold is impossible in Spark: (38,12)+(38,12)
    * widens to (38,11), silently rounding each step). Long micros are
    * exact while Σ|xᵢ·loadᵢ| < 9·10³ — comfortably true for unit-norm
    * loadings over O(1)-scaled embeddings. SHUFFLE-FREE: the loadings
    * ride along as an array literal and the dot product is a
    * sequential `aggregate` fold inside the scan — no explode, no
    * join, no exchange; at 100 TB this is a pure map over the corpus. */
  def project(emb: DataFrame, vecCol: String, idCol: String,
      loadings: Array[Double], outCol: String = "pc1"): DataFrame = {
    val micros = zip_with(col(vecCol), lit(loadings),
      (x, l) => (x.cast("double") * l * lit(1e12))
        .cast("decimal(38,0)").cast("long"))
    emb.select(col(idCol),
      round(aggregate(micros, lit(0L), (acc, y) => acc + y)
        .cast("double") / lit(1e12), 6).as(outCol))
  }
}
