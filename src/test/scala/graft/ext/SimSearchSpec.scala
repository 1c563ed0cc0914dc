package graft.ext

import graft.SparkSpec
import graft.engine.Tables
import org.apache.spark.sql.functions._

class SimSearchSpec extends SparkSpec {
  import spark.implicits._

  test("cosine: identical vectors → 1, orthogonal → 0") {
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f), "same"),
      (Array(1f, 0f), Array(0f, 1f), "orth"))
      .toDF("a", "b", "tag")
    val out = df.select(col("tag"),
      SimSearch.cosine(col("a"), col("b")).as("c"))
      .as[(String, Double)].collect().toMap
    assert(math.abs(out("same") - 1.0) < 1e-12)
    assert(math.abs(out("orth")) < 1e-12)
  }

  test("bruteForceTopK excludes self, respects k, descending sim") {
    val emb = Tables.embeddings(spark, sf0001)
    val out = SimSearch.bruteForceTopK(emb,
      emb.filter(col("vec_id") === 0), k = 5).collect()
    assert(out.length == 5)
    assert(out.forall(_.getLong(1) != 0L)) // no self
    val sims = out.map(_.getDouble(2)).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("lshTopK achieves nonzero recall against brute force") {
    val emb = Tables.embeddings(spark, sf0001).cache()
    val q = emb.filter(col("vec_id") < 10)
    val exact = SimSearch.bruteForceTopK(emb, q, 10)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val approx = SimSearch.lshTopK(emb, q, 10, bits = 4)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // 4-bit LSH on near-random 64-dim vectors: recall is modest by design;
    // the test pins that the bucketing is sane, not that it's magic
    assert(recall > 0.03, s"recall=$recall")
    assert(approx.nonEmpty)
  }

  test("multi-table LSH: recall at least single-table (OR-amplification)") {
    val emb = Tables.embeddings(spark, sf0001).cache()
    val q = emb.filter(col("vec_id") < 10)
    val exact = SimSearch.bruteForceTopK(emb, q, 10)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    def recallOf(df: org.apache.spark.sql.DataFrame) =
      (df.select("q_id", "n_id").as[(Long, Long)].collect().toSet & exact)
        .size.toDouble / exact.size
    val single = recallOf(SimSearch.lshTopK(emb, q, 10, bits = 4))
    val multi = recallOf(SimSearch.lshTopKMulti(emb, q, 10,
      bits = 4, tables = 4))
    assert(multi >= single, s"multi=$multi single=$single")
    assert(multi > 0.25, s"multi=$multi") // OR-amplification floor
  }

  test("ivfTopK: full probe == brute force; partial probe has high recall") {
    val emb = Tables.embeddings(spark, sf0001).cache()
    val q = emb.filter(col("vec_id") < 10)
    val exact = SimSearch.bruteForceTopK(emb, q, 10)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    // probing every cell must recover the exact result
    val full = SimSearch.ivfTopK(emb, q, 10, nClusters = 8, nProbe = 8)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    assert(full == exact)
    // probing half the cells: near-random vectors spread neighbors across
    // cells, so pin a sane floor rather than a magic recall
    val partial = SimSearch.ivfTopK(emb, q, 10, nClusters = 8, nProbe = 4)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (exact & partial).size.toDouble / exact.size
    assert(recall > 0.3, s"recall=$recall")
  }

  test("lshBucket is deterministic and in range") {
    val emb = Tables.embeddings(spark, sf0001).limit(50)
    val b1 = emb.select(SimSearch.lshBucket(col("embedding"), 4))
      .as[Long].collect().toSeq
    val b2 = emb.select(SimSearch.lshBucket(col("embedding"), 4))
      .as[Long].collect().toSeq
    assert(b1 == b2)
    assert(b1.forall(b => b >= 0 && b < 16))
  }

  test("cosineNearDupPairsLsh: subset of brute-force pairs, bounded work") {
    val emb = Tables.embeddings(spark, sf0001).cache()
    // brute-force truth at a low threshold (within-label blocking removed:
    // compare against the unblocked pair set on a small corpus)
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    val exact = a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", SimSearch.cosine(col("ea"), col("eb")))
      .filter(col("sim") >= 0.25)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = SimSearch.cosineNearDupPairsLsh(emb, 0.25, bits = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact)) // no false positives (sim re-verified)
    if (exact.nonEmpty) {
      val recall = lsh.size.toDouble / exact.size
      // 2-bit hyperplane LSH on cosine≥0.25 pairs: collision prob ≥
      // (1 - acos(.25)/pi)^2 ≈ 0.33 — assert a loose floor
      assert(recall > 0.1, s"recall=$recall of ${exact.size}")
    }
  }

  test("incrementalCosinePairsLsh == full cosineNearDupPairsLsh " +
    "filtered to batch-incident pairs; invariant under repartitioning") {
    val emb = Tables.embeddings(spark, sf0001)
    val corpus = emb.filter(col("vec_id") % 5 =!= 3)
    val batch = emb.filter(col("vec_id") % 5 === 3)
    val index = SimSearch.corpusEmbeddingLshIndex(corpus,
      bits = 16, tables = 4)
    val inc = SimSearch.incrementalCosinePairsLsh(index, batch,
        threshold = 0.25, bits = 16, tables = 4)
      .collect().toSeq
    // the q245 contract: per-vector-deterministic bucket keys make the
    // decomposition exact, so the incremental path equals the full
    // corpus∪batch recompute restricted to batch-incident pairs
    val full = SimSearch.cosineNearDupPairsLsh(emb,
        threshold = 0.25, bits = 16, tables = 4)
      .filter(col("id_a") % 5 === 3 || col("id_b") % 5 === 3)
      .collect().toSeq
    assert(inc.nonEmpty && inc == full)
    val repart = SimSearch.incrementalCosinePairsLsh(
        index.repartition(7), batch.repartition(5),
        threshold = 0.25, bits = 16, tables = 4)
      .collect().toSeq
    assert(repart == inc)
  }

  test("cosinePairsFromIndex == cosineNearDupPairsLsh over the same " +
    "corpus (the state-only pair derivation sharedEmbState builds " +
    "clusters from — embeddings scanned once, for the index)") {
    val emb = Tables.embeddings(spark, sf0001)
    val corpus = emb.filter(col("vec_id") % 5 =!= 3)
    val direct = SimSearch.cosineNearDupPairsLsh(corpus,
        threshold = 0.25, bits = 16, tables = 4)
      .as[(Long, Long, Double)].collect().toSeq
    val viaIndex = SimSearch.cosinePairsFromIndex(
        SimSearch.corpusEmbeddingLshIndex(corpus, bits = 16,
          tables = 4), threshold = 0.25)
      .as[(Long, Long, Double)].collect().toSeq
    assert(viaIndex == direct && direct.nonEmpty)
  }

  test("upsertEmbeddingIndex / retractEmbeddingIndex (q255/q256): both " +
    "maintenance directions equal the fresh rebuild over the " +
    "post-maintenance vector set, re-delivery is a no-op in BOTH " +
    "directions, the batch WINS on a re-crawled id whose embedding " +
    "changed, and add-then-retract round-trips the index") {
    val bits = 16; val tables = 4
    val emb = Tables.embeddings(spark, sf0001)
    val corpus = emb.filter(col("vec_id") % 5 =!= 3)
    val batch = emb.filter(col("vec_id") % 5 === 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("bucket.t"), col("bucket.bk"), col("vec_id"))
        .as[(Int, Long, Long)].collect().toSet
    def fresh(df: org.apache.spark.sql.DataFrame) =
      rows(SimSearch.corpusEmbeddingLshIndex(df, bits, tables))
    val idx = SimSearch.corpusEmbeddingLshIndex(corpus, bits, tables)
    // upsert == fresh corpus∪batch rebuild
    val up = SimSearch.upsertEmbeddingIndex(idx, batch, bits, tables)
    assert(rows(up) == fresh(emb) && rows(up) != rows(idx))
    // re-delivered upsert: anti-join makes it a no-op
    assert(rows(SimSearch.upsertEmbeddingIndex(up, batch, bits, tables))
      == rows(up))
    // batch WINS on an overlapping id: re-crawl one corpus vector with
    // a flipped embedding — its rows must be the NEW embedding's
    // buckets, and every other corpus row must stay put
    val vid = corpus.select(min("vec_id")).as[Long].head()
    val recrawl = corpus.filter(col("vec_id") === vid)
      .select(col("vec_id"),
        transform(col("embedding"), x => -x).as("embedding"))
    val up2 = SimSearch.upsertEmbeddingIndex(idx, recrawl, bits, tables)
    assert(rows(up2) == fresh(corpus.filter(col("vec_id") =!= vid)
      .select("vec_id", "embedding").unionByName(recrawl)))
    // retract == fresh rebuild over the retained vectors
    val deleted = corpus.filter(col("vec_id") % 7 === 2)
      .select("vec_id")
    val ret = SimSearch.retractEmbeddingIndex(idx, deleted, "vec_id")
    assert(rows(ret) == fresh(corpus.filter(col("vec_id") % 7 =!= 2)))
    // re-delivered takedown: no-op by anti-join construction
    assert(rows(SimSearch.retractEmbeddingIndex(ret, deleted, "vec_id"))
      == rows(ret))
    // the round-trip law: add then retract the SAME batch == start
    assert(rows(SimSearch.retractEmbeddingIndex(up,
      batch.select("vec_id"), "vec_id")) == rows(idx))
  }

  test("lsh_bucket (native) == per-bit lambda form across plane offsets") {
    val emb = Tables.embeddings(spark, sf0001)
    for (off <- Seq(0, 16, 48)) {
      val bad = emb.select(
        SimSearch.lshBucket(col("embedding"), 16, off).as("native"),
        SimSearch.lshBucketLambda(col("embedding"), 16, off).as("lambda"))
        .filter(col("native") =!= col("lambda")).count()
      assert(bad == 0, s"offset=$off")
    }
  }

  test("q60 config (bits=16, 4 tables): occupancy bounded, planted " +
      "near-dups recovered") {
    val emb = Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding").cache()
    val n = emb.count()
    // occupancy: 2^16 buckets/table must keep the biggest bucket far from
    // n — the within-bucket all-pairs join is then bounded (the bits=2
    // scale-killer config had max occupancy ~n/4)
    val maxOcc = (0 until 4).map { t =>
      emb.groupBy(SimSearch.lshBucket(col("embedding"), 16, t * 16)
          .as("b"))
        .agg(count(lit(1)).as("cnt")).agg(max("cnt")).as[Long].head()
    }.max
    assert(maxOcc <= math.max(8L, n / 20),
      s"max bucket occupancy $maxOcc of $n vectors")
    // recall: plant a deterministically-perturbed near-dup of every vector
    // (cosine ≈ 0.99+); OR-amplified 16-bit tables must recover nearly all
    val planted = emb.select((col("vec_id") + 100000).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        (x + ((i % 3) - 1).cast("float") * lit(0.02f)).cast("float"))
        .as("embedding"))
    val corpus = emb.unionByName(planted)
    val pairs = SimSearch.cosineNearDupPairsLsh(corpus, threshold = 0.9,
        bits = 16, tables = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val truth = emb.as("x")
      .join(planted.as("y"), col("y.vec_id") === col("x.vec_id") + 100000)
      .withColumn("sim", SimSearch.cosine(col("x.embedding"),
        col("y.embedding")))
      .filter(col("sim") >= 0.9)
      .select(col("x.vec_id")).as[Long].collect().toSet
    assert(truth.nonEmpty)
    val recall = truth.count(v => pairs.contains((v, v + 100000)))
      .toDouble / truth.size
    assert(recall >= 0.8, s"recall=$recall over ${truth.size} planted pairs")
  }

  test("int8 quantization: 4x smaller, cosine preserved to 3 decimals") {
    val emb = Tables.embeddings(spark, sf0001).limit(300)
    val rt = emb.withColumn("qs", SimSearch.quantizeInt8(col("embedding")))
      .withColumn("back", SimSearch.dequantizeInt8(col("qs")))
      .withColumn("fidelity",
        SimSearch.cosine(col("embedding"), col("back")))
    val minFid = rt.agg(min("fidelity")).head().getDouble(0)
    assert(minFid > 0.995, s"minFidelity=$minFid")
    // quantized values genuinely fit int8
    val bad = rt.select(explode(col("qs.q")).as("q"))
      .filter(col("q") > 127 || col("q") < -127).count()
    assert(bad == 0)
    // zero vectors survive (scale 0 → all-zero reconstruction)
    import spark.implicits._
    val z = Seq(Array(0f, 0f)).toDF("embedding")
      .withColumn("qs", SimSearch.quantizeInt8(col("embedding")))
      .withColumn("back", SimSearch.dequantizeInt8(col("qs")))
      .select("back").head().getSeq[Float](0)
    assert(z.toSeq == Seq(0f, 0f))
  }

  test("quantize_int8 (native) == lambda form, incl. empty/null edges") {
    val emb = Tables.embeddings(spark, sf0001)
    val bad = emb.select(
      SimSearch.quantizeInt8(col("embedding")).as("n"),
      SimSearch.quantizeInt8Lambda(col("embedding")).as("l"))
      .filter(col("n.scale") =!= col("l.scale") ||
        col("n.q") =!= col("l.q")).count()
    assert(bad == 0)
    // edges: empty array → null scale + empty codes; null element → null
    // code under m>0; zero vector → scale 0, zero codes
    val edges = Seq(1).toDF("i").select(
      array().cast("array<float>").as("empty"),
      array(lit(1f), lit(null).cast("float")).as("withnull"),
      array(lit(0f), lit(0f)).as("zeros"))
    for (c <- Seq("empty", "withnull", "zeros")) {
      val r = edges.select(
        SimSearch.quantizeInt8(col(c)).as("n"),
        SimSearch.quantizeInt8Lambda(col(c)).as("l")).head()
      assert(r.getStruct(0) == r.getStruct(1), s"col=$c: $r")
    }
  }

  test("native kernels stay NaN/Infinity-safe (lambda parity where the " +
      "lambda is total)") {
    // Spark orders NaN above every number in comparisons and array_max;
    // the native kernels must not fall into Java's NaN-is-false traps
    val weird = Seq(
      Array(1f, Float.NaN),
      Array(Float.NaN, Float.NaN),
      Array(Float.PositiveInfinity, 1f),
      Array(Float.NegativeInfinity, 2f))
      .toDF("embedding")
    // lshBucket's lambda is pure comparisons — total, so exact parity holds
    val lshBad = weird.select(
      SimSearch.lshBucket(col("embedding"), 4).as("n"),
      SimSearch.lshBucketLambda(col("embedding"), 4).as("l"))
      .filter(col("n") =!= col("l")).count()
    assert(lshBad == 0)
    // the quantize LAMBDA throws under Spark 4's ANSI tinyint cast on
    // NaN/Inf; the native kernel is deliberately total instead — pin its
    // golden outputs (NaN-greatest max, pass-through round, toByte edges)
    val rows = weird.select(
        SimSearch.quantizeInt8(col("embedding")).as("q"))
      .select(col("q.scale").as("scale"), col("q.q").as("codes"))
      .collect()
      .map(r => (r.getFloat(0), r.getSeq[Byte](1).toSeq))
    assert(rows(0)._1.isNaN && rows(0)._2 == Seq[Byte](0, 0))
    assert(rows(1)._1.isNaN && rows(1)._2 == Seq[Byte](0, 0))
    assert(rows(2)._1.isPosInfinity && rows(2)._2 == Seq[Byte](0, 0))
    assert(rows(3)._1.isPosInfinity && rows(3)._2 == Seq[Byte](0, 0))
  }

  test("cosineNearDupPairs: symmetric threshold, id_a < id_b") {
    val pairs = SimSearch.cosineNearDupPairs(
      Tables.embeddings(spark, sf0001), 0.3).collect()
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.forall(r => r.getDouble(2) >= 0.3))
  }

  test("mutualKnnPairs: hand-traced reciprocity at k=1 (tie breaks to " +
    "smaller neighbor id) and k=2 (all pairs mutual, ranks exact)") {
    // 3 nodes; sims: (1,2)=0.9, (1,3)=0.5, (2,3)=0.9
    // node 2's top-1 is a TIE (0.9 to both 1 and 3) → smaller dst (1)
    val pairs = Seq((1L, 2L, 0.9), (1L, 3L, 0.5), (2L, 3L, 0.9))
      .toDF("id_a", "id_b", "sim")
    val k1 = SimSearch.mutualKnnPairs(pairs, k = 1)
      .as[(Long, Long, Double, Int, Int)].collect().toSeq
    // 3→2 is rank-1 but 2's top-1 is node 1, so (2,3) is NOT mutual
    assert(k1 == Seq((1L, 2L, 0.9, 1, 1)))
    val k2 = SimSearch.mutualKnnPairs(pairs, k = 2)
      .as[(Long, Long, Double, Int, Int)].collect().toSeq
    assert(k2 == Seq(
      (1L, 2L, 0.9, 1, 1),   // each other's #1
      (1L, 3L, 0.5, 2, 2),   // each other's #2
      (2L, 3L, 0.9, 2, 1)))  // 3 is 2's #2 (tie → 1 first); 2 is 3's #1
  }

  test("mutual-kNN over LSH candidates EQUALS the exact frame on " +
    "planted well-separated clusters (the scale-switch contract)") {
    // 8 clusters × 5 members in 16-d: centers are deterministic ±1
    // sign vectors, members add 1e-4 jitter — within-cluster cosine
    // ≈ 1, cross-cluster strictly lower, and the jitter is far too
    // small to flip a hyperplane side, so every within-cluster pair
    // shares all buckets and the blocker provably loses nothing.
    val rnd = new scala.util.Random(42)
    val centers = (0 until 8).map(_ =>
      Array.fill(16)(if (rnd.nextBoolean()) 1f else -1f))
    val rows = for {
      c <- centers.indices; m <- 0 until 5
    } yield {
      val v = centers(c).clone()
      v(m % 16) = v(m % 16) + 1e-4f * (m + 1)
      (c * 5L + m, v)
    }
    val emb = rows.toDF("id_a", "embedding") // col names fixed below
      .withColumnRenamed("id_a", "vec_id")
    def edges(pairs: org.apache.spark.sql.DataFrame) =
      SimSearch.mutualKnnPairs(pairs, k = 4)
        .select("id_a", "id_b", "rank_ab", "rank_ba")
        .as[(Long, Long, Int, Int)].collect().toSet
    val a = emb.select(col("vec_id").as("id_a"),
      col("embedding").as("emb_a"))
    val b = emb.select(col("vec_id").as("id_b"),
      col("embedding").as("emb_b"))
    val exactPairs = a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        SimSearch.cosine(col("emb_a"), col("emb_b")).as("sim"))
    val lshPairs = SimSearch.cosineNearDupPairsLsh(emb,
      threshold = -1.0, bits = 4, tables = 6)
    val exact = edges(exactPairs)
    val lsh = edges(lshPairs)
    // k=4 with clusters of 5 → each node's mutual top-4 is exactly its
    // cluster-mates: 8 · C(5,2) = 80 edges, identical down to ranks
    assert(exact.size == 80, exact.size)
    assert(lsh == exact,
      s"missing=${(exact -- lsh).take(5)} extra=${(lsh -- exact).take(5)}")
  }

  test("mutual-kNN LSH variant on the real fixture: measured edge " +
    "recall above the floor (near-random vectors make blocking lossy " +
    "by design — the recall is the dial, not a defect)") {
    val exact = graft.ExtQueries.all("q194_mutual_knn")(spark, sf0001)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = graft.ExtQueries.mutualKnnLshFrame(spark, sf0001)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall > 0.35, s"recall=$recall (|exact|=${exact.size})")
  }

  test("semanticDedup: hand 2-D trace — cell assignment (equidistant " +
    "tie → min cid), smaller-id dominance within cell, cross-cell " +
    "near-dup survives (the documented recall trade)") {
    val cents = Seq((10L, Array(1f, 0f)), (20L, Array(0f, 1f)))
      .toDF("cid", "cv")
    val pts = Seq(
      (1L, Array(2f, 0f)),     // cell 10, smallest id → keep
      (2L, Array(1f, 0.1f)),   // cell 10, cos(1,2)=.995 → eliminated
      (3L, Array(1f, 0.9f)),   // cell 10, cos<0.9 to 1 and 2 → keep
      (4L, Array(0.9f, 1f)),   // cell 20; cos(3,4)=.9945 but CROSS-cell
      (5L, Array(0f, 3f)),     // cell 20, cos(4,5)=.743 → keep
      (6L, Array(1.8f, 2f)),   // cell 20, cos(4,6)=.9999 → eliminated
      (7L, Array(0.5f, 0.5f))) // d² tie 0.5/0.5 → cell 10; cos(3,7)=.9985
      .toDF("id", "v")
    val out = SimSearch.semanticDedup(pts, "id", "v", cents, 0.9)
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(out == Seq((1L, 10L, true), (2L, 10L, false), (3L, 10L, true),
      (4L, 20L, true), (5L, 20L, true), (6L, 20L, false),
      (7L, 10L, false)))
  }

  test("lloydRefine: hand 2-round trace with an assignment flip between " +
    "rounds; empty cells drop; n_members tracks the final assignment") {
    val seeds = Seq((10L, Array(0f, 0f)), (20L, Array(5f, 0f)))
      .toDF("cid", "cv")
    val pts = Seq((1L, Array(2f, 0f)), (2L, Array(3f, 0f)),
      (3L, Array(7f, 0f))).toDF("id", "v")
    // r1: 1→10, 2→20, 3→20 ⇒ c10=(2,0) n1, c20=(5,0) n2
    val r1 = SimSearch.lloydRefine(pts, "id", "v", seeds, rounds = 1)
      .as[(Long, Int, Double, Long)].collect().toSeq
    assert(r1 == Seq((10L, 0, 2.0, 1L), (10L, 1, 0.0, 1L),
      (20L, 0, 5.0, 2L), (20L, 1, 0.0, 2L)))
    // r2 against (2,0)/(5,0): point 2 FLIPS to cell 10 (d² 1 < 4)
    //   ⇒ c10=(2.5,0) n2, c20=(7,0) n1
    val r2 = SimSearch.lloydRefine(pts, "id", "v", seeds, rounds = 2)
      .as[(Long, Int, Double, Long)].collect().toSeq
    assert(r2 == Seq((10L, 0, 2.5, 2L), (10L, 1, 0.0, 2L),
      (20L, 0, 7.0, 1L), (20L, 1, 0.0, 1L)))
    // a seed with no members disappears (Lloyd's empty-cell rule)
    val far = Seq((10L, Array(0f, 0f)), (99L, Array(100f, 0f)))
      .toDF("cid", "cv")
    val r3 = SimSearch.lloydRefine(pts, "id", "v", far, rounds = 1)
      .as[(Long, Int, Double, Long)].collect().toSeq
    assert(r3 == Seq((10L, 0, 4.0, 3L), (10L, 1, 0.0, 3L)))
  }

  test("groupCentroids: hand-checked means, one row per (group, dim), " +
    "add-order independent") {
    import spark.implicits._
    val df = Seq(
      (0, Array(1.0f, 2.0f)),
      (0, Array(3.0f, 6.0f)),
      (1, Array(-1.5f, 0.5f)))
      .toDF("label", "embedding")
    val out = SimSearch.groupCentroids(df, "label", "embedding")
      .orderBy("label", "dim")
      .as[(Int, Int, Double)].collect().toSeq
    assert(out == Seq((0, 0, 2.0), (0, 1, 4.0), (1, 0, -1.5), (1, 1, 0.5)))
    // repartitioning (different add order) must not move the result
    val shuffled = SimSearch.groupCentroids(df.repartition(7), "label",
      "embedding").orderBy("label", "dim")
      .as[(Int, Int, Double)].collect().toSeq
    assert(shuffled == out)
  }

  test("rrfFuse: hand fusion — doc in both lists wins, one-list docs " +
    "score their single reciprocal, topK truncates") {
    val a = Seq((1L, 1), (2L, 2)).toDF("id", "ra")
    val b = Seq((2L, 1), (3L, 2)).toDF("id", "rb")
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = SimSearch.rrfFuse(a, "ra", b, "rb", "id")
      .select("id", "rrf").as[(Long, Double)].collect().toSeq
    assert(out == Seq(
      (2L, r9(1.0 / 62 + 1.0 / 61)),
      (1L, r9(1.0 / 61)),
      (3L, r9(1.0 / 62))))
    val top1 = SimSearch.rrfFuse(a, "ra", b, "rb", "id", topK = 1)
      .select("id").as[Long].collect().toSeq
    assert(top1 == Seq(2L))
  }

  test("dimCovariance: hand 2-dim case, upper triangle only, " +
    "partitioning-invariant") {
    val vecs = Seq(Tuple1(Array(1.0f, 2.0f)), Tuple1(Array(3.0f, 4.0f)),
      Tuple1(Array(5.0f, 6.0f))).toDF("embedding")
    // both dims have values mean±2 step 2 → var 4; perfectly correlated
    // → cov(0,1) = 4 as well
    val out = SimSearch.dimCovariance(vecs, "embedding")
      .orderBy("i", "j").as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((0L, 0L, 4.0), (0L, 1L, 4.0), (1L, 1L, 4.0)))
    val shuffled = SimSearch.dimCovariance(vecs.repartition(5), "embedding")
      .orderBy("i", "j").as[(Long, Long, Double)].collect().toSeq
    assert(shuffled == out)
  }

  test("kCenterCoreset: hand-traced 1-D greedy farthest-point — min-id " +
    "seed, distance ties break on id, cover curve non-increasing") {
    import spark.implicits._
    // positions: 1→0, 2→10, 3→4, 4→6
    val pts = Seq((1L, Array(0f)), (2L, Array(10f)), (3L, Array(4f)),
      (4L, Array(6f))).toDF("vec_id", "embedding")
    val out = SimSearch.kCenterCoreset(pts, "vec_id", "embedding", k = 3)
      .orderBy("sel").as[(Int, Long, Double)].collect().toSeq
    // seed id1 (min id); then id2 at d²=100; then ids 3 and 4 BOTH at
    // min-distance 16 (16 vs 36→16 after id2 joins) → min id 3 wins
    assert(out == Seq((1, 1L, 0.0), (2, 2L, 100.0), (3, 3L, 16.0)))
    // the selection-time distance is the cover radius² curve: it never
    // increases, and is deterministic under repartitioning
    val fix = graft.engine.Tables.embeddings(spark, sf0001)
    val a = SimSearch.kCenterCoreset(fix, "vec_id", "embedding", k = 4)
      .orderBy("sel").as[(Int, Long, Double)].collect().toSeq
    assert(a.drop(1).map(_._3).sliding(2).forall(w =>
      w.length < 2 || w(0) >= w(1)))
    val b = SimSearch.kCenterCoreset(fix.repartition(7), "vec_id",
        "embedding", k = 4)
      .orderBy("sel").as[(Int, Long, Double)].collect().toSeq
    assert(a == b)
  }

  test("pqIndex: hand-traced 1-D Gonzalez codebook and assignment") {
    val pts = Seq((1L, Array(0f)), (2L, Array(10f)), (3L, Array(4f)),
      (4L, Array(6f))).toDF("vec_id", "embedding")
    val out = SimSearch.pqCodesWide(pts, "vec_id", "embedding",
      m = 1, k = 2).as[(Long, Int)].collect().toSeq
    // seed [0]→code 0; farthest [10]→code 1; 4 is nearer 0, 6 nearer 10
    assert(out == Seq((1L, 0), (2L, 1), (3L, 0), (4L, 1)))
  }

  test("pqIndex: subspaces quantize independently (m=2)") {
    val pts = Seq((1L, Array(0f, 10f)), (2L, Array(10f, 0f)),
      (3L, Array(0f, 0f)), (4L, Array(10f, 10f)))
      .toDF("vec_id", "embedding")
    val out = SimSearch.pqCodesWide(pts, "vec_id", "embedding",
      m = 2, k = 2).as[(Long, Int, Int)].collect().toSeq
    // sub0 codebook: [0]=c0, [10]=c1; sub1: [10]=c0, [0]=c1 (seed is
    // min-id vector id1, whose sub1 value is 10)
    assert(out == Seq((1L, 0, 0), (2L, 1, 1), (3L, 0, 1), (4L, 1, 0)))
  }

  test("adcTopK: exact distances when every point is its own centroid") {
    val pts = Seq((1L, Array(0f)), (2L, Array(10f)), (3L, Array(4f)),
      (4L, Array(6f))).toDF("vec_id", "embedding")
    val out = SimSearch.adcTopK(pts, "vec_id", "embedding",
        pts.filter(col("vec_id") === 1), m = 1, k = 4, topK = 3)
      .as[(Long, Long, Double, Int)].collect().toSeq
    // k = n ⇒ every point's nearest centroid is itself ⇒ ADC = true d²
    assert(out == Seq((1L, 3L, 16.0, 1), (1L, 4L, 36.0, 2),
      (1L, 2L, 100.0, 3)))
  }

  test("adcTopK: fixture run — full k-per-query lists, nonnegative, " +
      "deterministic under repartition") {
    val emb = Tables.embeddings(spark, sf0001)
    val q = emb.filter(col("vec_id") < 3)
    val a = SimSearch.adcTopK(emb, "vec_id", "embedding", q,
      m = 4, k = 8, topK = 5).collect().toSeq
    assert(a.size == 15 && a.forall(_.getDouble(2) >= 0))
    val b = SimSearch.adcTopK(emb.repartition(9), "vec_id",
      "embedding", q, m = 4, k = 8, topK = 5).collect().toSeq
    assert(a == b)
  }

  test("ivfAdcTopK: probe prunes to the query's cell; exact ADC inside") {
    val pts = Seq((1L, Array(0f)), (2L, Array(10f)), (3L, Array(4f)),
      (4L, Array(6f))).toDF("vec_id", "embedding")
    // coarse cells (k-center, k=2): {0,4} around seed 0; {10,6} around 10.
    // query id1 with nprobe=1 sees ONLY its own cell → candidate {3},
    // never id4 — even though id4 is the 2nd-nearest overall. That is
    // the IVF recall trade, pinned.
    val out = SimSearch.ivfAdcTopK(pts, "vec_id", "embedding",
        pts.filter(col("vec_id") === 1), ivfK = 2, nprobe = 1,
        m = 1, k = 4, topK = 10)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(out == Seq((1L, 3L, 16.0, 1)))
    // nprobe=2 restores the full corpus → exact ADC ordering
    val full = SimSearch.ivfAdcTopK(pts, "vec_id", "embedding",
        pts.filter(col("vec_id") === 1), ivfK = 2, nprobe = 2,
        m = 1, k = 4, topK = 10)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(full == Seq((1L, 3L, 16.0, 1), (1L, 4L, 36.0, 2),
      (1L, 2L, 100.0, 3)))
  }

  test("pc1: known 2×2 covariance → analytic eigenpair") {
    // C = [[2,1],[1,2]]: eigenpairs λ=3 at (1,1)/√2, λ=1 at (-1,1)/√2
    val cov = Seq((0L, 0L, 2.0), (0L, 1L, 1.0), (1L, 1L, 2.0))
      .toDF("i", "j", "cov")
    val r = SimSearch.pc1(cov)
    val s = 0.707106781 // round9(1/√2)
    assert(math.abs(r.loadings(0) - s) < 1e-8)
    assert(math.abs(r.loadings(1) - s) < 1e-8)
    assert(math.abs(r.lambda - 3.0) < 1e-6)
    assert(math.abs(r.lambda / r.trace - 0.75) < 1e-6)
  }

  test("pc1: sign canonicalization — first nonzero loading positive") {
    // C = [[2,-1],[-1,2]]: dominant (1,-1)/√2 at λ=3; the index-ramp
    // start overlaps it NEGATIVELY, so raw iteration converges to the
    // flipped vector — the sign rule must restore loading(0) > 0. (A
    // uniform all-ones start would be ⊥ the dominant eigenvector here
    // and converge to the WRONG eigenpair — the reason pc1 seeds with
    // the (1..d) ramp.)
    val cov = Seq((0L, 0L, 2.0), (0L, 1L, -1.0), (1L, 1L, 2.0))
      .toDF("i", "j", "cov")
    val r = SimSearch.pc1(cov)
    val s = 0.707106781
    assert(math.abs(r.loadings(0) - s) < 1e-8)
    assert(math.abs(r.loadings(1) + s) < 1e-8)
    assert(math.abs(r.lambda - 3.0) < 1e-6)
  }

  test("pc1Frame deterministic under repartition; unit-norm loadings") {
    val emb = Tables.embeddings(spark, sf0001)
    val cov = SimSearch.dimCovariance(emb, "embedding").cache()
    val a = SimSearch.pc1Frame(spark, cov)
      .orderBy("dim").collect().toSeq
    val b = SimSearch.pc1Frame(spark, cov.repartition(5))
      .orderBy("dim").collect().toSeq
    assert(a == b)
    val n2 = a.map(_.getDouble(1)).map(x => x * x).sum
    assert(math.abs(n2 - 1.0) < 1e-6)
    // explained-variance ratio of ONE component is in (0, 1]
    val ex = a.head.getDouble(3)
    assert(ex > 0.0 && ex <= 1.0)
  }

  test("project: hand-computed dot products, shuffle-free plan") {
    val df = Seq((1L, Array(2f, 4f)), (2L, Array(1f, 1f)))
      .toDF("vec_id", "embedding")
    val out = SimSearch.project(df, "embedding", "vec_id",
        Array(0.5, -0.25))
      .as[(Long, Double)].collect().toMap
    assert(out(1L) == 0.0) // 0.5·2 − 0.25·4
    assert(out(2L) == 0.25)
    val plan = SimSearch.project(df, "embedding", "vec_id",
      Array(0.5, -0.25)).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
