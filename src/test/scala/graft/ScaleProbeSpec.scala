package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.ext.SimSearch
import graft.functions.Blockhash

/** Pins the SPARSE-fixture planting laws the round-12 scale probe's
  * realism rests on (round-11 verdict item 1). The dense replica laws
  * (affine cipher, per-replica sign flip) are verified by the probe's
  * own row counts (q31 pairs replicate exactly ×m — SCALEPROBE_r11);
  * the NEW planted-twin constructions make BY-CONSTRUCTION claims that
  * a measurement must not take on faith, so they are asserted here
  * over the real fixture, not a toy:
  *
  *  - [[ScaleProbe.flipLowest]](x, 2): cos(x, twin) ≥ 1 − 2k/d — every
  *    planted embedding pair qualifies at the sparse threshold 0.6;
  *  - [[ScaleProbe.swapFirstTwo]]: blockhash Hamming ≤ 2 at ANY
  *    fingerprint width — every planted payload pair is found by the
  *    slice banding's exact pigeonhole recall (maxHamming 3 < slices).
  */
class ScaleProbeSpec extends SparkSpec {
  import spark.implicits._

  test("flipLowest(x, 2): norms unchanged, exactly 2 dims sign-flipped, " +
    "and cosine(x, twin) >= 1 - 2k/d >= the sparse threshold, over " +
    "EVERY fixture embedding (order-statistic bound, ties included)") {
    val emb = Tables.embeddings(spark, sf0001)
    val twin = ScaleProbe.flipLowest(col("embedding"), 2)
    def dot(a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b,
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val stats = emb.select(
        SimSearch.cosine(col("embedding"), twin).as("cos"),
        (dot(col("embedding"), col("embedding")) - dot(twin, twin))
          .as("normDiff"),
        size(filter(zip_with(col("embedding"), twin,
          (x, y) => x =!= y), b => b)).as("nChanged"))
      .agg(min("cos"), max(abs(col("normDiff"))),
        min("nChanged"), max("nChanged"))
      .head()
    val minCos = stats.getDouble(0)
    // the documented bound: k = 2 of d = 64 dims -> cos >= 0.9375;
    // typical vectors sit far above (the 2 SMALLEST squares carry
    // almost no mass)
    assert(minCos >= 1.0 - 2.0 * 2 / 64, s"minCos=$minCos")
    assert(minCos > 0.6) // the sparse threshold binds nothing planted
    assert(stats.getDouble(1) < 1e-9) // norms preserved exactly
    // exactly 2 dims change (sign flips of zero-valued dims are
    // invisible, so allow fewer, never more)
    assert(stats.getInt(3) <= 2)
  }

  test("swapFirstTwo: length-preserving, and the blockhash fingerprint " +
    "of every planted payload twin sits at Hamming <= 2 from its " +
    "original at BOTH the fixed (32) and width-scaled (48) block " +
    "counts — inside maxHamming 3, where slice-banding recall is exact") {
    val docs = Tables.documents(spark, sf0001)
    val twin = ScaleProbe.swapFirstTwo(col("text"))
    val h = docs.select(
        (length(twin) - length(col("text"))).as("lenDiff"),
        bit_count(Blockhash.blockhash(encode(col("text"), "UTF-8"), 32)
          .bitwiseXOR(Blockhash.blockhash(encode(twin, "UTF-8"), 32)))
          .as("h32"),
        bit_count(Blockhash.blockhash(encode(col("text"), "UTF-8"), 48)
          .bitwiseXOR(Blockhash.blockhash(encode(twin, "UTF-8"), 48)))
          .as("h48"))
      .agg(max(abs(col("lenDiff"))), max("h32"), max("h48"))
      .head()
    assert(h.getInt(0) == 0)
    assert(h.getInt(1) <= 2, s"h32=${h.getInt(1)}")
    assert(h.getInt(2) <= 2, s"h48=${h.getInt(2)}")
  }

  test("rotateFrac preserves every planted payload pair (equal lengths " +
    "=> equal rotation; the two differing chars stay adjacent or split " +
    "to the ends) — Hamming <= 2 holds in EVERY replica's rotation, " +
    "while the rotation itself moves the fingerprint (the cross-replica " +
    "decorrelator is not a no-op)") {
    val docs = Tables.documents(spark, sf0001)
    def fp(c: org.apache.spark.sql.Column, blocks: Int) =
      Blockhash.blockhash(encode(c, "UTF-8"), blocks)
    Seq(1, 7, 29).foreach { r =>
      val o = ScaleProbe.rotateFrac(col("text"), r)
      val t = ScaleProbe.rotateFrac(
        ScaleProbe.swapFirstTwo(col("text")), r)
      val stats = docs.select(
          bit_count(fp(o, 48).bitwiseXOR(fp(t, 48))).as("hPair"),
          bit_count(fp(o, 48).bitwiseXOR(fp(col("text"), 48)))
            .as("hSelf"),
          (length(o) - length(col("text"))).as("lenDiff"))
        .agg(max("hPair"), avg("hSelf"), max(abs(col("lenDiff"))))
        .head()
      assert(stats.getInt(0) <= 2, s"r=$r hPair=${stats.getInt(0)}")
      // the rotation moves block profiles materially (decorrelation is
      // real): on average well past the Hamming-3 match window
      assert(stats.getDouble(1) > 3.0, s"r=$r hSelf=${stats.getDouble(1)}")
      assert(stats.getInt(2) == 0)
    }
  }

  test("sparseEmbReplica decorrelates EVERY replica pair: the same " +
    "base vector's cross-replica cosine stays below the sparse " +
    "threshold for ALL 0 <= r < r' <= 30 over ALL real fixture " +
    "vectors, AND within-replica cosines are preserved exactly — " +
    "the two laws the planted-vs-background split rests on (the r11 " +
    "offset-parity flip failed at dr=3 with self-cos ~0.8; even a " +
    "perfect Murmur3 flip alone failed at 0.81 on mass-concentrated " +
    "vectors)") {
    // replicate the transform in driver Scala: flip pattern from the
    // SAME hash Spark evaluates (argument order = the lambda's
    // hash(i, lit(r))), shift = (r*23) % 64
    val pat = spark.range(1, 31).select(col("id").cast("int").as("r"))
      .crossJoin(spark.range(64).select(col("id").cast("int").as("i")))
      .select(col("r"), col("i"),
        (pmod(hash(col("i"), col("r")), lit(2)) === 0).as("keep"))
      .as[(Int, Int, Boolean)].collect()
    val pats = Array.fill(31, 64)(1)
    pat.foreach { case (r, i, keep) => pats(r)(i) = if (keep) 1 else -1 }
    def apply(v: Array[Float], r: Int): Array[Double] = {
      val s = (r * 23) % 64
      Array.tabulate(64)(j => pats(r)(j) * v((j + s) % 64).toDouble)
    }
    // sanity: the Scala replica matches the real fixture column
    val probe = Array.tabulate(64)(_.toFloat + 1f)
    val viaSpark = Seq(Tuple1(probe)).toDF("embedding")
      .select(ScaleProbe.sparseEmbReplica(col("embedding"), 7))
      .as[Array[Float]].head()
    assert(viaSpark.map(_.toDouble).toSeq == apply(probe, 7).toSeq)
    val vecs = Tables.embeddings(spark, sf0001)
      .select("embedding").as[Array[Float]].collect()
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var num = 0.0; var da = 0.0; var db = 0.0
      var j = 0
      while (j < 64) {
        num += a(j) * b(j); da += a(j) * a(j); db += b(j) * b(j)
        j += 1
      }
      num / math.sqrt(da * db)
    }
    var worst = 0.0
    for (r <- 0 to 30; r2 <- (r + 1) to 30) {
      vecs.foreach { v =>
        val c = math.abs(cos(apply(v, r), apply(v, r2)))
        if (c > worst) worst = c
      }
    }
    // every cross-replica self-cosine must sit below the sparse
    // threshold — the exact law the planted-vs-background split needs
    assert(worst < 0.6, s"worst cross-replica |cos| = $worst")
    // within-replica preservation: a permutation + uniform sign flip
    // keeps pairwise cosines bit-exact in double math
    val (a, b) = (vecs(0), vecs(1))
    val base = cos(a.map(_.toDouble), b.map(_.toDouble))
    Seq(1, 7, 29).foreach { r =>
      assert(math.abs(cos(apply(a, r), apply(b, r)) - base) < 1e-12)
    }
  }

  test("the COMPOSED planted-pair law holds exactly as the fixture " +
    "deploys it: blockhash(rotate(cipher(swap(text)))) sits at " +
    "Hamming <= 2 from blockhash(rotate(cipher(text))) for every doc " +
    "in every replica's transform — the cipher is a 1:1 ASCII char " +
    "map, so it commutes with the position swap and preserves the " +
    "length the rotation keys on") {
    val docs = Tables.documents(spark, sf0001)
    def fp(c: org.apache.spark.sql.Column) =
      Blockhash.blockhash(encode(c, "UTF-8"), 48)
    Seq(0, 5, 29).foreach { r =>
      def deployed(t: org.apache.spark.sql.Column) =
        ScaleProbe.rotateFrac(ScaleProbe.cipher(t, r), r)
      val worst = docs.select(
          bit_count(fp(deployed(col("text"))).bitwiseXOR(
            fp(deployed(ScaleProbe.swapFirstTwo(col("text"))))))
            .as("h"))
        .agg(max("h")).head().getInt(0)
      assert(worst <= 2, s"r=$r worst Hamming=$worst")
    }
  }

  test("the sparse regime is REAL on the fixture: at threshold 0.6 the " +
    "base embeddings have (near-)zero qualifying background pairs, " +
    "while every planted twin pair qualifies — the threshold binds " +
    "exactly the planted mass") {
    val emb = Tables.embeddings(spark, sf0001)
      .localCheckpoint(eager = true)
    val n = emb.count()
    // brute-force background count at 0.6 (500 vectors -> 125k pairs,
    // cheap at spec scale)
    val e = emb.select(col("vec_id"), col("embedding"))
    val background = e.as("x").join(e.as("y"),
        col("x.vec_id") < col("y.vec_id"))
      .filter(SimSearch.cosine(col("x.embedding"), col("y.embedding"))
        >= 0.6)
      .count()
    // essentially none: well under one in ten thousand pairs (the
    // dense fixture's 2.2% lives at threshold 0.25)
    assert(background <= (n * (n - 1) / 2) / 10000,
      s"background=$background of ${n * (n - 1) / 2}")
    // every planted pair qualifies (per-row check — no pair join)
    val planted = emb.filter(col("vec_id") % 8 === 1)
      .select(SimSearch.cosine(col("embedding"),
        ScaleProbe.flipLowest(col("embedding"), 2)).as("cos"))
    assert(planted.filter(col("cos") < 0.6).count() == 0)
    assert(planted.count() > 0)
  }
}
