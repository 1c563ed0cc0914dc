package graft.ext

import graft.SparkSpec
import graft.engine.Tables
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.functions._

class TfIdfSpec extends SparkSpec {

  test("tfidf pipeline: vectors sized, stopwords removed, idf weights sane") {
    val docs = Tables.documents(spark, sf0001).limit(200)
    val (model, out) = TextOps.tfidf(docs, "text", numFeatures = 1 << 10)
    val rows = out.select("toks", "toks_clean", "tfidf").collect()
    assert(rows.length == 200)
    rows.foreach { r =>
      val toks = r.getSeq[String](0)
      val clean = r.getSeq[String](1)
      assert(clean.length <= toks.length)
      assert(!clean.contains("the") && !clean.contains("a"))
      val v = r.getAs[Vector](2)
      assert(v.size == (1 << 10))
      assert(v.toArray.forall(_ >= 0.0))
      assert(v.numNonzeros > 0)
    }
    // a ubiquitous token ("scan" appears in most docs) gets a LOWER idf
    // weight than a rare one — check via transforming two synthetic docs
    import spark.implicits._
    val probe = model.transform(Seq("scan scan", "zzzqqqxxx zzzqqqxxx")
      .toDF("text"))
    val Array(common, rare) = probe.select("tfidf").collect()
      .map(_.getAs[Vector](0).toArray.max)
    assert(common < rare || rare == 0.0) // rare term may hash to unseen idf
  }

  test("tfidf model persists and reloads") {
    val docs = Tables.documents(spark, sf0001).limit(50)
    val (model, _) = TextOps.tfidf(docs, "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-tfidf")
      .toString + "/m"
    model.write.overwrite().save(dir)
    val loaded = org.apache.spark.ml.PipelineModel.load(dir)
    val a = model.transform(docs).select("tfidf").collect()
      .map(_.getAs[Vector](0))
    val b = loaded.transform(docs).select("tfidf").collect()
      .map(_.getAs[Vector](0))
    assert(a.zip(b).forall { case (x, y) => x == y })
  }

  test("bm25: matches the closed-form formula on a hand-built corpus") {
    import spark.implicits._
    val docs = Seq((1L, "a b a"), (2L, "b c"), (3L, "c c c c"))
      .toDF("doc_id", "text")
    val got = TextOps.bm25Scores(docs, "doc_id", "text", Seq("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // closed form: N=3, avgdl=3; df(a)=1, df(b)=2
    val (k1, b) = (1.2, 0.75)
    def idf(df: Int) = math.log((3.0 - df + 0.5) / (df + 0.5) + 1.0)
    def term(tf: Int, dl: Int, df: Int) =
      idf(df) * tf * (k1 + 1.0) /
        (tf + k1 * (1.0 - b + b * dl / 3.0))
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d1 = r6(r9(term(2, 3, 1)) + r9(term(1, 3, 2)))
    val d2 = r6(r9(term(1, 2, 2)))
    assert(got.keySet == Set(1L, 2L)) // doc 3 has no query term
    assert(math.abs(got(1L) - d1) < 1e-9, s"${got(1L)} vs $d1")
    assert(math.abs(got(2L) - d2) < 1e-9, s"${got(2L)} vs $d2")
    // more matching terms and higher tf ⇒ higher score
    assert(got(1L) > got(2L))
  }

  test("vocabCoverage: rank order, counts, and cumulative share by hand") {
    import spark.implicits._
    // corpus tokens: a×4, b×2, c×1, d×1 (8 total)
    val docs = Seq("a a b", "a b c", "a  d", "  ").toDF("text")
    val out = TextOps.vocabCoverage(docs, "text", topK = 3)
      .as[(Int, String, Long, Double)].collect().toSeq
    assert(out == Seq(
      (1, "a", 4L, 0.5),
      (2, "b", 2L, 0.75),
      (3, "c", 1L, 0.875))) // tie c/d broken by token asc
  }

  test("bigrams: adjacency preserved, no cross-doc or wrap-around pairs; " +
    "short docs yield none") {
    import spark.implicits._
    val out = Seq("x y z", "solo", "", "p q")
      .toDF("text")
      .select(TextOps.bigrams(col("text")).as("b"))
      .as[Seq[String]].collect().toSeq
    assert(out == Seq(Seq("x y", "y z"), Seq(), Seq(), Seq("p q")))
  }

  test("vocabEncode: rank ids by frequency then token, OOV maps to unk, " +
    "positions index the filtered token list") {
    import spark.implicits._
    val docs = Seq((1L, "b a  b rare"), (2L, "a b a"))
      .toDF("doc_id", "text")
    // freq: a×3, b×3 (tie → a first), rare×1; vocabSize 2 → rare is OOV
    val out = TextOps.vocabEncode(docs, "doc_id", "text", vocabSize = 2)
      .orderBy("doc_id", "pos")
      .as[(Long, Int, Int)].collect().toSeq
    assert(out == Seq(
      (1L, 0, 2), (1L, 1, 1), (1L, 2, 2), (1L, 3, -1),
      (2L, 0, 1), (2L, 1, 2), (2L, 2, 1)))
  }

  test("sparseDotTopK: shared-term dot products by hand; df-cap drops " +
    "ubiquitous terms from every pair") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta common"),
      (2L, "alpha beta common"),
      (3L, "gamma delta common"))
      .toDF("doc_id", "text")
    // maxDf=2 drops "common" (df 3); docs 1,2 share alpha+beta
    val out = TextOps.sparseDotTopK(docs, "doc_id", "text",
        numFeatures = 1 << 12, maxDf = 2, k = 10)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out.map(p => (p._1, p._2)) == Seq((1L, 2L)))
    // w = 1·ln(4/3) for each shared term, both docs: dot = 2·w²
    val w = BigDecimal(math.log(4.0 / 3)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val term = BigDecimal(w * w).setScale(9,
      BigDecimal.RoundingMode.HALF_UP)
    val expected = (term + term).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out.head._3 - expected) < 1e-9)
  }

  test("stopwordDiscovery: df counts docs not occurrences; threshold " +
    "is inclusive on the rounded fraction") {
    import spark.implicits._
    val docs = Seq((1L, "the the the cat"), (2L, "the dog"),
      (3L, "a bird"), (4L, "the fish"), (5L, "worm"))
      .toDF("doc_id", "text")
    val out = TextOps.stopwordDiscovery(docs, "doc_id", "text", 0.6)
      .as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(("the", 3L, 0.6))) // 3 of 5 docs, not 5 occurrences
  }

  test("normalizeText: case, punctuation, and whitespace runs collapse " +
    "to one canonical form") {
    import spark.implicits._
    val out = Seq("  The QUICK,   brown-fox!! ", "the quick brown fox")
      .toDF("text")
      .select(TextOps.normalizeText(col("text")))
      .as[String].collect().toSeq
    assert(out == Seq("the quick brown fox", "the quick brown fox"))
  }

  test("tokenEntropy: uniform doc hits ln(n), constant doc hits 0, " +
    "skewed doc in between") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),     // uniform over 4 → ln 4
      (2L, "x x x x"),     // single token → 0
      (3L, "y y y z"))     // 3/4·ln(4/3) + 1/4·ln 4
      .toDF("doc_id", "text")
    val out = TextOps.tokenEntropy(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(out.map(_._2) == Seq(4L, 4L, 4L))
    assert(math.abs(out(0)._3 - math.log(4)) < 1e-6)
    assert(out(1)._3 == 0.0)
    val expected3 = 0.75 * math.log(4.0 / 3) + 0.25 * math.log(4.0)
    assert(math.abs(out(2)._3 - expected3) < 1e-6)
  }

  test("unigramNll: add-one-smoothed model by hand; rarer token mix " +
    "scores higher; partitioning-invariant") {
    import spark.implicits._
    // corpus: C = 5 tokens, V = 3 distinct → p(a)=3/8, p(b)=3/8, p(c)=2/8
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = TextOps.unigramNll(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    // mirror the operator exactly: 9-dp decimal terms, decimal sum,
    // CAST to double, double-divide by n, 6-dp round
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pA = 3.0 / 8; val pB = 3.0 / 8; val pC = 2.0 / 8
    val d1 = r6((r9(-math.log(pA)) + r9(-math.log(pA)) +
      r9(-math.log(pB))).toDouble / 3)
    val d2 = r6((r9(-math.log(pB)) + r9(-math.log(pC))).toDouble / 2)
    assert(out == Seq((1L, 3L, d1), (2L, 2L, d2)))
    // doc 2 carries the rarer token c → higher per-token surprise
    assert(out(1)._3 > out(0)._3)
    val b = TextOps.unigramNll(docs.repartition(5), "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(out == b)
  }

  test("bigramNll: add-one conditional model by hand; short docs drop; " +
    "partitioning-invariant") {
    import spark.implicits._
    // bigrams: d1 → (a,b),(b,a),(a,b); d2 → (b,a); d3 has none (1 token)
    // c12: (a,b)=2, (b,a)=2; c1: a=2, b=2; V=3 (z still counts as vocab)
    // p(b|a) = (2+1)/(2+3) = 0.6 = p(a|b)
    val docs = Seq((1L, "a b a b"), (2L, "b a"), (3L, "z"))
      .toDF("doc_id", "text")
    val out = TextOps.bigramNll(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val term = r9(-math.log(0.6))
    val d1 = r6((term + term + term).toDouble / 3)
    val d2 = r6(term.toDouble / 1)
    assert(out == Seq((1L, 3L, d1), (2L, 1L, d2)))
    val b = TextOps.bigramNll(docs.repartition(5), "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(out == b)
  }

  test("bigramCounts: top-k by count desc then bigram asc") {
    import spark.implicits._
    val docs = Seq("m n m n", "m n o").toDF("text")
    // "m n"×3, "n m"×1, "n o"×1
    val out = TextOps.bigramCounts(docs, "text", topK = 2)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("m n", 3L), ("n m", 1L)))
  }

  test("sourceDrift: single source == corpus → KL 0; hand-computed " +
    "two-source case is non-negative and larger for the skewed source") {
    import spark.implicits._
    val same = Seq(("s1", "a b c a")).toDF("source", "text")
    val klSame = TextOps.sourceDrift(same, "source", "text")
      .as[(String, Long, Double)].collect().head
    assert(klSame == (("s1", 4L, 0.0))) // p_s == q term-for-term
    val docs = Seq(("s1", "a b a b c"), ("s2", "a a a a a"))
      .toDF("source", "text")
    val out = TextOps.sourceDrift(docs, "source", "text")
      .orderBy("source").as[(String, Long, Double)].collect().toSeq
    assert(out.map(_._1) == Seq("s1", "s2"))
    assert(out.forall(_._3 >= 0.0)) // Gibbs: KL never negative
    // replay the smoothed formula: V=3, corpus c(a)=7 c(b)=2 c(c)=1,
    // tot=10; both sources have stot=5
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def term(cs: Long, c: Long): BigDecimal = {
      val p = (cs + 1).toDouble / (5 + 3)
      val q = (c + 1).toDouble / (10 + 3)
      r9(p * math.log(p / q))
    }
    def r6(x: BigDecimal) = BigDecimal(x.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val kl1 = r6(term(2, 7) + term(2, 2) + term(1, 1))
    val kl2 = r6(term(5, 7) + term(0, 2) + term(0, 1))
    assert(out(0)._3 == kl1 && out(1)._3 == kl2)
    // NOTE: at this corpus size the all-'a' source scores LOWER than the
    // mixed one — the corpus itself is 'a'-heavy and add-one smoothing
    // (V comparable to stot) pulls both toward uniform; KL ordering is a
    // property of the data, not of the operator.
    val b = TextOps.sourceDrift(docs.repartition(5), "source", "text")
      .orderBy("source").as[(String, Long, Double)].collect().toSeq
    assert(out == b)
  }

  test("pmiPairs: hand-computed pmi, pair order asc, vocab cap drops " +
    "low-df tokens deterministically") {
    import spark.implicits._
    val corpus = Seq((1L, "x y"), (2L, "y x"), (3L, "x z"), (4L, "w"))
      .toDF("doc_id", "text")
    // df: x=3 y=2 z=1 w=1, N=4; co(x,y)=2, co(x,z)=1;
    // pmi(x,y) = ln(2·4/(3·2)) = pmi(x,z) = ln(1·4/(3·1)) = ln(4/3)
    val out = TextOps.pmiPairs(corpus, "doc_id", "text",
        minDf = 1, vocabTop = 10, minCo = 1)
      .orderBy("tok_a", "tok_b")
      .as[(String, String, Long, Double)].collect().toSeq
    val ln43 = BigDecimal(math.log(4.0 / 3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Seq(("x", "y", 2L, ln43), ("x", "z", 1L, ln43)))
    // vocab cap 2 keeps the top-df tokens x, y only → one pair
    val capped = TextOps.pmiPairs(corpus, "doc_id", "text",
        minDf = 1, vocabTop = 2, minCo = 1)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(capped == Seq(("x", "y", 2L, ln43)))
  }

  test("llrCollocations: hand-computed Dunning LLR — exclusive pair " +
    "outscores shared-margin pairs; minCo filters; ties order by words") {
    import spark.implicits._
    // bigram stream: (a,b)×3 (a,c)×1 (d,b)×1 (d,e)×2, N=7.
    // 'e' only ever follows 'd' → its 2×2 concentrates evidence;
    // reference-formula values: LLR(d,e)=4.556689, others 1.242947.
    val docs = (Seq.fill(3)("a b") ++ Seq("a c", "d b") ++
      Seq.fill(2)("d e")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = TextOps.llrCollocations(docs, "text", minCo = 1, topK = 10)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("d", "e", 2L, 3L, 2L, 4.556689),
      ("a", "b", 3L, 4L, 4L, 1.242947),
      ("a", "c", 1L, 4L, 1L, 1.242947),
      ("d", "b", 1L, 3L, 4L, 1.242947)))
    // minCo=2 keeps only the pairs with co >= 2
    val filtered = TextOps.llrCollocations(docs, "text", minCo = 2,
        topK = 10)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(filtered.map(r => (r._1, r._2)) == Seq(("d", "e"), ("a", "b")))
    // deterministic under repartitioning
    val b = TextOps.llrCollocations(docs.repartition(5), "text",
        minCo = 1, topK = 10)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(out == b)
  }

  test("vocabGrowth: exact-power-law corpus recovers beta=0.5, K=1, " +
    "r2=1 (to rounding); totals exact; partitioning-invariant") {
    import spark.implicits._
    // doc m contributes 2m−1 tokens, exactly 1 new type →
    // cum_toks = m², cum_types = m ⇒ V(n) = n^0.5 exactly
    val docs = Seq(
      (1L, "t1"),
      (2L, "t2 t1 t1"),
      (3L, "t3 t1 t1 t1 t1")).toDF("doc_id", "text")
    val out = TextOps.vocabGrowth(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double, Double, Double)].collect()(0)
    assert(out._1 == 3L && out._2 == 9L && out._3 == 3L)
    assert(math.abs(out._4 - 0.5) < 1e-4, s"beta ${out._4}")
    assert(math.abs(out._5 - 1.0) < 1e-3, s"k ${out._5}")
    assert(out._6 > 0.9999, s"r2 ${out._6}")
    val b = TextOps.vocabGrowth(docs.repartition(5), "doc_id", "text")
      .as[(Long, Long, Long, Double, Double, Double)].collect()(0)
    assert(out == b)
  }

  test("vocabOverlap: hand-computed shared types and Jaccard; " +
      "whitespace tokenization, empty tokens dropped") {
    import spark.implicits._
    // a: {x,y,z}  b: {y,z,w}  c: {q}
    val docs = Seq(("a", "x y z"), ("a", "y"), ("b", "y z  w"),
      ("c", "q")).toDF("source", "text")
    val out = TextOps.vocabOverlap(docs, "source", "text")
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("a", "b", 3L, 3L, 2L, 0.5),   // {y,z} of {x,y,z,w}
      ("a", "c", 3L, 1L, 0L, 0.0),
      ("b", "c", 3L, 1L, 0L, 0.0)))
  }

  test("bpeMerges: hand-traced two rounds — frequency-weighted pair " +
    "counts, deterministic tie-break, merged symbols persist to the " +
    "next round; partitioning-invariant") {
    import spark.implicits._
    // vocab: aa×3, ab×2, b×1
    // round 0: pairs (a,a)=3 (one per 'aa' occurrence), (a,b)=2 → merge (a,a)
    // round 1: 'aa' is a single symbol now; only (a,b)=2 remains
    val docs = Seq(("1", "aa ab aa"), ("2", "ab b aa"))
      .toDF("doc_id", "text")
    val out = TextOps.bpeMerges(docs, "text", rounds = 2)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(out == Seq(
      (0, "a", "a", "aa", 3L),
      (1, "a", "b", "ab", 2L)))
    val b = TextOps.bpeMerges(docs.repartition(5), "text", rounds = 2)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(out == b)
  }

  test("bpeCompression: hand-traced — after (a,a) and (a,b) merge, " +
    "every toy word is one BPE token; per-source exact totals") {
    import spark.implicits._
    val docs = Seq(("s1", "aa ab aa"), ("s2", "ab b aa"))
      .toDF("source", "text")
    val out = TextOps.bpeCompression(docs, "text", "source", rounds = 2)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    // s1: words aa,ab,aa → 3 tokens, 6 chars, 3 BPE tokens → 2.0
    // s2: words ab,b,aa → 3 tokens, 5 chars, 3 BPE tokens → 1.666667
    assert(out == Seq(
      ("s1", 3L, 6L, 3L, 2.0),
      ("s2", 3L, 5L, 3L, 1.666667)))
  }

  test("bpeMerges: overlapping runs pair left-to-right greedily — " +
    "'aaa' yields [aa, a], so round 2's top pair is (aa, a)") {
    import spark.implicits._
    val docs = Seq(("1", "aaa")).toDF("doc_id", "text")
    val out = TextOps.bpeMerges(docs, "text", rounds = 2)
      .as[(Int, String, String, String, Long)].collect().toSeq
    // round 0: overlapping (a,a) counted at BOTH positions (standard
    // BPE counts all adjacent instances) → cnt 2; the merge then pairs
    // greedily: [a,a,a] → [aa, a], never [a, aa]
    assert(out == Seq(
      (0, "a", "a", "aa", 2L),
      (1, "aa", "a", "aaa", 1L)))
  }
}
