package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("prioritySample: hand-computed priorities, DLT threshold " +
    "estimator, partitioning invariance") {
    val docs = Seq(
      ("g1", 10L, 100L), ("g1", 11L, 1L), ("g1", 12L, 50L),
      ("g1", 13L, 7L), ("g2", 20L, 5L), ("g2", 21L, 5L))
      .toDF("grp", "id", "w")
    val out = PipelineOps.prioritySample(docs, "grp", "id", "w", k = 2)
      .orderBy("grp", "rn").collect()
    // mirror the formula exactly: u = (scrambledHash(id.toString)+1)/P,
    // priority = w/u — same IEEE ops as the operator
    val P = TextOps.HashPrime
    def h(s: String): Long =
      (s.foldLeft(0L)((a, c) => (a * 31 + c) % P) * 2654435761L +
        12345L) % P
    def pri(id: Long, w: Long): Double =
      w.toDouble / ((h(id.toString) + 1).toDouble / P.toDouble)
    val g1 = Seq(10L -> 100L, 11L -> 1L, 12L -> 50L, 13L -> 7L)
      .map { case (i, w) => (i, pri(i, w)) }.sortBy { case (i, p) => (-p, i) }
    val tau1 = g1(2)._2 // (k+1)-th priority
    assert(out.length == 4) // 2 from g1, both of g2 (group smaller than k)
    val r0 = out(0)
    assert(r0.getAs[String]("grp") == "g1" &&
      r0.getAs[Long]("id") == g1(0)._1 &&
      r0.getAs[Double]("priority") == g1(0)._2)
    // DLT estimator: max(w, τ) for sampled items when the group overflows k
    val wOf = Map(10L -> 100L, 11L -> 1L, 12L -> 50L, 13L -> 7L)
    Seq(out(0), out(1)).foreach { r =>
      val expected = math.max(wOf(r.getAs[Long]("id")).toDouble, tau1)
      assert(r.getAs[Double]("w_est") == expected)
    }
    // a group with ≤ k items has no threshold: w_est falls back to w
    Seq(out(2), out(3)).foreach { r =>
      assert(r.getAs[Double]("w_est") ==
        wOf.getOrElse(r.getAs[Long]("id"), 5L).toDouble)
    }
    // layout must not change the draw (hash-derived, no RNG state)
    val b = PipelineOps.prioritySample(docs.repartition(7), "grp", "id",
      "w", k = 2).orderBy("grp", "rn").collect()
    assert(out.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("prioritySample on the fixture: matches the full-sort window " +
    "formulation (GroupTopK path parity)") {
    val docs = graft.engine.Tables.documents(spark, sf0001)
    val viaOp = PipelineOps.prioritySample(docs, "source", "doc_id",
      "n_chars", k = 5).orderBy("source", "rn").collect()
    // reference formulation: plain window over the same priorities
    val u = (TextOps.scrambledHash(col("doc_id").cast("string")) + 1)
      .cast("double") / TextOps.HashPrime.toDouble
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
      .orderBy(col("priority").desc, col("doc_id"))
    val ranked = docs.select(col("source"), col("doc_id"),
        col("n_chars").cast("double").as("wv"))
      .withColumn("priority", col("wv") / u)
      .withColumn("rn", org.apache.spark.sql.functions.row_number()
        .over(w).cast("long"))
    val viaWindow = ranked.filter(col("rn") <= 5)
      .select("source", "doc_id", "rn", "priority")
      .orderBy("source", "rn").collect()
    assert(viaOp.length == viaWindow.length)
    viaOp.zip(viaWindow).foreach { case (a, b) =>
      assert(a.getAs[String]("source") == b.getAs[String]("source"))
      assert(a.getAs[Long]("doc_id") == b.getAs[Long]("doc_id"))
      assert(a.getAs[Double]("priority") == b.getAs[Double]("priority"))
    }
  }

  test("qualityFlags: each rule fires on its own violation") {
    val docs = Seq(
      // 0: healthy doc — all rules pass
      (0L, "the cat sat on the mat and then the dog ran off to town"),
      // 1: too short (3 words)
      (1L, "too short doc"),
      // 2: mean word length out of range (all 1-char words, enough of them)
      (2L, "a b c d e f g h i j k l m n o p the of"),
      // 3: non-alpha words dominate
      (3L, "111 222 333 444 555 666 777 888 999 000 the of 123 456 789"),
      // 4: no stopwords
      (4L, "giraffe elephant zebra lion tiger bear wolf fox deer moose"))
      .toDF("doc_id", "text")
    val out = PipelineOps.qualityFlags(docs, "text")
      .orderBy("doc_id").collect()
    def row(i: Int) = out(i)
    assert(row(0).getAs[Long]("pass") == 1L)
    assert(row(1).getAs[Long]("f_len") == 0L)
    assert(row(2).getAs[Long]("f_wlen") == 0L)
    assert(row(3).getAs[Long]("f_alpha") == 0L)
    assert(row(4).getAs[Long]("f_stop") == 0L)
    // every violation kills the conjunction
    (1 to 4).foreach(i => assert(row(i).getAs[Long]("pass") == 0L))
  }

  test("packSequences: offsets partition the token stream exactly") {
    val docs = (0L until 40L)
      .map(i => (i, ("w " * (i % 7 + 1).toInt).trim, s"p${i % 2}"))
      .toDF("doc_id", "text", "lang")
    val out = PipelineOps.packSequences(docs, "text", "lang", 10L)
      .orderBy("lang", "doc_id").collect()
    out.groupBy(_.getAs[String]("lang")).foreach { case (_, rows) =>
      // contiguous: each doc starts where the previous ended; stream
      // starts at offset 0
      assert(rows.head.getAs[Long]("start_off") == 0L)
      rows.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("start_off") == a.getAs[Long]("end_off"))
        case _ =>
      }
      rows.foreach { r =>
        val span = r.getAs[Long]("end_off") - r.getAs[Long]("start_off")
        assert(span == r.getAs[Long]("n_tok"))
        // n_chunks covers the doc's span: a doc of t tokens touches at
        // most ceil(t/budget)+1 chunks and at least ceil(t/budget)
        val minChunks = (span + 9) / 10
        assert(r.getAs[Long]("n_chunks") >= minChunks &&
          r.getAs[Long]("n_chunks") <= minChunks + 1)
        assert((r.getAs[Long]("crosses") == 1L) ==
          (r.getAs[Long]("n_chunks") > 1L))
      }
    }
  }

  test("mixtureWeights: shares normalize to ~1 and upweight small sources") {
    val docs = (0L until 100L)
      .map(i => (i, "tok " * (if (i % 10 == 0) 5 else 50),
        if (i % 10 == 0) "rare" else "common"))
      .toDF("doc_id", "text", "source")
    val out = PipelineOps.mixtureWeights(docs, "text", "source").collect()
    val shares = out.map(r =>
      r.getAs[String]("source") -> r.getAs[Double]("share")).toMap
    assert(math.abs(shares.values.sum - 1.0) < 1e-4)
    val p = out.map(r =>
      r.getAs[String]("source") -> r.getAs[Double]("p_tok")).toMap
    // temperature < 1 flattens: the rare source's sampling share exceeds
    // its raw token share; the common source's drops
    assert(shares("rare") > p("rare"))
    assert(shares("common") < p("common"))
  }

  test("repetitionStats: exact fractions on a hand-counted doc") {
    val docs = Seq(
      (0L, "a a a a b"), // 5 tokens, 2 distinct; bigrams: aa aa aa ab
      (1L, "w x y z"),   // all distinct, all bigrams unique
      (2L, "solo"))      // < 2 tokens -> no bigrams -> dropped
      .toDF("doc_id", "text")
    val out = PipelineOps.repetitionStats(docs, "text").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_tok") == 5L)
    assert(out(0).getAs[Long]("n_distinct") == 2L)
    assert(out(0).getAs[Double]("dup_frac") == 0.6)
    assert(out(0).getAs[Double]("top_bigram_frac") == 0.75)
    assert(out(1).getAs[Double]("dup_frac") == 0.0)
    assert(out(1).getAs[Double]("top_bigram_frac") ==
      math.rint(1.0 / 3.0 * 1e6) / 1e6)
  }

  test("piiScrub: counts and layered redaction") {
    val docs = Seq(
      (0L, "mail a.b@site.org and b@x.io call +1-555-1234 from 10.1.2.3"),
      (1L, "nothing sensitive here at all"))
      .toDF("doc_id", "text")
    val out = PipelineOps.piiScrub(docs, "text").orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_emails") == 2L)
    assert(out(0).getAs[Long]("n_phones") == 1L)
    assert(out(0).getAs[Long]("n_ips") == 1L)
    assert(out(0).getAs[Long]("has_pii") == 1L)
    // redacted text: every match replaced by its placeholder
    val expected = "mail <EMAIL> and <EMAIL> call <PHONE> from <IP>".length
    assert(out(0).getAs[Long]("redacted_len") == expected.toLong)
    assert(out(1).getAs[Long]("has_pii") == 0L)
    assert(out(1).getAs[Long]("redacted_len") ==
      "nothing sensitive here at all".length.toLong)
  }

  test("deterministicSample: partitioning-invariant, exact group sizes") {
    val docs = (0L until 100L).map(i => (i, s"g${i % 3}"))
      .toDF("doc_id", "source")
    def run(parts: Int) =
      PipelineOps.deterministicSample(docs.repartition(parts), "doc_id",
        "source", 7).collect().map(_.toString).toSet
    // the sample is a pure function of the data — physical layout must
    // not change it (the property seeded-RNG sampling cannot give)
    assert(run(1) == run(13))
    val out = PipelineOps.deterministicSample(docs, "doc_id", "source", 7)
      .collect()
    assert(out.groupBy(_.getAs[String]("source"))
      .forall { case (_, rows) => rows.length == 7 })
    // small group: capped at group size
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "source")
    val t = PipelineOps.deterministicSample(tiny, "doc_id", "source", 7)
      .collect()
    assert(t.count(_.getAs[String]("source") == "a") == 2)
    assert(t.count(_.getAs[String]("source") == "b") == 1)
  }

  test("hashSplit: total partition, deterministic, roughly proportional") {
    val docs = (0L until 2000L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val out = PipelineOps.hashSplit(docs, "doc_id")
    val bydoc = out.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(bydoc.size == 2000) // every doc assigned exactly one split
    // deterministic: a different physical layout gives the same mapping
    val again = PipelineOps.hashSplit(docs.repartition(17), "doc_id")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == bydoc)
    val n = bydoc.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(n("train") > 1800 && n.getOrElse("val", 0) > 0 &&
      n.getOrElse("test", 0) > 0, n.toString)
    // custom cuts: bounds are [0, hi) half-open and exhaustive
    val halves = PipelineOps.hashSplit(docs, "doc_id",
      cuts = Seq("a" -> 50, "b" -> 100))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(halves.values.sum == 2000 && halves.keySet == Set("a", "b"))
  }

  test("chunkTokens: full coverage, exact overlap, short tail, empty drop") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 toks
      (2L, "a b c"),                                  // shorter than chunk
      (3L, "   ")                                     // no tokens → dropped
    ).toDF("doc_id", "text")
    val out = PipelineOps.chunkTokens(docs, "text", "doc_id",
        chunkSize = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
      .sortBy(t => (t._1, t._2))
    // stride 3: starts 0,3,6 — a start ≥ n−overlap (9) would yield a
    // chunk fully contained in its predecessor, so it must NOT appear
    assert(out.filter(_._1 == 1L).map(_._4).toSeq == Seq(
      "w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10"))
    assert(out.filter(_._1 == 1L).map(_._3).toSeq == Seq(4L, 4L, 4L))
    assert(out.filter(_._1 == 2L).map(_._4).toSeq == Seq("a b c"))
    assert(!out.exists(_._1 == 3L))
    // every token of doc 1 appears in some chunk (no loss)
    val covered = out.filter(_._1 == 1L).flatMap(_._4.split(" ")).toSet
    assert(covered == (1 to 10).map(i => s"w$i").toSet)
  }

  test("upsert: updates replace, others kept, fresh keys inserted") {
    val base = Seq((1L, "old1"), (2L, "old2"), (3L, "old3"))
      .toDF("doc_id", "text")
    val updates = Seq((2L, "new2"), (9L, "new9")).toDF("doc_id", "text")
    val out = PipelineOps.upsert(base, updates, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "old1", 2L -> "new2", 3L -> "old3",
      9L -> "new9"))
  }

  test("decontamination: overlap fraction is exact on known overlap") {
    val bench = Seq((100L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // 8 tokens, identical to benchmark doc -> its single 8-gram is contaminated
      (0L, "one two three four five six seven eight"),
      // no 8-gram in common
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val out = PipelineOps.decontamination(corpus, bench, "text", 8)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_grams") == 1L)
    assert(out(0).getAs[Long]("n_hit") == 1L)
    assert(out(0).getAs[Double]("contam") == 1.0)
    assert(out(1).getAs[Long]("n_hit") == 0L)
    assert(out(1).getAs[Double]("contam") == 0.0)
  }

  test("sourceOverlap: counts distinct shared keys once, ignores " +
    "within-source dups, ordered pairs only") {
    val docs = Seq(
      ("web", "shared one"), ("web", "shared one"), // within-source dup
      ("web", "web only"),
      ("books", "shared one"), ("books", "shared two"),
      ("code", "shared two"), ("code", "shared one"))
      .toDF("source", "text")
    val out = PipelineOps.sourceOverlap(docs, "source", col("text"))
      .orderBy("source_a", "source_b")
      .as[(String, String, Long)].collect().toSeq
    assert(out == Seq(
      ("books", "code", 2L),  // both shared texts
      ("books", "web", 1L),
      ("code", "web", 1L)))
  }

  test("qualityDeciles: ntile spreads remainder to early buckets, " +
    "bounds track the score order") {
    val docs = (1 to 7).map(i => ("s", i.toLong, 100L - i))
      .toDF("source", "doc_id", "score")
    val out = PipelineOps.qualityDeciles(docs, "source", "score",
        "doc_id", buckets = 3)
      .orderBy("decile")
      .as[(String, Int, Long, Long, Long)].collect().toSeq
    // 7 rows into 3 buckets → sizes 3,2,2; scores 99..93 descending
    assert(out == Seq(
      ("s", 1, 3L, 97L, 99L),
      ("s", 2, 2L, 95L, 96L),
      ("s", 3, 2L, 93L, 94L)))
  }

  test("budgetSelect: best-score-first greedy fill stops at the budget, " +
    "per source independently") {
    val docs = Seq(
      // source s1: scores 9,8,7 with 40/50/20 tokens; budget 90 → keep 9,8
      ("s1", 1L, 9L, 40), ("s1", 2L, 8L, 50), ("s1", 3L, 7L, 20),
      // source s2: single doc within budget
      ("s2", 4L, 1L, 10))
      .toDF("source", "doc_id", "score", "n_tok")
    val out = PipelineOps.budgetSelect(docs, "source", "score", "doc_id",
        col("n_tok"), budget = 90L)
      .orderBy("source")
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("s1", 2L, 90L), ("s2", 1L, 10L)))
  }

  test("sessionize: gap splits sessions, ties break on id, duration from " +
    "session bounds") {
    import java.sql.Timestamp
    def ts(min: Int) = Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    val events = Seq(
      (1L, ts(0), 100L),  // u100 session 1: 10:00, 10:20
      (2L, ts(20), 100L),
      (3L, ts(55), 100L), // 35-min gap > 30 → session 2: 10:55
      (4L, ts(0), 200L),  // u200: single event, duration 0
      (5L, ts(10), 300L), // u300: tie on ts — event 5 then 6 by id
      (6L, ts(10), 300L))
      .toDF("event_id", "ts", "user_id")
    val out = PipelineOps.sessionize(events, "user_id", "ts", "event_id",
        gapSeconds = 1800)
      .orderBy("user_id", "session_seq")
      .select("user_id", "session_seq", "n_events", "dur_us")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (100L, 1L, 2L, 20L * 60 * 1000000),
      (100L, 2L, 1L, 0L),
      (200L, 1L, 1L, 0L),
      (300L, 1L, 2L, 0L)))
  }

  test("sessionize == session_window on real events (same gap, same " +
    "sessions): per-user session multisets agree") {
    val events = graft.engine.Tables.events(spark, sf0001)
      .withColumn("ts", col("ts").cast("timestamp"))
    val batch = PipelineOps.sessionize(events, "user_id", "ts",
        "event_id", 1800)
      .select("user_id", "n_events")
      .as[(Long, Long)].collect().sorted.toSeq
    val windowed = graft.streaming.StreamingOps.sessionCounts(events)
      .select(col("user_id"), col("n").as("n_events"))
      .as[(Long, Long)].collect().sorted.toSeq
    // same 30-min gap rule (events at EXACTLY the gap boundary could
    // legally differ: session_window's end is exclusive, the lag rule's
    // threshold is strict — the fixture has no such tie)
    assert(batch == windowed)
  }

  test("pairSupport: hand support and lift, duplicate item rows " +
    "collapse, order asc within pair") {
    val rows = Seq((1L, "x"), (1L, "y"), (1L, "x"), // dup x in basket 1
      (2L, "y"), (2L, "x"), (3L, "x"), (3L, "z"), (4L, "y"))
      .toDF("bk", "it")
    // sup: x=3 y=3 z=1, baskets=4; co(x,y)=2 → lift 2·4/9;
    // co(x,z)=1 → lift 1·4/3
    val out = PipelineOps.pairSupport(rows, "bk", "it", minSupport = 1)
      .orderBy("item_a", "item_b")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out == Seq(("x", "y", 2L, 0.888889), ("x", "z", 1L, 1.333333)))
    // support floor: only the co=2 pair survives minSupport=2
    val floored = PipelineOps.pairSupport(rows, "bk", "it", minSupport = 2)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(floored.map(t => (t._1, t._2)) == Seq(("x", "y")))
  }

  test("associationRules: hand confidences both directions, minConf " +
    "filter, lift symmetric across the direction split") {
    val rows = Seq((1L, "x"), (1L, "y"), (1L, "x"),
      (2L, "y"), (2L, "x"), (3L, "x"), (3L, "z"), (4L, "y"))
      .toDF("bk", "it")
    // sup: x=3 y=3 z=1; co(x,y)=2 co(x,z)=1
    // x⇒y conf 2/3, y⇒x conf 2/3, x⇒z conf 1/3, z⇒x conf 1/1
    val out = PipelineOps.associationRules(rows, "bk", "it",
        minSupport = 1, minConf = 0.0)
      .orderBy("antecedent", "consequent")
      .as[(String, String, Long, Double, Double)].collect().toSeq
    assert(out == Seq(
      ("x", "y", 2L, 0.666667, 0.888889),
      ("x", "z", 1L, 0.333333, 1.333333),
      ("y", "x", 2L, 0.666667, 0.888889),
      ("z", "x", 1L, 1.0, 1.333333)))
    // minConf keeps z⇒x (1.0) but drops x⇒z (0.333)
    val conf = PipelineOps.associationRules(rows, "bk", "it",
        minSupport = 1, minConf = 0.5)
      .orderBy("antecedent", "consequent")
      .as[(String, String, Long, Double, Double)].collect().toSeq
    assert(conf.map(r => (r._1, r._2)) ==
      Seq(("x", "y"), ("y", "x"), ("z", "x")))
  }

  test("fdAudit: hand violation counts; NULL lhs is its own group, " +
    "NULL rhs not a distinct image; union over candidates") {
    val rows = Seq((Some("a"), Some(1)), (Some("a"), Some(1)),
      (Some("a"), Some(2)), (Some("b"), Some(3)), (None, Some(4)),
      (None, Some(5)), (Some("c"), None)).toDF("l", "r")
    val out = PipelineOps.fdAudit(rows, Seq(("l", "r"), ("r", "l")))
      .as[(String, String, Long, Long, Boolean, Long)]
      .collect().toSeq.sortBy(t => (t._1, t._2))
    // l→r: groups a,b,NULL,c; a and NULL violate (2 images each);
    //   c's only r is NULL → 0 images, not a violation
    // r→l: 6 groups (1..5, NULL), every image set ≤ 1 → holds
    assert(out == Seq(
      ("l", "r", 4L, 2L, false, 2L),
      ("r", "l", 6L, 0L, true, 1L)))
  }

  test("quantileNormalize: shifted sources land on the SAME global " +
    "grid values; hand-checked quantiles") {
    val docs = ((1 to 5).map(v => (v.toLong, "A", v.toDouble)) ++
      (1 to 5).map(v => (v + 10L, "B", 100.0 + v)))
      .toDF("id", "src", "v")
    val out = PipelineOps.quantileNormalize(docs, "src", "v", "id")
      .select("src", "v", "normalized")
      .as[(String, Double, Double)].collect().toSeq
    // global sorted: 1..5,101..105; within-source percentiles 0,.25,.5,
    // .75,1 → positions 0, 2.25, 4.5, 6.75, 9 → global quantiles
    // 1, 3.25, 53, 102.75, 105 for BOTH sources
    val expect = Seq(1.0, 3.25, 53.0, 102.75, 105.0)
    for (s <- Seq("A", "B")) {
      val got = out.filter(_._1 == s).sortBy(_._2).map(_._3)
      assert(got == expect, s"source $s: $got")
    }
  }

  test("paretoFrontier: hand case — same-x dominated, duplicates kept, " +
    "interior point dropped") {
    val pts = Seq((1L, 1, 5.0), (2L, 2, 4.0), (3L, 3, 3.0),
      (4L, 2, 2.0),  // dominated by (2,4) on y at same x
      (5L, 0, 5.0),  // dominated by (1,5) on x at same y
      (6L, 3, 3.0))  // exact duplicate of (3,3): both stay
      .toDF("id", "x", "y")
    val got = PipelineOps.paretoFrontier(pts, "x", "y", buckets = 2)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L, 6L))
  }

  test("paretoFrontier == brute-force dominance on deterministic data, " +
    "any bucket count") {
    val pts = (0 until 400)
      .map(i => (i.toLong, (i * 37) % 101, ((i * 53) % 97).toDouble))
    val brute = pts.filter { case (_, ax, ay) =>
      !pts.exists { case (_, bx, by) =>
        bx >= ax && by >= ay && (bx > ax || by > ay) }
    }.map(_._1).toSet
    val df = pts.toDF("id", "x", "y")
    for (b <- Seq(1, 7, 32)) {
      val got = PipelineOps.paretoFrontier(df, "x", "y", buckets = b)
        .select("id").as[Long].collect().toSet
      assert(got == brute, s"buckets=$b")
    }
  }

  test("sessionize plan: lag, running sum, and the session aggregate " +
    "share ONE exchange on the user key") {
    val events = graft.engine.Tables.events(spark, sf0001)
    val plan = PipelineOps.sessionize(events, "user_id", "ts", "event_id",
      1800).queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1, plan)
  }

  test("quotaSample: floor guarantees tail groups, frac drives big " +
    "groups, draw is deterministic under repartitioning") {
    val rows = (1L to 300L).map(i => (if (i <= 280) "big" else "tail", i))
    val df = rows.toDF("g", "id")
    val out = PipelineOps.quotaSample(df, "g", "id", frac = 0.05,
      minPerGroup = 8)
    val byG = out.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(byG("big") == 14L)  // floor(280·0.05) = 14 > 8
    assert(byG("tail") == 8L)  // min floor 8 > floor(20·0.05) = 1
    // ranks are 1..quota with no gaps
    val ranks = out.filter($"g" === "tail").select("rk")
      .as[Long].collect().toSeq.sorted
    assert(ranks == (1L to 8L))
    val again = PipelineOps.quotaSample(df.repartition(13), "g", "id",
      frac = 0.05, minPerGroup = 8)
      .orderBy("g", "rk").collect().toSeq
    assert(again == out.orderBy("g", "rk").collect().toSeq)
  }

  test("looImpact: hand-computed leave-one-out deltas; removing a " +
      "below-average source RAISES the corpus mean; single group → NULL") {
    import org.apache.spark.sql.functions.col
    // a: {1,3} mean 2; b: {10} → all-mean 14/3; drop a → 10; drop b → 2
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0)).toDF("g", "v")
    val out = PipelineOps.looImpact(df, "g", "v")
      .as[(String, Long, Double, Double, Option[Double],
        Option[Double])].collect().toSeq
    val allMean = BigDecimal(14.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Seq(
      ("a", 2L, 2.0, allMean, Some(10.0),
        Some(BigDecimal(10 - 14.0 / 3)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)),
      ("b", 1L, 10.0, allMean, Some(2.0),
        Some(BigDecimal(2 - 14.0 / 3)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))))
    val single = PipelineOps.looImpact(
      Seq(("x", 1.0)).toDF("g", "v"), "g", "v").collect()(0)
    assert(single.isNullAt(4) && single.isNullAt(5))
  }

  test("liftCurve: perfectly-ranking score concentrates all lift in " +
      "the top bin; constant-noise label reads lift 1 everywhere") {
    import org.apache.spark.sql.functions.col
    // scores 1..100, positives exactly the top decile (score > 90)
    val perfect = (1 to 100).map(i => (i.toDouble, if (i > 90) 1 else 0))
      .toDF("sc", "y")
    val out = PipelineOps.liftCurve(perfect, "sc", "y")
      .as[(Int, Long, Long, Double, Option[Double])].collect().toSeq
    assert(out.size == 10 && out.forall(_._2 == 10L))
    assert(out.last == ((9, 10L, 10L, 1.0, Some(10.0))))
    assert(out.init.forall(r => r._3 == 0L && r._5 == Some(0.0)))
    // label independent of score → every decile's rate == base rate
    val flat = (1 to 100).map(i => (i.toDouble, i % 2))
      .toDF("sc", "y")
    val fo = PipelineOps.liftCurve(flat, "sc", "y")
      .as[(Int, Long, Long, Double, Option[Double])].collect().toSeq
    assert(fo.forall(_._5 == Some(1.0)))
  }

  test("statPartials merge law: any split folds to the bits of a " +
      "full recompute; order- and arity-independent") {
    import org.apache.spark.sql.functions.col
    val ev = graft.engine.Tables.events(spark, sf0001)
    val full = PipelineOps.finalizeStats(
      PipelineOps.statPartials(ev, "event_type", "value"),
      "event_type").collect().toSeq
    val Seq(a, b, c) = Seq(
      ev.filter(col("event_id") % 3 === 0),
      ev.filter(col("event_id") % 3 === 1),
      ev.filter(col("event_id") % 3 === 2))
      .map(PipelineOps.statPartials(_, "event_type", "value"))
    val threeWay = PipelineOps.finalizeStats(
      PipelineOps.mergePartials(Seq(a, b, c), "event_type"),
      "event_type").collect().toSeq
    assert(threeWay == full)
    // associativity: (a⊕b)⊕c — merge of a merged partial is still a partial
    val nested = PipelineOps.finalizeStats(
      PipelineOps.mergePartials(Seq(
        PipelineOps.mergePartials(Seq(c, b), "event_type"), a),
        "event_type"),
      "event_type").collect().toSeq
    assert(nested == full)
  }

  test("negativeSample: cross-label only, same-bucket only, k per " +
      "anchor when the pool allows, deterministic under repartition") {
    import org.apache.spark.sql.functions.col
    val emb = graft.engine.Tables.embeddings(spark, sf0001)
    val out = PipelineOps.negativeSample(emb, "vec_id", "label",
      k = 4, buckets = 8).collect().toSeq
    val labels = emb.select(col("vec_id"), col("label"))
      .as[(Long, Int)].collect().toMap
    def bucket(id: Long): Long = {
      var h = 0L
      id.toString.foreach(c => h = (h * 31 + c.toInt) % 1000000007L)
      ((h * 2654435761L + 12345L) % 1000000007L) % 8
    }
    out.foreach { r =>
      val (a, n, nl) = (r.getLong(0), r.getLong(2), r.getInt(3))
      assert(labels(a) != nl) // never the anchor's own label
      assert(labels(n) == nl)
      assert(bucket(a) == bucket(n)) // drawn from the anchor's bucket
    }
    // with 500 vecs over 8 buckets and 5 labels, every pool ≫ 4
    val perAnchor = out.groupBy(_.getLong(0)).view.mapValues(_.size)
    assert(perAnchor.values.forall(_ == 4))
    assert(perAnchor.size == 500)
    // the bucket join must be a co-partitioned equi-join on bk —
    // anchor × corpus (nested loop / cartesian) is the scale-killer
    // this operator exists to avoid
    val plan = PipelineOps.negativeSample(emb, "vec_id", "label",
      k = 4, buckets = 8).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    val again = PipelineOps.negativeSample(emb.repartition(11),
      "vec_id", "label", k = 4, buckets = 8).collect().toSeq
    assert(again == out)
  }
}
