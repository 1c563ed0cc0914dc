package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators beyond the reference's surface:
  * rule-based quality filtering, sequence packing, mixture weighting, and
  * benchmark decontamination — the ops a 100 TB pretraining-data build
  * runs after dedup ([[Dedup]]) and scoring ([[TextOps]]).
  *
  * All four are single-pass or single-shuffle per doc/group and
  * deterministic end-to-end, so every one is DuckDB-oracle-checkable
  * (q80–q82, q84).
  */
object PipelineOps {

  /** Gopher-style heuristic quality rules (Rae et al. 2021, App. A1.1 —
    * public paper; thresholds simplified): per-doc word count, mean word
    * length, alphabetic-word fraction and stopword presence, each as a
    * 0/1 flag plus the conjunction. One projection, no shuffle — at
    * 100 TB this runs at scan speed and the `pass` column drives the
    * downstream filter. */
  def qualityFlags(df: DataFrame, textCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    val nWords = size(toks).cast("long")
    val sumWlen = aggregate(toks, lit(0L), (a, w) => a + length(w))
    val meanWlen = sumWlen.cast("double") / nWords
    val nAlpha = size(filter(toks, w => w.rlike("[A-Za-z]"))).cast("long")
    val fracAlpha = nAlpha.cast("double") / nWords
    val nStop = TextOps.stopwordCount(col(textCol)).cast("long")
    val fLen = (nWords >= 10 && nWords <= 100000).cast("long")
    val fWlen = (meanWlen >= 3.0 && meanWlen <= 10.0).cast("long")
    val fAlpha = (fracAlpha > 0.8).cast("long")
    val fStop = (nStop >= 2L).cast("long")
    df.select(col(idCol),
      nWords.as("n_words"),
      round(meanWlen, 4).as("mean_wlen"),
      round(fracAlpha, 4).as("frac_alpha"),
      nStop.as("n_stop"),
      fLen.as("f_len"), fWlen.as("f_wlen"),
      fAlpha.as("f_alpha"), fStop.as("f_stop"),
      (fLen * fWlen * fAlpha * fStop).as("pass"))
  }

  /** Concat-then-chunk sequence packing: documents are laid out
    * back-to-back in (partition, doc_id) order and cut into fixed
    * `budget`-token chunks — the standard pretraining packing layout.
    * Emits each doc's token offsets and the chunk ids it lands in
    * (`n_chunks > 1` ⇔ the doc straddles a boundary and will be split).
    * The running offset is one window cumsum per partition key: exact
    * long arithmetic, one shuffle, no sequential driver loop — at 100 TB
    * the partition key (here `lang`; in production a shard id) bounds
    * every window to one executor's stream. */
  def packSequences(df: DataFrame, textCol: String, partCol: String,
      budget: Long, idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(partCol).orderBy(idCol)
    val nTok = TextOps.tokenCount(col(textCol)).cast("long")
    df.select(col(idCol), col(partCol), nTok.as("n_tok"))
      .withColumn("end_off", sum(col("n_tok")).over(w))
      .withColumn("start_off", col("end_off") - col("n_tok"))
      .withColumn("first_chunk", floor(col("start_off") / budget.toDouble))
      .withColumn("last_chunk", floor((col("end_off") - 1) / budget.toDouble))
      .select(col(idCol), col(partCol), col("n_tok"),
        col("start_off"), col("end_off"), col("first_chunk"),
        (col("last_chunk") - col("first_chunk") + 1L).as("n_chunks"),
        (col("last_chunk") > col("first_chunk")).cast("long").as("crosses"))
  }

  /** Temperature-weighted source mixture (temperature 0.5, i.e.
    * w ∝ √p — √ because IEEE-754 sqrt is correctly rounded, so the
    * weights are bit-identical across engines, unlike pow(p, α)):
    * per-source token share p, weight w = √p, normalized sampling share,
    * and planned docs per 1M-doc epoch. Normalization is deterministic:
    * weights round to 6 dp, then sum EXACTLY as decimals — the usual
    * double-sum order dependence never appears. One agg + one 20-row
    * window; the doc-scan dominates at any scale. */
  def mixtureWeights(df: DataFrame, textCol: String, srcCol: String)
      : DataFrame = {
    val per = df.groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextOps.tokenCount(col(textCol)).cast("long")).as("n_tok"))
    val all = Window.partitionBy()
    val p = col("n_tok").cast("double") /
      sum(col("n_tok")).over(all).cast("double")
    val w6 = round(sqrt(p), 6)
    val sumW = sum(w6.cast("decimal(38,6)")).over(all).cast("double")
    val share = round(w6 / sumW, 6)
    per.select(col(srcCol), col("n_docs"), col("n_tok"),
        round(p, 6).as("p_tok"), w6.as("w_temp"), share.as("share"),
        floor(share * 1000000d).cast("long").as("planned_docs"))
      .orderBy(srcCol)
  }

  /** Gopher-style repetition signals (Rae et al. 2021, App. A1.1):
    * duplicate-token fraction (1 − distinct/total) and top-bigram
    * fraction (most frequent 2-gram / all 2-grams) — the filters that
    * catch boilerplate and degenerate generations. A per-row native
    * kernel ([[graft.functions.ArrayTopCountExpr]]) computes the max
    * bigram multiplicity in one hashmap pass, so the whole operator is a
    * scan-speed projection — the naive formulation (explode every bigram
    * → groupBy → max) shuffles the corpus's entire n-gram stream for a
    * per-doc statistic. Docs with < 2 tokens have no bigrams and are
    * dropped (nothing to measure). */
  def repetitionStats(df: DataFrame, textCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    val bigrams = graft.functions.ShingleHash.shingle_hash(toks, 2)
    df.select(col(idCol),
        size(toks).cast("long").as("n_tok"),
        size(array_distinct(toks)).cast("long").as("n_distinct"),
        size(bigrams).cast("long").as("n_bigrams"),
        graft.functions.expressions.array_top_count(bigrams)
          .as("max_bigram"))
      .filter(col("n_bigrams") >= 1)
      .select(col(idCol), col("n_tok"), col("n_distinct"),
        round(lit(1.0) -
          col("n_distinct").cast("double") / col("n_tok"), 6)
          .as("dup_frac"),
        round(col("max_bigram").cast("double") / col("n_bigrams"), 6)
          .as("top_bigram_frac"))
      .orderBy(idCol)
  }

  /** Conservative character-class-only patterns (identical semantics in
    * Java regex and RE2-style engines — no lookaround, no shorthand
    * classes, so the DuckDB oracle matches byte-for-byte). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
  val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** PII detection + redaction: per-doc email/phone/IPv4 counts and the
    * post-redaction length. Email replaces first (its domain could
    * otherwise be bitten by the IPv4 pattern), then phone, then IP.
    * Pure projection — scan-speed at any scale. */
  def piiScrub(df: DataFrame, textCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val t = col(textCol)
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(t, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")
    val nE = regexp_count(t, lit(EmailRe))
    val nP = regexp_count(regexp_replace(t, EmailRe, "<EMAIL>"),
      lit(PhoneRe))
    val nI = regexp_count(
      regexp_replace(regexp_replace(t, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"), lit(Ipv4Re))
    df.select(col(idCol),
      nE.cast("long").as("n_emails"),
      nP.cast("long").as("n_phones"),
      nI.cast("long").as("n_ips"),
      length(redacted).cast("long").as("redacted_len"),
      (nE + nP + nI > 0).cast("long").as("has_pii"))
  }

  /** Deterministic per-group sampling: rank docs inside each group by a
    * hash of their id (polyHash of the decimal string — replicable in
    * any engine) and keep the first `perGroup`. Unlike seeded RNG
    * sampling, the sample is a pure function of the data — reproducible
    * across engines, retries, and partitionings, and therefore
    * oracle-checkable (the reason real pipelines prefer hash-based
    * systematic sampling for eval slices). One window per group; the
    * hash is uniform enough that rank-k is an unbiased k-subset. */
  def deterministicSample(df: DataFrame, idCol: String, groupCol: String,
      perGroup: Int): DataFrame = {
    val h = TextOps.scrambledHash(col(idCol).cast("string"))
    val w = Window.partitionBy(groupCol)
      .orderBy(col("__h"), col(idCol))
    df.withColumn("__h", h)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= perGroup)
      .select(col(idCol), col(groupCol), col("rank"))
  }

  /** Deterministic weighted sampling via PRIORITY SAMPLING
    * (Duffield–Lund–Thorup, JACM 2007 — public literature): item priority
    * q = w/u with u = hash-uniform(id) ∈ (0,1]; the k largest priorities
    * per group are the sample, and the (k+1)-th priority τ yields the
    * unbiased DLT weight estimator max(w, τ) (its sum over the sample
    * estimates the group's total weight). Hash-derived u ⇒ no RNG state:
    * the draw reproduces across engines, reruns and partitionings — and a
    * priority is ONE division (no ln/exp), so unlike exponential-clock
    * A-ES sampling it is IEEE-exact cross-engine and fully
    * oracle-checkable. The weighted counterpart of
    * [[deterministicSample]].
    *
    * Scale shape: priorities are a scan-speed projection; selection runs
    * through [[graft.plans.GroupTopK]] (map-side bounded heaps of k+1
    * rows per group per partition — no per-group sort, no full-corpus
    * window); the rank/τ pass then touches only |groups|·(k+1) rows. */
  def prioritySample(df: DataFrame, groupCol: String, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = (TextOps.scrambledHash(col(idCol).cast("string")) + 1)
      .cast("double") / TextOps.HashPrime.toDouble
    val base = df.select(col(groupCol), col(idCol),
        col(weightCol).cast("double").as("__w"))
      .withColumn("priority", col("__w") / u)
    val top = graft.plans.GroupTopK.topK(base, Seq(groupCol), "priority",
      idCol, k + 1)
    val w = Window.partitionBy(groupCol)
      .orderBy(col("priority").desc, col(idCol))
    val ranked = top.withColumn("rn", row_number().over(w).cast("long"))
    val tau = ranked.filter(col("rn") === k + 1)
      .select(col(groupCol), col("priority").as("__tau"))
    // outputs stay UNROUNDED: every value here is a chain of IEEE-exact
    // scalar ops (casts, one or two divisions, max), so both engines
    // produce bit-identical doubles — whereas a 6-dp round at priority
    // magnitudes (~1e9, ULP ~5e-7) exposes the ENGINES' differing round
    // implementations (BigDecimal-exact vs scaled-multiply), which was a
    // measured 1-ulp hash mismatch
    ranked.filter(col("rn") <= k)
      .join(tau, Seq(groupCol), "left")
      .select(col(groupCol), col(idCol), col("rn"),
        col("priority"),
        greatest(col("__w"), coalesce(col("__tau"), lit(0.0)))
          .as("w_est"))
  }

  /** Deterministic train/val/test assignment by id hash: bucket =
    * polyHash(id) mod `buckets`, split = the first cut whose upper bound
    * exceeds the bucket. A pure projection (no shuffle, no state), so at
    * 100 TB it runs at scan speed; and because membership is a function
    * of the id alone, the same doc lands in the same split across
    * engines, reruns, and corpus versions — the property that keeps a
    * held-out set held out when the corpus is rebuilt (seeded
    * `randomSplit` re-deals on any lineage change). `cuts` are
    * cumulative upper bounds; the last must equal `buckets`. */
  def hashSplit(df: DataFrame, idCol: String,
      cuts: Seq[(String, Int)] =
        Seq("train" -> 98, "val" -> 99, "test" -> 100),
      buckets: Int = 100): DataFrame = {
    require(cuts.nonEmpty && cuts.last._2 == buckets,
      s"last cut must equal buckets=$buckets, got $cuts")
    // strictly increasing: a duplicate bound would make its split
    // unreachable (when-chain shadows it) with no error at assign time
    require(cuts.map(_._2).sliding(2).forall(w =>
      w.length < 2 || w(0) < w(1)),
      s"cuts must be strictly increasing, got $cuts")
    val b = pmod(graft.functions.expressions.poly_hash(
      col(idCol).cast("string")), lit(buckets.toLong))
    val split = cuts.init
      .foldLeft(Option.empty[Column]) { case (acc, (name, hi)) =>
        Some(acc.fold(when(b < hi, name))(_.when(b < hi, name)))
      }
      .fold(lit(cuts.last._1))(_.otherwise(cuts.last._1))
    df.withColumn("split", split)
  }

  /** Quota (minimum-coverage) sampling: per group, keep the first
    * `max(minPerGroup, ⌊frac·n_group⌋)` rows in deterministic hash order —
    * the eval-set draw that guarantees every language/source keeps a
    * floor of examples even when proportional sampling would starve the
    * tail groups (low-resource languages are exactly the ones a
    * proportional draw drops). The [[hashSplit]] determinism property
    * holds: membership is a function of (id, group population) only, so
    * reruns and engine changes reproduce the set.
    *
    * Scale shape: one group-partitioned sort feeds both the rank and the
    * group-count window (same partitioning, one exchange); no global
    * sort, no state. */
  def quotaSample(df: DataFrame, groupCol: String, idCol: String,
      frac: Double, minPerGroup: Int): DataFrame = {
    require(frac >= 0 && frac <= 1, s"frac must be in [0,1], got $frac")
    val h = TextOps.scrambledHash(col(idCol).cast("string"))
    val w = Window.partitionBy(groupCol).orderBy(col("__h"), col(idCol))
    val n = Window.partitionBy(groupCol)
    df.select(col(groupCol), col(idCol))
      .withColumn("__h", h)
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(n))
      .filter(col("rk") <=
        greatest(lit(minPerGroup.toLong), floor(col("__n") * frac)))
      .select(col(groupCol), col(idCol), col("rk"))
  }

  /** Overlapping token-window chunking (RAG indexing / long-document
    * preprocessing): each doc explodes into windows of `chunkSize` tokens
    * starting every `chunkSize - overlap` tokens, so consecutive chunks
    * share `overlap` tokens and no token is lost (the final window may be
    * short). Chunk identity = (doc, ordinal), deterministic. A single
    * projection + explode — no shuffle, no state — so at 100 TB it runs
    * at scan speed and the output streams straight into a partitioned
    * sink; expansion factor ≈ 1 + overlap/(chunkSize−overlap). */
  def chunkTokens(df: DataFrame, textCol: String, idCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got overlap=$overlap size=$chunkSize")
    val stride = chunkSize - overlap
    val toks = filter(TextOps.tokens(col(textCol)), w => length(w) > 0)
    df.withColumn("__toks", toks)
      .filter(size(col("__toks")) > 0)
      .select(col(idCol), col("__toks"),
        // last start is capped at n − overlap − 1: a window starting at
        // n − overlap or later lies entirely inside its predecessor
        // (both clip at n), and a duplicate-content chunk would inflate
        // a RAG index with repeat retrieval hits
        explode(sequence(lit(0),
          greatest(size(col("__toks")) - (overlap + 1), lit(0)),
          lit(stride)))
          .as("__start"))
      .select(col(idCol),
        (col("__start") / stride).cast("long").as("chunk_id"),
        slice(col("__toks"), col("__start") + 1, lit(chunkSize))
          .as("__chunk"))
      .select(col(idCol), col("chunk_id"),
        size(col("__chunk")).cast("long").as("n_tok"),
        array_join(col("__chunk"), " ").as("chunk_text"))
  }

  /** Key-based upsert (incremental corpus refresh): rows of `base` whose
    * key appears in `updates` are replaced by the update row; everything
    * else is kept. The anti-join shuffles on the key (or broadcasts when
    * the update batch is small — the common recrawl case, picked
    * automatically by the planner); the union adds no shuffle. This is
    * the nightly-refresh primitive: yesterday's corpus + today's recrawl
    * batch → new corpus, without rewriting unchanged rows' lineage.
    * Schemas must match by name (`unionByName`). */
  def upsert(base: DataFrame, updates: DataFrame, keyCol: String)
      : DataFrame =
    base.join(updates.select(keyCol), Seq(keyCol), "left_anti")
      .unionByName(updates)

  /** Benchmark decontamination by k-gram overlap: every corpus doc is
    * scored by the fraction of its distinct k-gram hashes that appear in
    * the benchmark set (the standard train/test-leak check). The
    * benchmark gram set is a distinct projection (small — AQE broadcasts
    * the probe join); the corpus side is one explode + one aggregate. A
    * benchmark gram set too large to broadcast still works: the join
    * falls back to shuffle on the gram hash. */
  def decontamination(corpus: DataFrame, bench: DataFrame, textCol: String,
      k: Int, idCol: String = "doc_id"): DataFrame = {
    def grams(df: DataFrame) = df.select(col(idCol),
      explode(Dedup.shingleHashes(col(textCol), k)).as("g"))
    val benchGrams = grams(bench).select("g").distinct()
      .withColumn("hit", lit(1))
    grams(corpus)
      .join(benchGrams, Seq("g"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_hit"))
      .select(col(idCol), col("n_grams"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_grams"), 6)
          .as("contam"))
      .orderBy(idCol)
  }

  /** Cross-source duplicate overlap matrix: for every source pair, how
    * many distinct identity keys appear in BOTH — the corpus-mixing
    * diagnostic (two crawls of the same sites inflate a naive mixture).
    * `key` defines duplicate identity: the raw text column for verbatim
    * overlap, [[Dedup.simhash32]] for near-dup overlap (re-whitespaced /
    * lightly-edited re-crawls still collide), an LSH bucket for looser
    * matching.
    *
    * Scale shape: distinct (source, key) first (one hash-agg — dedups
    * within-source copies so a text appearing f times in each of two
    * sources still counts once); the self-join then runs on the
    * deduplicated key space, quadratic only in per-key SOURCE count
    * (≤ |sources|, tiny by definition). Pass a fingerprint key — not raw
    * text — at scale so the shuffle carries bytes, not documents. */
  def sourceOverlap(df: DataFrame, srcCol: String, key: Column)
      : DataFrame = {
    val st = df.select(col(srcCol), key.as("__k")).distinct()
    st.as("a").join(st.as("b"),
        col("a.__k") === col("b.__k") &&
        col(s"a.$srcCol") < col(s"b.$srcCol"))
      .groupBy(col(s"a.$srcCol").as("source_a"),
        col(s"b.$srcCol").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Per-source quality deciles: ntile bucketing over a deterministic
    * (score desc, id) order with per-bucket doc counts and score bounds —
    * the curriculum/threshold-picking view of a quality score (which
    * decile does the budget cut actually land in?).
    *
    * Scale shape: one shuffle on the source key for the ntile window and
    * the (source, decile) aggregate; ntile needs the GROUP's row count,
    * not a global sort. Full tie-break (id) keeps bucket boundaries
    * replay-stable. */
  def qualityDeciles(df: DataFrame, srcCol: String, scoreCol: String,
      idCol: String, buckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(srcCol)
      .orderBy(col(scoreCol).desc, col(idCol))
    df.withColumn("decile", ntile(buckets).over(w))
      .groupBy(col(srcCol), col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        min(col(scoreCol)).as("min_score"),
        max(col(scoreCol)).as("max_score"))
  }

  /** Token-budget document selection: per `srcCol` group, walk documents
    * best-score-first (ties by id) and keep them until the group's
    * cumulative token count would exceed `budget` — the quota step that
    * turns mixture weights (q82) into an actual training-set cut.
    * Returns one summary row per source (docs kept, tokens used).
    *
    * Scale shape: one shuffle on the source key serves the ranking
    * window, the running token sum, and the final per-source aggregate;
    * per-source streams sort within partitions (skew dial: a giant
    * source is ordinary window skew — pre-aggregate per (source, score
    * bucket) if one source dominates). */
  def budgetSelect(df: DataFrame, srcCol: String, scoreCol: String,
      idCol: String, tokens: Column, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(srcCol)
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(srcCol), col(scoreCol), col(idCol),
        tokens.as("__n_tok"))
      .withColumn("__cum", sum(col("__n_tok")).over(w))
      .filter(col("__cum") <= budget)
      .groupBy(srcCol)
      .agg(count(lit(1)).as("n_selected"),
        sum(col("__n_tok")).as("tokens_used"))
  }

  /** Batch gap-based sessionization: assign a per-user session sequence
    * number (a new session starts when the gap to the previous event
    * exceeds `gapSeconds`), then aggregate one row per session with its
    * event count and wall duration. The batch twin of
    * [[graft.streaming.StreamingOps.sessionCounts]]'s `session_window` —
    * this formulation additionally yields a stable, oracle-checkable
    * session ID (cumulative new-session flags).
    *
    * Scale shape: a single shuffle on `userCol` serves BOTH windows (lag
    * and running sum share the partitioning and sort) and the final
    * per-session aggregate is partial-aggregated on the same keys —
    * `.explain` shows one Exchange. Per-user event streams sort within
    * the partition; no global sort. Ties on `tsCol` are broken by
    * `idCol` so retries and re-partitioning are deterministic. */
  /** Market-basket pair support and lift: for item pairs co-present in a
    * basket, support = co-basket count and lift = support·N /
    * (sup(a)·sup(b)) — association-rule mining's first stage (lift is
    * exp(PMI) over baskets; same candidate discipline as
    * [[TextOps.pmiPairs]] but bounded by BASKET size, which is naturally
    * small, instead of a vocab cap). Returns (item_a < item_b, support,
    * lift) with support ≥ `minSupport`.
    *
    * Scale shape: one basket-keyed shuffle builds sorted per-basket item
    * sets; pair generation is map-side from the arrays (≤ C(|basket|,2)
    * per basket); the pair hash-agg shuffles pair keys with map-side
    * partials. Item supports and the basket count broadcast back. */
  def pairSupport(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): DataFrame =
    pairSupportFull(df, basketCol, itemCol, minSupport)
      .select(col("item_a"), col("item_b"), col("support"),
        round(col("support").cast("double") * col("__nb") /
          (col("__sa") * col("__sb").cast("double")), 6).as("lift"))

  /** [[pairSupport]]'s internal frame WITH the marginals still attached:
    * (item_a < item_b, support, __sa, __sb, __nb). The family scratch —
    * [[pairSupport]] derives lift from it and [[associationRules]]
    * derives directed confidences; the basket shuffle and pair hash-agg
    * run once per family, never per metric. */
  private[ext] def pairSupportFull(df: DataFrame, basketCol: String,
      itemCol: String, minSupport: Long): DataFrame = {
    val b = df.select(col(basketCol).as("__bk"), col(itemCol).as("__it"))
      .distinct()
    val sup1 = b.groupBy("__it").agg(count(lit(1)).as("__s1"))
    val nb = b.agg(countDistinct(col("__bk")).as("__nb"))
    val baskets = b.groupBy("__bk")
      .agg(sort_array(collect_set(col("__it"))).as("__its"))
      .filter(size(col("__its")) >= 2)
    val pairs = baskets.select(explode(flatten(
      transform(sequence(lit(0), size(col("__its")) - 2), i =>
        transform(sequence(i + 1, size(col("__its")) - 1), j =>
          struct(element_at(col("__its"), i + 1).as("a"),
            element_at(col("__its"), j + 1).as("b")))))).as("p"))
    pairs.groupBy(col("p.a").as("item_a"), col("p.b").as("item_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .join(broadcast(sup1.select(col("__it").as("item_a"),
        col("__s1").as("__sa"))), "item_a")
      .join(broadcast(sup1.select(col("__it").as("item_b"),
        col("__s1").as("__sb"))), "item_b")
      .crossJoin(broadcast(nb))
  }

  /** Directed association rules from the [[pairSupport]] machinery: each
    * undirected co-basket pair (a, b) yields up to two rules —
    * a ⇒ b with confidence sup(a,b)/sup(a) and b ⇒ a with confidence
    * sup(a,b)/sup(b) — kept when confidence ≥ `minConf`. Support and
    * lift (both symmetric) ride along; confidence is the directed
    * signal lift alone cannot give (lift says a and b co-occur beyond
    * chance; confidence says WHICH item predicts the other — the
    * recommendation direction). Classic support/confidence/lift
    * Agrawal-style rule mining, restricted to 2-itemsets where the pair
    * hash-agg IS the candidate generation (no Apriori lattice needed).
    *
    * Scale shape: identical to [[pairSupport]] — the direction split is
    * a map-side explode of the (≤ |item-pairs|)-row support frame, so
    * rules cost nothing beyond the pair agg itself. */
  def associationRules(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long, minConf: Double): DataFrame = {
    val full = pairSupportFull(df, basketCol, itemCol, minSupport)
    val lift = round(col("support").cast("double") * col("__nb") /
      (col("__sa") * col("__sb").cast("double")), 6)
    val fwd = full.select(col("item_a").as("antecedent"),
      col("item_b").as("consequent"), col("support"),
      round(col("support").cast("double") / col("__sa"), 6)
        .as("confidence"), lift.as("lift"))
    val bwd = full.select(col("item_b").as("antecedent"),
      col("item_a").as("consequent"), col("support"),
      round(col("support").cast("double") / col("__sb"), 6)
        .as("confidence"), lift.as("lift"))
    fwd.unionByName(bwd).filter(col("confidence") >= minConf)
  }

  /** Functional-dependency audit — the data-profiling primitive behind
    * "is this column a safe partition/bucket key for that one" and
    * "did upstream denormalization drift": for each candidate A → B,
    * report how many A-groups exist, how many VIOLATE the dependency
    * (more than one distinct B), and the worst fan-out. One row per
    * candidate: (lhs, rhs, n_groups, n_violations, holds,
    * max_distinct). NULL follows SQL semantics: a NULL lhs is its own
    * group, NULL rhs values don't count as a distinct image (COUNT
    * DISTINCT ignores them).
    *
    * Scale shape: each candidate is one (lhs)-keyed two-phase
    * count-distinct agg collapsed to a 1-row summary — no joins, no
    * windows, |candidates| bounded scans (Spark's scan-reuse caches the
    * file listing; at 100 TB you'd cache/persist `df` across the
    * candidate loop). The per-group distinct frame never leaves the
    * executors. */
  def fdAudit(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "need at least one candidate FD")
    pairs.map { case (lhs, rhs) =>
      df.groupBy(col(lhs).as("__l"))
        .agg(countDistinct(col(rhs)).as("__nd"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("__nd") > 1, 1L).otherwise(0L))
            .as("n_violations"),
          max(col("__nd")).as("max_distinct"))
        .select(lit(lhs).as("lhs"), lit(rhs).as("rhs"),
          col("n_groups"), col("n_violations"),
          (col("n_violations") === 0).as("holds"), col("max_distinct"))
    }.reduce(_ unionByName _)
  }

  /** Cross-source quantile normalization: replace each row's value with
    * the GLOBAL quantile at the row's within-group percentile — after
    * normalization every group has the same value distribution (the
    * global one), so a source whose quality scorer runs hot no longer
    * dominates a score-thresholded selection. The batch analogue of
    * microarray quantile normalization, grid-quantized for scale.
    *
    * Scale shape: the global distribution is summarized once into a
    * (grid+1)-point exact-percentile table
    * ([[graft.engine.Aggregates.exactPercentiles]] — memory-bounded, no
    * sort of the full data) and broadcast; per-row work is one
    * group-partitioned window (percent_rank, strict (value, id) order so
    * ties are deterministic) plus a broadcast equi-join on the bucket
    * index. Nothing global-sorts the corpus. */
  def quantileNormalize(df: DataFrame, groupCol: String, valCol: String,
      idCol: String, grid: Int = 100): DataFrame = {
    val ps = (0 to grid).map(_.toDouble / grid)
    // percentiles taken in ROW form (round-18): the old path pivoted
    // the 101 grid points into p0…p100 aggregate columns and exploded
    // them straight back to rows — a (grid+1)-column expression tree
    // Catalyst re-analyzed per run plus an extra aggregation, for a
    // frame whose only consumer wants rows. percentileRowsFromCdf
    // shares the exact bracket arithmetic, so __gv is bit-identical.
    val gridTab = graft.engine.Aggregates.percentileRowsFromCdf(
        graft.engine.Aggregates.rankedCdf(
            df.withColumn("__g", lit(1)), "__g", valCol)
          .localCheckpoint(eager = false), "__g", ps)
      .select(col("pi").as("__idx"), col("__p").as("__gv"))
    val w = Window.partitionBy(groupCol).orderBy(col(valCol), col(idCol))
    df.withColumn("__pr", percent_rank().over(w))
      .withColumn("__idx", floor(col("__pr") * grid).cast("int"))
      .join(broadcast(gridTab), "__idx")
      .drop("__idx", "__pr")
      .withColumnRenamed("__gv", "normalized")
  }

  /** 2-D Pareto frontier (skyline): rows not dominated on the maximize
    * pair (x, y) — a dominates b iff a.x ≥ b.x ∧ a.y ≥ b.y with at least
    * one strict. The multi-criteria selection a curation pipeline uses
    * when two quality signals must not be collapsed into one weighted
    * score (e.g. length vs lexical diversity): the frontier is every
    * trade-off point a rational weighting could pick.
    *
    * Distributed shape (NOT the O(n²) NOT-EXISTS self-join): dominance
    * pruning is algebraic — pareto(A ∪ B) = pareto(pareto(A) ∪
    * pareto(B)) — so the frontier reduces like an aggregate:
    *   1. per distinct x keep only max y (groupBy with map-side combine:
    *      same-x rows below the max are dominated);
    *   2. LOCAL prune: within each of `buckets` hash buckets, a desc-x
    *      running-max-y window kills coords whose y is covered by a
    *      larger-x coord in the same bucket;
    *   3. GLOBAL prune: same window over the ≤ buckets × |local
    *      frontier| survivors in one partition — bounded rows, the
    *      classic partial→final shape;
    *   4. broadcast the coordinate frontier back onto the full relation
    *      to recover every row carrying a frontier coordinate (equal
    *      coords never dominate each other, so all such rows qualify).
    * Shuffles: one keyed agg + two tiny window exchanges; the corpus
    * itself is touched by exactly one agg and one broadcast-joined scan. */
  def paretoFrontier(df: DataFrame, xCol: String, yCol: String,
      buckets: Int = 32): DataFrame = {
    def prune(pts: DataFrame, bucket: Column): DataFrame = {
      val w = Window.partitionBy("__b").orderBy(col("__x").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      pts.withColumn("__b", bucket)
        .withColumn("__prev_max", max(col("__ymax")).over(w))
        .filter(col("__prev_max").isNull ||
          col("__prev_max") < col("__ymax"))
        .select(col("__x"), col("__ymax"))
    }
    val coords = df.select(col(xCol).as("__x"), col(yCol).as("__y"))
      .groupBy("__x").agg(max(col("__y")).as("__ymax"))
    val local = prune(coords, pmod(xxhash64(col("__x")), lit(buckets)))
    val frontier = prune(local, lit(0))
      .withColumnRenamed("__ymax", "__y")
    df.join(broadcast(frontier),
      col(xCol) === col("__x") && col(yCol) === col("__y"), "leftsemi")
  }

  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapSeconds: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(userCol)
      .orderBy(col("__us"), col(idCol))
    val prev = lag(col("__us"), 1).over(byUser)
    events
      .withColumn("__us", unix_micros(col(tsCol).cast("timestamp")))
      .withColumn("__new_s",
        when(prev.isNull || col("__us") - prev > gapSeconds * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("__new_s")).over(byUser.rowsBetween(
          Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("__us")) - min(col("__us"))).as("dur_us"))
  }

  /** Mergeable per-key partials (n, Σ as exact decimal, min, max) —
    * the incremental-pipeline primitive: partials computed on ANY
    * disjoint split of the data merge with [[mergePartials]] into
    * bit-identical state, because counts add, exact decimals add
    * associatively, and min/max are semilattices. At 100 TB this is
    * how a daily batch updates a corpus-wide aggregate without
    * re-scanning history: keep the partial frame as the stored state,
    * fold each delta in, finalize on read. */
  def statPartials(df: DataFrame, keyCol: String, valCol: String)
      : DataFrame =
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valCol).cast("decimal(28,9)")).as("s"),
        min(col(valCol).cast("double")).as("mn"),
        max(col(valCol).cast("double")).as("mx"))

  /** Merge any number of [[statPartials]] frames (same key column)
    * into one partial frame — n adds, decimal sums add exactly,
    * min/max fold. Associative and commutative, so base+delta,
    * delta+base, or a 10-way daily fold all converge to the same
    * bits as one full recompute. */
  def mergePartials(parts: Seq[DataFrame], keyCol: String): DataFrame =
    parts.reduce(_.unionByName(_))
      .groupBy(col(keyCol))
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"),
        min(col("mn")).as("mn"), max(col("mx")).as("mx"))

  /** Human-facing view of a partial frame: (key, n, total, mn, mx,
    * mean) with 6-dp rounding on the derived columns. */
  def finalizeStats(partials: DataFrame, keyCol: String): DataFrame =
    partials.select(col(keyCol), col("n"),
      round(col("s").cast("double"), 6).as("total"),
      col("mn"), col("mx"),
      round(col("s").cast("double") / col("n"), 6).as("mean"))
      .orderBy(keyCol)

  /** Leave-one-out source impact — first-order data valuation: for
    * each group, the corpus-wide mean of `valCol` WITH and WITHOUT the
    * group, and the delta ("remove this source and the corpus mean
    * moves by Δ"). The question asked before dropping or down-weighting
    * a source; the 1st-order term of Shapley-style attribution, exact
    * and closed-form instead of resampled.
    *
    * Pure partial-algebra on [[statPartials]]' merge law: ONE group agg
    * of (n, exact-decimal Σ); the global totals are the summed partials
    * and every leave-one-out mean is (S − s_g)/(N − n_g) — no second
    * scan, no per-group recompute, |groups| arithmetic rows. */
  def looImpact(df: DataFrame, groupCol: String, valCol: String)
      : DataFrame = {
    val parts = df.filter(col(valCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valCol).cast("decimal(38,6)")).as("s"))
      .localCheckpoint(eager = false) // group rows + global re-agg
    val tot = parts.agg(sum("n").as("tn"), sum("s").as("ts"))
    val meanAll = col("ts").cast("double") / col("tn")
    // a single-group corpus has no leave-one-out complement → NULL
    val meanLoo = when(col("tn") > col("n"),
      (col("ts").cast("double") - col("s").cast("double")) /
        (col("tn") - col("n")))
    parts.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n"),
        round(col("s").cast("double") / col("n"), 6).as("mean_group"),
        round(meanAll, 6).as("mean_all"),
        round(meanLoo, 6).as("mean_loo"),
        round(meanLoo - meanAll, 6).as("delta"))
      .orderBy(groupCol)
  }

  /** Decile lift curve of a ranking score against a binary outcome —
    * the "is this cheap score worth sorting by" audit (lift_d =
    * P(y|decile d)/P(y): a useful score concentrates positives in its
    * top deciles; lift ≈ 1 everywhere means the score is noise for
    * this outcome). Bins come from the score's EXACT decile edges
    * (memory-bounded CDF machinery, broadcast back ⇒ binning is
    * map-side); then one (bin) hash-agg and a bins-row finish.
    * Observed bins only (heavy ties can merge deciles — a merged bin
    * is real information about the score's granularity). The CDF is
    * bounded by DISTINCT score values — integer-ish scores (lengths,
    * counts, 6-dp-rounded models) are fine as-is; pre-round a truly
    * continuous score so the distinct set stays bounded. */
  def liftCurve(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    val scored = df
      .select(col(scoreCol).cast("double").as("v"),
        col(labelCol).cast("int").as("y"))
      .filter(col("v").isNotNull)
      .localCheckpoint(eager = false) // edges + binning both read it
    val edges = graft.engine.Aggregates.exactPercentiles(
      scored.withColumn("g", lit(1)), "g", "v",
      (1 until bins).map(_ / bins.toDouble)).drop("g")
    val binExpr = (0 until bins - 1)
      .map(k => when(col("v") > col(s"p$k"), 1).otherwise(0))
      .reduce(_ + _)
    val binned = scored.crossJoin(broadcast(edges))
      .withColumn("b", binExpr)
    val tot = binned.agg(count(lit(1)).as("tn"),
      sum(col("y")).as("tp"))
    binned.groupBy(col("b").as("decile"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
      .crossJoin(broadcast(tot))
      .select(col("decile"), col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n"), 6).as("rate"),
        when(col("tp") > 0,
          round((col("n_pos").cast("double") / col("n")) /
            (col("tp").cast("double") / col("tn")), 6)).as("lift"))
      .orderBy("decile")
  }

  /** Deterministic contrastive negative sampling: for every anchor row,
    * the k pseudo-random same-bucket rows with a DIFFERENT label,
    * ranked by a pair hash — the (anchor, positive, negatives) builder
    * for contrastive / triplet training, RNG-free so a re-run (or a
    * backfill on one shard) reproduces byte-identical batches.
    *
    * Scale shape: the corpus is split into `buckets` pseudo-random
    * groups by a scrambled id hash and each anchor draws ONLY from its
    * own bucket — one co-partitioned shuffle equi-join on the bucket
    * key (never anchor × corpus), pair count n²/buckets. `buckets`
    * dials pool size ≈ n/buckets · P(label differs); at corpus scale
    * raise it so pools stay O(10³) while still ≫ k. The pair ranking
    * hash mixes BOTH ids, so an item popular in one anchor's list
    * ranks independently elsewhere — no global "celebrity negatives".
    * Anchors whose bucket holds fewer than k cross-label rows emit
    * fewer rows — LOWER `buckets` (bigger pools) if that matters. */
  def negativeSample(df: DataFrame, idCol: String, labelCol: String,
      k: Int, buckets: Int): DataFrame = {
    val bk = TextOps.scrambledHash(col(idCol).cast("string")) % buckets
    val a = df.select(col(idCol).as("a_id"),
      col(labelCol).as("a_label"), bk.as("bk"))
    val n = df.select(col(idCol).as("n_id"),
      col(labelCol).as("n_label"), bk.as("bk"))
    val w = Window.partitionBy("a_id").orderBy(col("r"), col("n_id"))
    a.join(n, Seq("bk"))
      .filter(col("a_label") =!= col("n_label"))
      .withColumn("r", TextOps.scrambledHash(
        concat(col("a_id").cast("string"), lit("#"),
          col("n_id").cast("string"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("a_id"), col("rank"), col("n_id"), col("n_label"))
      .orderBy("a_id", "rank")
  }
}
