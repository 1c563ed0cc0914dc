package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for an LLM training-data pipeline
  * (SURVEY.md §7.4): tokenization, token counting, quality scoring,
  * language-ID heuristic, document fingerprinting.
  *
  * Everything is a pure Catalyst expression over the `documents` table —
  * no UDFs, no driver round-trips — so the operators scale horizontally:
  * each is a narrow per-row projection (plus one hash-agg where noted).
  *
  * Cross-engine determinism: hashes use a polynomial rolling hash mod a
  * 31-bit prime (not murmur3) so the DuckDB oracle can replicate them
  * exactly; all arithmetic stays < 2^62 (no overflow ⇒ identical results
  * in engines that error on BIGINT overflow).
  */
object TextOps {

  val HashPrime = 1000000007L

  /** Whitespace tokenization (the baseline token counter).
    *
    * Every explode over `tokens`/`bigrams` in this file uses the
    * `_outer` generator + a null/length drop on the generator OUTPUT,
    * deliberately: plain explode makes the optimizer infer a
    * `size(...) > 0` filter below the Generate, whose alias
    * substitution re-runs the whole tokenization a second time per
    * row (see [[graft.ext.Multimodal.sampleFramesInContainer]] for
    * the measured pathology). outer infers no filter; the output-side
    * drop costs one null check per row. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Pairwise vocabulary overlap between groups (sources, languages,
    * snapshots): for every group pair, shared type count and vocab
    * Jaccard — the corpus-similarity matrix consulted before MIXING
    * sources (two near-identical crawls double-count; a disjoint
    * source adds diversity). One distinct (group, token) projection;
    * the self-join fans each token out by at most |groups| (never the
    * corpus), so the pair frame is |vocab|·|groups|-bounded and the
    * output |groups|²/2 rows — scale-free in the document count. */
  def vocabOverlap(docs: DataFrame, groupCol: String, textCol: String)
      : DataFrame = {
    val vocab = docs.select(col(groupCol).as("g"),
        explode_outer(tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
      .distinct()
      .localCheckpoint(eager = false) // sizes + both pair-join sides
    val sizes = vocab.groupBy("g").agg(count(lit(1)).as("nv"))
    val shared = vocab.select(col("g").as("ga"), col("tok"))
      .join(vocab.select(col("g").as("gb"), col("tok")), "tok")
      .filter(col("ga") < col("gb"))
      .groupBy("ga", "gb").agg(count(lit(1)).as("n_shared"))
    // full pair grid so DISJOINT pairs report 0, not absence — a
    // similarity matrix with silently missing cells reads as "not
    // computed", the opposite of "nothing in common"
    sizes.select(col("g").as("ga"), col("nv").as("nva"))
      .crossJoin(broadcast(
        sizes.select(col("g").as("gb"), col("nv").as("nvb"))))
      .filter(col("ga") < col("gb"))
      .join(shared, Seq("ga", "gb"), "left")
      .na.fill(0L, Seq("n_shared"))
      .select(col("ga"), col("gb"), col("nva"), col("nvb"),
        col("n_shared"),
        round(col("n_shared").cast("double") /
          (col("nva") + col("nvb") - col("n_shared")), 6).as("jaccard"))
      .orderBy("ga", "gb")
  }

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish token count: runs of alphanumerics count 1 per ~4 chars
    * (ceil(len/4)), punctuation counts 1 each — a cheap deterministic
    * approximation of subword tokenizers. */
  def bpeishTokenCount(c: Column): Column = {
    val words = split(trim(c), "[^A-Za-z0-9]+")
    val wordToks = aggregate(words, lit(0L),
      (acc, w) => acc + ceil(length(w).cast("double") / 4.0).cast("long"))
    val punct = length(regexp_replace(c, "[A-Za-z0-9\\s]", ""))
    (wordToks + punct).as("n_bpeish")
  }

  /** Polynomial rolling hash of a string from its code points:
    * h = fold(31·h + code(ch)) mod P. Oracle-replicable (DuckDB
    * list_reduce over ord()); max intermediate < P·31+127 < 2^62.
    * Native codegen expression ([[graft.functions.PolyHashExpr]]) — the
    * `aggregate(split(c,""), …)` lambda form computes the same value but
    * runs interpreted per character. */
  def polyHash(c: Column): Column = graft.functions.expressions.poly_hash(c)

  /** [[polyHash]] followed by a Knuth multiplicative scramble mod P —
    * the form to use whenever the hash drives an ORDERING or a uniform
    * draw (sampling ranks, bootstrap weights): the raw polynomial hash
    * of a short string barely wraps the modulus, so it is nearly
    * monotone in the input and "hash order" degenerates to input order
    * (spec-caught on the bootstrap CI). Max intermediate ≈ P·2654435761
    * < 2^63 — exact in Long and in DuckDB BIGINT, so oracles mirror the
    * same arithmetic. Bucketing/stripe uses (mod-k splits) may keep the
    * raw hash: consecutive inputs striping across buckets is systematic
    * sampling, which is the desired split behavior. */
  def scrambledHash(c: Column): Column =
    (graft.functions.expressions.poly_hash(c) * lit(2654435761L) +
      lit(12345L)) % HashPrime

  /** Reference lambda form of [[polyHash]] (kept for parity testing). */
  def polyHashLambda(c: Column): Column =
    aggregate(split(c, ""), lit(0L),
      (acc, ch) => (acc * 31 + ascii(ch)) % HashPrime)

  /** Document fingerprint: rolling hash over the sequence of token hashes
    * (order-sensitive — permuted docs get different fingerprints). */
  def docFingerprint(c: Column): Column =
    aggregate(transform(tokens(c), w => polyHash(w)), lit(0L),
      (acc, h) => (acc * 31 + h) % HashPrime)

  private val stopwords = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "it", "on", "for", "with", "as", "at", "by")

  /** Stopword count over whitespace tokens. */
  def stopwordCount(c: Column): Column =
    size(filter(tokens(c), w => w.isin(stopwords: _*)))

  /** Quality-score feature block (`length / punct / stopword ratios`):
    * one projection producing n_chars, n_tokens, avg_token_len,
    * punct_ratio, stopword_ratio, and a combined [0,1] score. */
  def withQualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumns(Map(
      "q_chars" -> length(t),
      "q_tokens" -> tokenCount(t),
      "q_punct" -> length(regexp_replace(t, "[A-Za-z0-9\\s]", "")),
      "q_stop" -> stopwordCount(t)))
      .withColumns(Map(
        "avg_token_len" -> (col("q_chars").cast("double") / col("q_tokens")),
        "punct_ratio" -> (col("q_punct").cast("double") / col("q_chars")),
        "stop_ratio" -> (col("q_stop").cast("double") / col("q_tokens"))))
  }

  /** TF-IDF pipeline over `documents.text` (SURVEY.md §7.4 text):
    * RegexTokenizer → StopWordsRemover → HashingTF → IDF. Returns the
    * fitted PipelineModel and the transformed frame with a `tfidf` vector
    * column. HashingTF keeps the feature space fixed-width (no vocabulary
    * broadcast), which is the 100 TB-friendly choice; CountVectorizer is
    * the exact-vocabulary alternative when the vocab fits. */
  def tfidf(df: DataFrame, textCol: String, numFeatures: Int = 1 << 12)
      : (org.apache.spark.ml.PipelineModel, DataFrame) = {
    import org.apache.spark.ml.Pipeline
    import org.apache.spark.ml.feature.{HashingTF, IDF, RegexTokenizer, StopWordsRemover}
    val tok = new RegexTokenizer()
      .setInputCol(textCol).setOutputCol("toks").setPattern("\\s+")
    val stop = new StopWordsRemover()
      .setInputCol("toks").setOutputCol("toks_clean")
      .setStopWords(stopwords.toArray)
    val tf = new HashingTF().setInputCol("toks_clean")
      .setOutputCol("tf").setNumFeatures(numFeatures)
    val idf = new IDF().setInputCol("tf").setOutputCol("tfidf")
    val model = new Pipeline().setStages(Array(tok, stop, tf, idf)).fit(df)
    (model, model.transform(df))
  }

  /** Relational TF-IDF (the oracle-checkable sibling of [[tfidf]]): terms
    * are whitespace tokens minus stopwords, hashed into a fixed-width
    * feature space with the oracle-replicable [[polyHash]] (mod
    * `numFeatures` — collisions fold counts, exactly like HashingTF's
    * murmur3 would, but deterministically across engines). Weight uses
    * MLlib's IDF formula idf(t) = ln((m+1)/(df+1)) with m = total docs,
    * rounded to 6dp so libm ulp differences cannot flip the hash compare.
    *
    * Output: one row per (doc, term bucket) — scalar columns only, so the
    * result is driver-comparable; the sparse-vector form is a pivot away.
    * Plan: explode → two hash-aggregates (tf, df) → broadcast scalar m —
    * all shuffles keyed on the term bucket / doc id, no driver round-trip. */
  def tfidfRelational(df: DataFrame, idCol: String, textCol: String,
      numFeatures: Int = 1 << 12, maxDf: Int = Int.MaxValue): DataFrame = {
    val terms = df.select(col(idCol),
        explode_outer(filter(tokens(col(textCol)),
          w => !w.isin(stopwords: _*) && length(w) > 0)).as("tok"))
      .filter(col("tok").isNotNull)
      .withColumn("term_hash", pmod(polyHash(col("tok")),
        lit(numFeatures.toLong)))
    val tf = terms.groupBy(col(idCol), col("term_hash"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy("term_hash")
      .agg(count(lit(1)).as("df")) // tf is already 1 row per (doc, bucket)
    val m = df.agg(count(lit(1)).as("m"))
    tf.join(docFreq, Seq("term_hash"))
      // df-cap applied HERE so consumers (sparseDotTopK) don't pay a
      // second corpus-wide df aggregate to rebuild what this join knows
      .filter(col("df") <= maxDf)
      .crossJoin(broadcast(m))
      .withColumn("w", round(col("tf") *
        log((col("m") + 1).cast("double") / (col("df") + 1)), 6))
      .select(col(idCol), col("term_hash"), col("tf"), col("w"))
  }

  /** Tokens → integer ids against a corpus-derived vocabulary — the
    * encoding step after [[vocabCoverage]]-style induction: the vocab is
    * the `vocabSize` most frequent tokens (freq desc, token asc; id =
    * rank), everything else maps to `unkId`. Returns exploded
    * (id, pos, token_id) rows.
    *
    * Scale shape: the vocab is induced with one token hash-agg +
    * TakeOrdered (vocab ≪ corpus) and BROADCAST back — the corpus-sized
    * token stream never shuffles to get its ids; the rank window runs
    * over vocabSize rows only. Positions index the FILTERED token list
    * (empties dropped before posexplode), mirrored in the oracle. */
  def vocabEncode(df: DataFrame, idCol: String, textCol: String,
      vocabSize: Int, unkId: Int = -1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Seq(col("n").desc, col("tok").asc)
    val vocab = df
      .select(explode_outer(filter(tokens(col(textCol)),
          w => length(w) > 0)).as("tok"))
      .filter(col("tok").isNotNull)
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(ord: _*).limit(vocabSize)
      .withColumn("token_id", row_number().over(Window.orderBy(ord: _*)))
      .select("tok", "token_id")
    df.select(col(idCol),
        posexplode_outer(filter(tokens(col(textCol)),
          w => length(w) > 0)).as(Seq("pos", "tok")))
      .filter(col("tok").isNotNull)
      .join(broadcast(vocab), Seq("tok"), "left")
      .select(col(idCol), col("pos"),
        coalesce(col("token_id"), lit(unkId)).as("token_id"))
  }

  /** Sparse dot-product similarity join over TF-IDF weights — the
    * "more-like-this" retrieval primitive: sim(a,b) = Σ w_a(t)·w_b(t)
    * over shared terms, computed RELATIONALLY (inverted-index join on the
    * term, never a dense |docs|² pass). The df-cap bounds the per-term
    * join fan-out exactly as in [[graft.ext.Dedup.jaccardPairs]] —
    * dropping ubiquitous terms is the sparse-similarity analogue of
    * stopword removal and is mirrored in the oracle.
    *
    * Scale shape: postings shuffle on the term once; pair partial sums
    * are 9-dp decimals (add-order independent, the bm25 contract); the
    * global top-k goes through TakeOrdered, not a full sort. */
  def sparseDotTopK(df: DataFrame, idCol: String, textCol: String,
      numFeatures: Int, maxDf: Int, k: Int): DataFrame = {
    val p = tfidfRelational(df, idCol, textCol, numFeatures, maxDf)
      .select(col(idCol).as("pid"), col("term_hash"), col("w"))
      .localCheckpoint(eager = true)
    p.as("a").join(p.as("b"),
        col("a.term_hash") === col("b.term_hash") &&
        col("a.pid") < col("b.pid"))
      .groupBy(col("a.pid").as("id_a"), col("b.pid").as("id_b"))
      .agg(round(sum(round(col("a.w") * col("b.w"), 9)
          .cast("decimal(28,9)")).cast("double"), 6).as("dot"))
      .orderBy(col("dot").desc, col("id_a"), col("id_b"))
      .limit(k)
  }

  /** Language-ID heuristic: marker-stopword hit counts per language,
    * argmax with deterministic tie-break on language code order.
    * (The fixture `documents.text` is synthetic English-ish for every
    * `lang`, so this demonstrates the operator shape, not model quality.) */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "la", "los", "que", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("de", "shi", "le", "wo", "ni"))

  def langScores(c: Column): Seq[(String, Column)] =
    langMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      lang -> size(filter(tokens(c), w => w.isin(markers: _*)))
    }

  /** Predicted language = first language (code order) achieving the max
    * marker count; "und" (undetermined) when all scores are 0. */
  def langId(c: Column): Column = {
    val scores = langScores(c)
    langIdFromScores(scores.map { case (l, s) => l -> s })
  }

  private def langIdFromScores(scores: Seq[(String, Column)]): Column = {
    val maxScore = greatest(scores.map(_._2): _*)
    val firstMax = scores.foldLeft(lit(null).cast("string")) {
      case (acc, (lang, s)) =>
        when(acc.isNotNull, acc).when(s === maxScore, lang).otherwise(acc)
    }
    when(maxScore === 0, "und").otherwise(firstMax)
  }

  /** Scale form of language-ID over a whole frame: ONE explode + ONE
    * hash-aggregate computes all marker counts (the pure-Column [[langId]]
    * re-derives the token array once per language score after Catalyst's
    * project collapsing — fine for a row, wasteful for a corpus).
    * Appends `lang_pred`, preserving `keep` columns. */
  def withLangId(df: DataFrame, textCol: String, idCol: String,
      keep: Seq[String]): DataFrame = {
    val langs = langMarkers.toSeq.sortBy(_._1)
    // explode_outer keeps null-text docs (explode would drop them); their
    // single null token makes every score NULL (sum over all-null group),
    // so lang_pred degrades to null exactly like the per-row langId()
    val exploded = df.select(
      (col(idCol) +: keep.map(col)) :+
        explode_outer(tokens(col(textCol))).as("tok"): _*)
    val aggCols = langs.map { case (l, m) =>
      sum(when(col("tok").isNull, lit(null).cast("long"))
        .otherwise(when(col("tok").isin(m: _*), 1L).otherwise(0L)))
        .as(s"score_$l")
    }
    val scored = exploded.groupBy(col(idCol) +: keep.map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
    scored.withColumn("lang_pred",
      langIdFromScores(langs.map { case (l, _) => l -> col(s"score_$l") }))
  }

  /** BM25 relevance of every document against a fixed query-term list
    * (Robertson/Spärck Jones — the classic retrieval scorer; public
    * formula, `ln((N−df+0.5)/(df+0.5)+1)` idf as in Lucene). Together
    * with [[graft.ext.PipelineOps.chunkTokens]] and the ANN family this
    * completes the RAG indexing loop: chunk → score/retrieve.
    *
    * Scale shape: term frequencies for QUERY TERMS ONLY leave the scan
    * (`isin` literal filter map-side, like q90's recount), so the big
    * shuffles carry |docs with a query term| rows, never the corpus's
    * token stream; doc lengths are one count per doc; N and avgdl are a
    * broadcast single row. Per-term scores are summed as 9-dp decimals —
    * order-independent, so the result is partitioning-stable and
    * oracle-checkable (the double math itself is deterministic; only the
    * final SUM would otherwise depend on add order). */
  def bm25Scores(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75)
      : DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val toks = df.select(col(idCol).as("did"),
        explode_outer(filter(tokens(col(textCol)),
          w => length(w) > 0)).as("tok"))
      .filter(col("tok").isNotNull)
    val dl = toks.groupBy("did").agg(count(lit(1)).as("dl"))
    val corpus = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = toks.filter(col("tok").isin(queryTerms: _*))
      .groupBy("did", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "tok")
      .join(dl, "did")
      .crossJoin(broadcast(corpus))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("s",
        col("idf") * col("tf") * (k1 + 1.0) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("did").as(idCol))
      .agg(round(sum(round(col("s"), 9).cast("decimal(28,9)"))
        .cast("double"), 6).as("bm25"))
  }

  /** Tokenizer-vocabulary coverage: the `topK` most frequent corpus tokens
    * with each token's cumulative share of ALL token occurrences — the
    * standard diagnostic when sizing a tokenizer vocabulary ("how much of
    * the corpus do the top V entries cover?").
    *
    * Scale shape: one hash-agg shuffle on the token (vocab-sized, ≪
    * corpus), a TakeOrderedAndProject for the top-K, and the running share
    * is a window over only those K rows (single partition of K rows —
    * intentional and bounded; the corpus-sized token stream never sorts).
    * The denominator is a broadcast scalar. */
  def vocabCoverage(df: DataFrame, textCol: String, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freq = df
      .select(explode_outer(filter(tokens(col(textCol)),
          w => length(w) > 0)).as("tok"))
      .filter(col("tok").isNotNull)
      .groupBy("tok").agg(count(lit(1)).as("n"))
    val total = freq.agg(sum(col("n")).as("n_total"))
    val ord = Seq(col("n").desc, col("tok").asc)
    freq.orderBy(ord: _*).limit(topK)
      .crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(Window.orderBy(ord: _*)))
      .withColumn("cum_share",
        round(sum(col("n")).over(Window.orderBy(ord: _*)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double") / col("n_total"), 6))
      .select("rank", "tok", "n", "cum_share")
  }

  /** Per-document bigram list ("tok1 tok2" strings) — `zip_with` over the
    * token array and its shift-by-one, no shuffle, no per-doc window.
    *
    * zip_with (not indexed transform + element_at) is load-bearing: a
    * lambda body re-evaluates its subexpressions PER ELEMENT, and
    * Catalyst's InferFiltersFromGenerate clones the whole generator
    * expression into a pre-explode filter — an `element_at(split(text),
    * i)` formulation therefore re-tokenizes the document for every bigram
    * (O(len²) per row; measured ~4× on the corpus bench). zip_with's
    * lambda touches only its element arguments, so every evaluation site
    * stays O(len). */
  def bigrams(c: Column): Column = {
    val toks = filter(tokens(c), w => length(w) > 0)
    val n1 = greatest(size(toks) - 1, lit(0))
    zip_with(slice(toks, lit(1), n1), slice(toks, lit(2), n1),
      (a, b) => concat_ws(" ", a, b))
  }

  /** Corpus-driven stopword discovery: tokens whose document frequency
    * exceeds `minDocFrac` of the corpus — the data-derived replacement
    * for a hand-curated stopword list (and the df side of the q31 df-cap
    * argument made first-class). Distinct (doc, token) → token df →
    * threshold against the broadcast corpus size; the shuffle output is
    * vocab-sized. */
  def stopwordDiscovery(df: DataFrame, idCol: String, textCol: String,
      minDocFrac: Double): DataFrame = {
    val docTok = df.select(col(idCol).as("did"),
        explode_outer(array_distinct(
          filter(tokens(col(textCol)), w => length(w) > 0))).as("tok"))
      .filter(col("tok").isNotNull)
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    docTok.groupBy("tok").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .withColumn("df_frac",
        round(col("df").cast("double") / col("n_docs"), 6))
      .filter(col("df_frac") >= minDocFrac)
      .select("tok", "df", "df_frac")
  }

  /** Canonical text form for normalization-aware dedup: lowercase,
    * strip everything outside [a-z0-9 space], collapse whitespace runs,
    * trim — pure codegen string ops, scan-speed. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  /** Per-document unigram entropy H = −Σ p·ln p over the doc's token
    * distribution — the repetition/diversity quality signal (template
    * spam and boilerplate sit near 0; varied prose near ln(n_tok)).
    *
    * Scale shape: explode → (doc, token) count → per-doc total → one
    * more per-doc agg; every shuffle is keyed on the doc id, partial
    * aggregation carries the token stream. Per-term contributions are
    * rounded to 9 dp and summed as exact decimals so the result is
    * add-order independent (the bm25 contract). */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val toks = df.select(col(idCol).as("did"),
        explode_outer(filter(tokens(col(textCol)),
          w => length(w) > 0)).as("tok"))
      .filter(col("tok").isNotNull)
    val cnt = toks.groupBy("did", "tok").agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy("did").agg(sum(col("c")).as("n"))
    cnt.join(tot, "did")
      .withColumn("term",
        (col("c") / col("n")) * log(col("n") / col("c")))
      .groupBy(col("did").as(idCol))
      .agg(max(col("n")).as("n_tok"),
        round(sum(round(col("term"), 9).cast("decimal(28,9)"))
          .cast("double"), 6).as("entropy"))
  }

  /** Corpus unigram-LM negative log-likelihood per token — the classic
    * perplexity-style quality signal (high ⇒ unusual token mix), in its
    * relational form: an add-one-smoothed unigram model
    * p(t) = (c_t + 1)/(C + V) fitted on the corpus itself, then per doc
    * nll = Σ −ln p(t_i) / n (nats/token; 2^·/e^· perplexity is a
    * monotone function of it, so filtering thresholds translate).
    *
    * Determinism contract: per-token terms round to 9 dp and sum as
    * exact decimals (the [[tokenEntropy]] discipline), so the score is
    * partitioning-stable and SQL-oracle-replicable.
    *
    * Scale shape: ONE token hash-agg builds the model (V rows — MBs even
    * at corpus scale), which broadcasts back over the token stream; the
    * corpus never shuffles on the token (the vocab-encode discipline);
    * the per-doc score is one hash-agg on the id. Tokenization runs
    * twice (model pass + scoring pass) by choice: it is a scan-speed
    * projection, and re-running it beats materializing the exploded
    * token stream. */
  def unigramNll(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val toks = df.select(col(idCol).as("did"),
        explode_outer(filter(tokens(col(textCol)),
          w => length(w) > 0)).as("tok"))
      .filter(col("tok").isNotNull)
    // checkpoint the MODEL, not the token stream: counts are consumed
    // twice (the totals aggregate and the scoring join)
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = true)
    val model = counts.crossJoin(broadcast(
        counts.agg(sum(col("c")).as("ctot"), count(lit(1)).as("v"))))
      .select(col("tok"),
        ((col("c") + 1).cast("double") / (col("ctot") + col("v")))
          .as("p"))
    toks.join(broadcast(model), Seq("tok"))
      .select(col("did"), round(-log(col("p")), 9).as("nll"))
      .groupBy("did")
      .agg(count(lit(1)).as("n_tok"),
        round(sum(col("nll").cast("decimal(28,9)")).cast("double") /
          count(lit(1)), 6).as("nll_per_tok"))
      .select(col("did").as(idCol), col("n_tok"), col("nll_per_tok"))
  }

  /** Per-source corpus drift: KL(source ‖ corpus) between add-one-smoothed
    * unigram distributions over the shared corpus vocabulary — the
    * distribution-shift monitor a training-data pipeline runs when a new
    * crawl/source lands (large KL = the source's token mix diverges from
    * the corpus it's joining).
    *
    * p_s(tok) = (c_s+1)/(tot_s+V), q(tok) = (c+1)/(tot+V); KL is summed
    * over the FULL vocabulary (tokens absent in a source contribute their
    * smoothed mass), so the expansion frame is |vocab| × |sources| rows —
    * distributed, never collected; per-source totals are a broadcast-sized
    * dimension. Terms are rounded to 9 dp and summed as decimals (the
    * [[unigramNll]] determinism contract), making the double-precision
    * `ln` cross-engine stable. Shuffles: corpus counts, per-(source, tok)
    * counts, and the vocab×sources expansion join — all on token or
    * (source, token) keys; no driver loops.
    *
    * Returns (source, n_tok, kl_nats) — n_tok = source token count. */
  def sourceDrift(df: DataFrame, sourceCol: String, textCol: String)
      : DataFrame = {
    val toks = df.select(col(sourceCol).as("src"),
        explode_outer(filter(tokens(col(textCol)),
          w => length(w) > 0)).as("tok"))
      .filter(col("tok").isNotNull)
    // corpus model: consumed by the totals agg and the expansion join
    val corpus = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = true)
    val corpusTot = corpus.agg(sum(col("c")).as("ctot"),
      count(lit(1)).as("v"))
    val perSource = toks.groupBy("src", "tok").agg(count(lit(1)).as("cs"))
    val sources = perSource.groupBy("src").agg(sum(col("cs")).as("stot"))
    val expanded = corpus.crossJoin(broadcast(sources))
      .join(perSource, Seq("src", "tok"), "left")
      .na.fill(0L, Seq("cs"))
      .crossJoin(broadcast(corpusTot))
    val p = (col("cs") + 1).cast("double") / (col("stot") + col("v"))
    val q = (col("c") + 1).cast("double") / (col("ctot") + col("v"))
    expanded
      .select(col("src"), col("stot"), round(p * log(p / q), 9).as("term"))
      .groupBy("src", "stot")
      .agg(round(sum(col("term").cast("decimal(28,9)")).cast("double"), 6)
        .as("kl_nats"))
      .select(col("src").as(sourceCol), col("stot").as("n_tok"),
        col("kl_nats"))
  }

  /** Bigram-LM document scoring — the conditional upgrade of
    * [[unigramNll]]: add-one-smoothed p(w₂|w₁) = (c₁₂+1)/(c₁+V) with
    * c₁₂ = corpus bigram count, c₁ = occurrences of w₁ as a left
    * context, V = corpus vocabulary; per doc (≥ 2 tokens),
    * nll = Σ −ln p(w₂|w₁) / n_bigrams. Same 9-dp decimal-sum
    * determinism contract as [[unigramNll]]/[[tokenEntropy]].
    *
    * Scale shape: the model is |distinct bigrams| rows — usually too big
    * to broadcast at corpus scale, so scoring is an equi-join on
    * (w₁, w₂): the bigram stream shuffles ONCE on the pair key (Catalyst
    * picks broadcast when stats allow); the left-context and vocab
    * tables derive from the model without re-scanning the corpus. */
  def bigramNll(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val toks = filter(tokens(col(textCol)), w => length(w) > 0)
    val n1 = greatest(size(toks) - 1, lit(0))
    val prs = zip_with(slice(toks, lit(1), n1), slice(toks, lit(2), n1),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    val pairs = df.select(col(idCol).as("did"),
        explode_outer(prs).as("pr"))
      .filter(col("pr").isNotNull)
      .select(col("did"), col("pr.w1").as("w1"), col("pr.w2").as("w2"))
    val big = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .localCheckpoint(eager = true) // consumed twice: contexts + join
    val left = big.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val vocab = df.select(explode_outer(toks).as("tok")).agg(
      countDistinct(col("tok")).as("v")) // countDistinct skips nulls
    val model = big.join(left, "w1").crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"),
        ((col("c12") + 1).cast("double") / (col("c1") + col("v")))
          .as("p"))
    pairs.join(model, Seq("w1", "w2"))
      .select(col("did"), round(-log(col("p")), 9).as("nll"))
      .groupBy("did")
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("nll").cast("decimal(28,9)")).cast("double") /
          count(lit(1)), 6).as("nll_per_bigram"))
      .select(col("did").as(idCol), col("n_bigrams"),
        col("nll_per_bigram"))
  }

  /** Document-level PMI co-occurrence: for token pairs from a bounded
    * vocabulary, pmi(a,b) = ln( P(a,b) / (P(a)·P(b)) ) with probabilities
    * over documents (df / N, co-occurrence = both present) — the
    * collocation / topic-association signal.
    *
    * The vocabulary is the quadratic-blowup guard: tokens with df ≥
    * `minDf`, capped at the `vocabTop` highest-df (ties broken by token
    * for determinism). Per doc, pair generation is over its vocab HITS
    * only — ≤ C(vocabTop, 2) pairs worst case, map-side after the one
    * doc-keyed shuffle (sorted hit array → index-pair transform; no
    * self-join, no second shuffle of the corpus). The vocab broadcasts;
    * doc count is a broadcast 1-row cross join, not a collect. */
  def pmiPairs(df: DataFrame, idCol: String, textCol: String,
      minDf: Long, vocabTop: Int, minCo: Long): DataFrame = {
    val toks = df.select(col(idCol).as("pid"),
        explode_outer(array_distinct(tokens(col(textCol)))).as("tok"))
      .filter(col("tok").isNotNull)
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("df_t"))
      .filter(col("df_t") >= minDf)
      .orderBy(col("df_t").desc, col("tok")).limit(vocabTop)
    val nDocs = df.select(count(lit(1)).as("n_docs"))
    val hits = toks.join(broadcast(vocab), "tok")
      .groupBy("pid")
      .agg(sort_array(collect_list(struct(col("tok"), col("df_t"))))
        .as("vs"))
      .filter(size(col("vs")) >= 2)
    val pairs = hits.select(explode_outer(flatten(
        transform(sequence(lit(0), size(col("vs")) - 2), i =>
          transform(sequence(i + 1, size(col("vs")) - 1), j =>
            struct(element_at(col("vs"), i + 1).as("a"),
              element_at(col("vs"), j + 1).as("b")))))).as("p"))
      .filter(col("p").isNotNull)
    pairs
      .groupBy(col("p.a.tok").as("tok_a"), col("p.b.tok").as("tok_b"),
        col("p.a.df_t").as("df_a"), col("p.b.df_t").as("df_b"))
      .agg(count(lit(1)).as("co"))
      .filter(col("co") >= minCo)
      .crossJoin(broadcast(nDocs))
      .select(col("tok_a"), col("tok_b"), col("co"),
        round(log(col("co").cast("double") * col("n_docs") /
          (col("df_a").cast("double") * col("df_b"))), 6).as("pmi"))
  }

  /** Dunning log-likelihood-ratio collocations (Dunning 1993) over the
    * corpus's ADJACENT-bigram stream — the statistically principled
    * complement to PMI ([[pmiPairs]]): PMI over-rewards rare pairs (two
    * hapaxes co-occurring once score maximally); LLR weighs the evidence
    * by the counts, so high scores need both association AND support —
    * the standard collocation / multiword-expression miner for building
    * tokenizer merge candidates and phrase vocabularies.
    *
    * 2×2 contingency per bigram (a,b) over the N-bigram event space:
    * k11 = c(ab), k12 = c(a·)−c(ab), k21 = c(·b)−c(ab),
    * k22 = N−c(a·)−c(·b)+c(ab);
    * LLR = 2·(Σ xlx(k) − xlx(row sums) − xlx(col sums) + xlx(N)),
    * xlx(x) = x·ln(x), xlx(0) = 0.
    *
    * Scale shape: one bigram explode + hash-agg (the corpus's only
    * shuffle); the marginals c(a·)/c(·b) re-aggregate the |vocab²|-bounded
    * bigram-count frame (never the corpus) and broadcast back. Every k is
    * an exact long; LLR rounds at 6 dp from scalar arithmetic (no
    * accumulation), ties break on the words — fully oracle-replicable. */
  def llrCollocations(df: DataFrame, textCol: String, minCo: Long,
      topK: Int): DataFrame = {
    val bg = df.select(explode_outer(bigrams(col(textCol))).as("bg"))
      .select(split(col("bg"), " ").getItem(0).as("w1"),
        split(col("bg"), " ").getItem(1).as("w2"))
      .filter(length(col("w1")) > 0 && length(col("w2")) > 0)
    val cnt = bg.groupBy("w1", "w2").agg(count(lit(1)).as("k11"))
      .localCheckpoint(eager = false) // marginals + totals + final join
    val left = cnt.groupBy("w1").agg(sum(col("k11")).as("ca"))
    val right = cnt.groupBy("w2").agg(sum(col("k11")).as("cb"))
    val tot = cnt.agg(sum(col("k11")).as("nn"))
    def xlx(c: Column): Column =
      when(c > 0, c.cast("double") * log(c.cast("double"))).otherwise(0.0)
    cnt.filter(col("k11") >= minCo)
      .join(broadcast(left), "w1")
      .join(broadcast(right), "w2")
      .crossJoin(broadcast(tot))
      .withColumn("k12", col("ca") - col("k11"))
      .withColumn("k21", col("cb") - col("k11"))
      .withColumn("k22", col("nn") - col("ca") - col("cb") + col("k11"))
      .select(col("w1"), col("w2"), col("k11").as("co"),
        col("ca"), col("cb"),
        round(lit(2.0) * (xlx(col("k11")) + xlx(col("k12")) +
          xlx(col("k21")) + xlx(col("k22")) -
          xlx(col("ca")) - xlx(col("nn") - col("ca")) -
          xlx(col("cb")) - xlx(col("nn") - col("cb")) +
          xlx(col("nn"))), 6).as("llr"))
      .orderBy(col("llr").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Corpus bigram language-model stats: the `topK` most frequent bigrams
    * plus, per bigram, the share of its total occurrences — the raw
    * counts n-gram LM estimation and contamination screens start from.
    * One explode + one hash-agg shuffle; top-K via TakeOrdered. */
  def bigramCounts(df: DataFrame, textCol: String, topK: Int): DataFrame =
    df.select(explode_outer(bigrams(col(textCol))).as("bigram"))
      .filter(col("bigram").isNotNull)
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(topK)

  /** Heaps'-law vocabulary-growth fit: V(n) ≈ K·n^β — walk the corpus
    * in id order accumulating (tokens seen, distinct types seen), then
    * OLS-fit ln V on ln n. β (typically 0.4–0.6 for natural text) is
    * the corpus-health scalar: synthetic/templated data flattens β
    * (vocabulary saturates), boilerplate-free diverse text keeps it
    * high — the single number you trend per ingest batch to catch a
    * degenerate source before training on it. Returns one row:
    * (n_docs, total_tokens, vocab, beta, k, r2).
    *
    * The cumulative walk does NOT sort tokens globally: a type's
    * arrival position is just min(doc id) over its occurrences (one
    * token-keyed agg), per-doc (token count, new-type count) frames
    * aggregate map-side, and the two running sums ride
    * [[EventOps.prefixSums]] — the range-partitioned scan, not a
    * single-partition global window. The ln–ln regression consumes
    * mergeable sufficient stats (6-dp ln rounds, 12-dp product rounds,
    * exact decimal sums — add-order free, oracle-mirrorable). */
  def vocabGrowth(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val tks = docs.select(col(idCol).as("doc"),
        explode_outer(tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
    val pd = tks.groupBy("doc").agg(count(lit(1)).as("n_toks"))
    val fo = tks.groupBy("tok").agg(min(col("doc")).as("doc"))
      .groupBy("doc").agg(count(lit(1)).as("n_new"))
    val perDoc = pd.join(fo, Seq("doc"), "left")
      .select(col("doc"), col("n_toks"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    val cum = EventOps.prefixSums(perDoc, "doc", Seq("n_toks", "n_new"))
    val xy = cum.select(
      round(log(col("cum_n_toks").cast("double")), 6).as("x"),
      round(log(col("cum_n_new").cast("double")), 6).as("y"))
    def p12(a: Column, b: Column) =
      round(a * b, 12).cast("decimal(38,12)")
    val s = xy.agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("x").cast("decimal(28,6)")).cast("double").as("sx"),
      sum(col("y").cast("decimal(28,6)")).cast("double").as("sy"),
      sum(p12(col("x"), col("x"))).cast("double").as("sxx"),
      sum(p12(col("x"), col("y"))).cast("double").as("sxy"),
      sum(p12(col("y"), col("y"))).cast("double").as("syy"))
    val tot = pd.agg(count(lit(1)).as("n_docs"),
      sum(col("n_toks")).as("total_tokens"))
    val voc = tks.agg(countDistinct(col("tok")).as("vocab"))
    val beta = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    val cov = col("n") * col("sxy") - col("sx") * col("sy")
    s.crossJoin(broadcast(tot)).crossJoin(broadcast(voc))
      .select(col("n_docs"), col("total_tokens"), col("vocab"),
        round(beta, 6).as("beta"),
        round(exp((col("sy") - beta * col("sx")) / col("n")), 6)
          .as("k"),
        round(cov * cov /
          ((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy"))), 6)
          .as("r2"))
  }

  /** BPE merge LEARNING — the tokenizer-training step the rest of the
    * text family consumes (token counting, BPE-ish regex splitting and
    * chunking all assume a merges table exists; this builds one). The
    * standard byte-pair-encoding loop (Sennrich et al. 2016): count
    * adjacent symbol pairs across the frequency-weighted word vocab,
    * merge the most frequent pair everywhere (left-to-right greedy),
    * repeat. Returns one row per round: (round, sym_a, sym_b, merged,
    * pair_count) — the learned merge table in priority order.
    *
    * Scale shape: BPE training never touches the corpus after ONE
    * tokenize+count pass — every round runs over the DISTINCT-WORD
    * vocab weighted by frequency (bounded by vocabulary size, not data
    * size). Per round: one pair-count hash-agg over the vocab, a
    * 1-row top-pair frame broadcast back, and the merge applied as a
    * single `aggregate()` array fold per word (no explode, no window,
    * no shuffle for the rewrite). The fold IS left-to-right greedy:
    * append each symbol, but when the accumulator tail is `a` and the
    * incoming symbol is `b`, replace the tail with `ab` — a merged
    * tail can never re-match (`a||b != a` since `b` is nonempty), so
    * overlapping runs pair off 1st/3rd/5th exactly like the reference
    * algorithm, and the DuckDB oracle's run-parity window formulation
    * is provably the same function. Ties break (count desc, sym_a,
    * sym_b) — fully deterministic under any partitioning. Rounds are
    * lazy-checkpointed so round r is one job, not a re-derivation of
    * rounds 0..r−1. `rounds` must stay well under the corpus's pair
    * diversity (an exhausted vocab would yield an empty top-1 frame
    * and zero out later rounds). */
  def bpeMerges(df: DataFrame, textCol: String, rounds: Int)
      : DataFrame =
    bpeTrain(df, textCol, rounds)._1.orderBy("round")

  /** Left-to-right greedy application of ONE merge rule (a, b) → a‖b
    * to a symbol array, as a single `aggregate()` fold: append each
    * symbol, but when the accumulator tail is `a` and the incoming
    * symbol is `b`, replace the tail with `a‖b`. This IS the reference
    * greedy semantics: a merged tail can never re-match (`a‖b ≠ a`
    * since `b` is nonempty), so an overlapping run pairs off at the
    * 1st/3rd/5th positions — PropertiesSpec pins the equivalence
    * against an imperative reference over generated words. */
  def applyMergeFold(syms: Column, a: Column, b: Column): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) => when(
        try_element_at(acc, lit(-1)) === a && s === b,
        concat(slice(acc, lit(1), size(acc) - 1),
          array(concat(a, b))))
        .otherwise(concat(acc, array(s))))

  /** The BPE training loop behind [[bpeMerges]] (merge table) and
    * [[bpeCompression]] (final segmentation): returns (merges frame,
    * final per-word symbol frame (word, freq, syms)). Public so the
    * query layer can materialize BOTH outputs once (the shared-scratch
    * owner pattern — training runs once, the merge table and the
    * compression audit both read it). */
  def bpeTrain(df: DataFrame, textCol: String, rounds: Int)
      : (DataFrame, DataFrame) = {
    require(rounds >= 1, s"need at least one round, got $rounds")
    val vocab = df.select(explode_outer(tokens(col(textCol)))
        .as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
    var syms = vocab
      .select(col("word"), col("freq"), split(col("word"), "").as("syms"))
      .localCheckpoint(eager = false)
    val merged = (0 until rounds).map { r =>
      val pairs = syms.filter(size(col("syms")) >= 2)
        .select(col("freq"), explode_outer(
          transform(sequence(lit(0), size(col("syms")) - 2),
            i => struct(element_at(col("syms"), i + 1).as("a"),
              element_at(col("syms"), i + 2).as("b")))).as("p"))
        .filter(col("p").isNotNull)
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
      val top = pairs
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
        .localCheckpoint(eager = false) // output row + merge application
      syms = syms.crossJoin(broadcast(top))
        .withColumn("syms",
          applyMergeFold(col("syms"), col("a"), col("b")))
        .select("word", "freq", "syms")
        .localCheckpoint(eager = false)
      top.select(lit(r).as("round"), col("a").as("sym_a"),
        col("b").as("sym_b"), concat(col("a"), col("b")).as("merged"),
        col("cnt").as("pair_count"))
    }
    (merged.reduce(_ unionByName _), syms)
  }

  /** BPE ENCODING audit — the serving side of [[bpeMerges]]: after
    * `rounds` learned merges, how well does the tokenizer compress
    * each slice of the corpus? Per group: corpus token count, char
    * total, BPE-token total (each word costs |its final symbol
    * sequence|), and chars-per-BPE-token — the compression dial a
    * tokenizer budget decision actually reads (more merges → fewer,
    * longer tokens → fewer sequence positions per document).
    *
    * Scale shape: training is vocab-bounded ([[bpeTrain]]); encoding
    * never re-segments the corpus either — the corpus contributes one
    * (group, word) count agg, which joins the |vocab|-row final
    * segmentation on the word key (broadcast: a word vocab is KB–MB at
    * any corpus size). Exact long arithmetic throughout. */
  def bpeCompression(df: DataFrame, textCol: String, groupCol: String,
      rounds: Int, segsIn: Option[DataFrame] = None): DataFrame = {
    // segsIn: a materialized (word, freq, syms) frame from [[bpeTrain]]
    // (strings and string arrays round-trip parquet exactly) — when set
    // it replaces the training run entirely (rounds is then unused)
    val segs = segsIn.getOrElse(bpeTrain(df, textCol, rounds)._2)
      .select(col("word"), size(col("syms")).cast("long").as("n_bpe"))
    val perGroup = df.select(col(groupCol),
        explode_outer(tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col(groupCol), col("word"))
      .agg(count(lit(1)).as("n"))
    perGroup.join(broadcast(segs), "word")
      .groupBy(groupCol)
      .agg(sum(col("n")).as("n_tokens"),
        sum(col("n") * length(col("word"))).as("n_chars"),
        sum(col("n") * col("n_bpe")).as("n_bpe_tokens"))
      .withColumn("chars_per_bpe_token",
        round(col("n_chars").cast("double") / col("n_bpe_tokens"), 6))
      .orderBy(groupCol)
  }
}
