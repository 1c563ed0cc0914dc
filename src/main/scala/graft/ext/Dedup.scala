package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for an LLM training-data pipeline
  * (SURVEY.md §7.4): exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design (the point of each variant):
  *  - [[exactDedup]]: one hash-aggregate on the text (or a hash of it) —
  *    the minimum-work exact dedup; shuffle carries (hash, min-id, count).
  *  - [[jaccardPairs]]: inverted-index join on shingle hashes — candidate
  *    generation is |shared shingle| pairs, never the |docs|² cross join.
  *  - [[minhashBandPairs]]: MinHash signatures + LSH banding — candidate
  *    pairs come from band-bucket equality joins, so cost tracks the number
  *    of genuinely similar pairs; the knob (bands × rows) sets the
  *    similarity threshold curve. This is the 100 TB path.
  *  - [[simhash32]] + [[simhashNearDupPairs]]: 30-bit SimHash — near-dup
  *    detection via Hamming distance on a fixed-width fingerprint, with
  *    bit-slice banding for candidate generation (pigeonhole-exact for
  *    Hamming ≤ slices − 1).
  *
  * All hashes are the oracle-replicable polynomial hash ([[TextOps.polyHash]]),
  * so every stage (including the LSH band keys) is checkable against DuckDB.
  */
object Dedup {

  import TextOps.HashPrime

  /** Exact dedup keyed on a column: keep min(doc_id) per distinct value,
    * with the duplicate count (hash-groupBy; `dropDuplicates` semantics
    * plus provenance). */
  def exactDedup(df: DataFrame, key: String, idCol: String): DataFrame =
    df.groupBy(col(key))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dupes"))
      .select(col(idCol), col("n_dupes"))

  /** Distinct word-shingle hashes of size k for a text column —
    * the unit set for Jaccard similarity. */
  def shingleHashes(text: Column, k: Int): Column =
    array_distinct(
      graft.functions.ShingleHash.shingle_hash(TextOps.tokens(text), k))

  /** Guarded k-word shingle strings — the shared construction for the
    * lambda parity form and the MLlib LSH variant. */
  def shingleStrings(text: Column, k: Int): Column = {
    val toks = TextOps.tokens(text)
    // guard: sequence(1, n) with n < 1 would flip to a descending range
    when(size(toks) >= k,
      transform(
        sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
      .otherwise(array())
  }

  /** Lambda form of [[shingleHashes]] (parity testing only). */
  def shingleHashesLambda(text: Column, k: Int): Column =
    array_distinct(
      transform(shingleStrings(text, k), s => TextOps.polyHashLambda(s)))

  /** Exploded (doc_id, shingle hash) posting list. */
  def postings(df: DataFrame, idCol: String, textCol: String, k: Int)
      : DataFrame =
    df.select(col(idCol).as("pid"),
        explode(shingleHashes(col(textCol), k)).as("sh"))

  /** n-gram Jaccard near-duplicate pairs via a grouped inverted index:
    * J(a,b) = |A∩B| / (|A|+|B|−|A∩B|) over distinct k-shingles.
    * Returns (id_a < id_b, jac) with jac ≥ threshold.
    *
    * `maxDf` caps per-shingle document frequency: a shingle appearing in f
    * docs contributes ~f²/2 candidate pairs, so one natural-language hot
    * shingle ("of the …") at corpus scale is the classic quadratic blowup.
    * Shingles with df > maxDf are dropped from the shingle UNIVERSE
    * (numerator AND denominator — the standard df-cap semantics), bounding
    * candidates at |postings|·maxDf/2 pairs. The bound and the semantics
    * are spec-asserted (DedupSpec). */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int, threshold: Double, maxDf: Int = Int.MaxValue): DataFrame = {
    val (sizes, shared) = shingleCandidates(df, idCol, textCol, k, maxDf)
    shared
      .join(sizes.select(col("pid").as("id_a"), col("n_sh").as("n_a")),
        Seq("id_a"))
      .join(sizes.select(col("pid").as("id_b"), col("n_sh").as("n_b")),
        Seq("id_b"))
      .withColumn("jac", col("n_shared").cast("double") /
        (col("n_a") + col("n_b") - col("n_shared")))
      .filter(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"), col("jac"))
      .orderBy("id_a", "id_b")
  }

  /** Shingle-universe sizes and shared-shingle pair counts — the common
    * candidate machinery behind [[jaccardPairs]] (symmetric) and
    * [[containmentPairs]] (directional). Returns
    * (sizes: (pid, n_sh), shared: (id_a < id_b, n_shared)). */
  private def shingleCandidates(df: DataFrame, idCol: String,
      textCol: String, k: Int, maxDf: Int): (DataFrame, DataFrame) = {
    // Capped path (the 100 TB path): ONE shuffle builds the inverted
    // index as grouped posting lists (sh → [pids]); the df-cap is then a
    // size filter on the lists — no separate hot-shingle aggregate, no
    // anti-join — and candidate pairs generate MAP-SIDE from each list
    // instead of re-shuffling both sides of a posting self-join. A list
    // is bounded by maxDf, so per-row aggregation memory is bounded.
    //
    // Uncapped path: collect_list over an unbounded-df shingle would
    // build one in-memory array per hot shingle inside a single
    // aggregation buffer (cannot spill mid-key) — so WITHOUT a cap the
    // classic posting self-join is used instead: same pair set, shuffles
    // and spills row-at-a-time. (Uncapped at corpus scale is quadratic
    // under any strategy — cap for real runs; spec'd in DedupSpec.)
    //
    // localCheckpoint: DataFrame reuse is plan reuse, not computation
    // reuse — without it the shingle+hash pass runs once per consumer
    // (pair generation AND the sizes agg).
    val capped = maxDf != Int.MaxValue
    val (sizes, shared) =
      if (capped) {
        keyCandidates(postings(df, idCol, textCol, k)
          .withColumnRenamed("sh", "key"), maxDf)
      } else {
        val post = postings(df, idCol, textCol, k)
          .localCheckpoint(eager = true)
        val sz = post.groupBy("pid").agg(count(lit(1)).as("n_sh"))
        val sh = post.as("x")
          .join(post.as("y"), col("x.sh") === col("y.sh") &&
            col("x.pid") < col("y.pid"))
          .groupBy(col("x.pid").as("id_a"), col("y.pid").as("id_b"))
          .agg(count(lit(1)).as("n_shared"))
        (sz, sh)
      }
    (sizes, shared)
  }

  /** The df-capped grouped-inverted-index candidate machinery behind
    * [[jaccardPairs]] / [[containmentPairs]] / CDC chunk dedup
    * ([[Multimodal.cdcDedupPairs]]), generalized to ANY (pid, key)
    * posting frame: ONE shuffle builds key → sorted pid lists, the
    * df-cap is a size filter on the lists, and ordered candidate pairs
    * generate MAP-SIDE from each list. Returns
    * (sizes: (pid, n_sh), shared: (id_a < id_b, n_shared)) over the
    * capped key universe (keys with df > maxDf leave numerator AND
    * denominator — standard df-cap semantics, DedupSpec-asserted). */
  def keyCandidates(post: DataFrame, maxDf: Int)
      : (DataFrame, DataFrame) = {
    val grouped = post
      .groupBy("key")
      .agg(sort_array(collect_list(col("pid"))).as("pids"))
      .filter(size(col("pids")) <= maxDf)
      // LAZY: materializes inside the first consumer's job; the
      // second consumer reads the same checkpointed blocks
      .localCheckpoint(eager = false)
    // df=1 keys produce no pairs but DO count toward their doc's
    // key-universe size (the similarity denominator)
    val sz = grouped.select(explode(col("pids")).as("pid"))
      .groupBy("pid").agg(count(lit(1)).as("n_sh"))
    // lists are sorted and per-key pids are distinct, so taking each
    // element against only the elements AFTER it emits every unordered
    // pair exactly once with id_a < id_b built in — Σf(f−1)/2 generated
    // rows, no post-filter
    val sh = grouped.filter(size(col("pids")) >= 2)
      .select(col("pids"), posexplode(col("pids")))
      .select(col("col").as("a"),
        explode(slice(col("pids"), col("pos") + lit(2),
          size(col("pids")))).as("b"))
      .groupBy(col("a").as("id_a"), col("b").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
    (sz, sh)
  }

  /** Corpus-side shingle index for CROSS-RUN incremental dedup
    * ([[incrementalJaccardPairs]]) — the scratch a recrawl pipeline
    * persists between runs: per shingle hash, the corpus document
    * frequency and, for shingles at or under the df-cap, the sorted
    * posting list. Hot shingles (df > maxDf) keep their df row but DROP
    * the list: df only grows, so they can never re-enter the universe —
    * but the df itself must survive, or a later batch couldn't tell
    * "hot in the corpus" from "never seen" (the distinction that keeps
    * incremental == full-recompute). Returns (sh, df_c, cpids).
    *
    * Same one-shuffle grouped-postings build as [[jaccardPairs]]'
    * capped path; at extreme corpus scale the build would pre-filter
    * genuinely pathological shingles with a df count first (two
    * passes) to bound the aggregation buffers — the INDEX shape is
    * unchanged either way, and on disk it buckets by `sh` so every
    * batch join below is the zero-exchange sort-merge shape. */
  def corpusShingleIndex(corpus: DataFrame, idCol: String,
      textCol: String, k: Int, maxDf: Int): DataFrame =
    postings(corpus, idCol, textCol, k)
      .groupBy("sh")
      .agg(sort_array(collect_list(col("pid"))).as("pids"))
      .select(col("sh"), size(col("pids")).cast("long").as("df_c"),
        when(size(col("pids")) <= maxDf, col("pids")).as("cpids"))

  /** Full corpus near-dup pairs FROM the persisted
    * [[corpusShingleIndex]] — the state-only form of [[jaccardPairs]]'
    * capped path and the exact-path sibling of
    * [[minhashBandPairsFromIndex]]: candidates, shared counts and
    * universe sizes all derive from the index's ≤-cap posting lists
    * alone (a hot row's NULL list is exactly the cap filter), so a
    * pipeline holding the index derives its corpus pair set — and from
    * it its cluster table — from state, never rescanning corpus text.
    * Lists are sorted with distinct pids, so map-side
    * each-against-later-elements emits every unordered pair once with
    * id_a < id_b built in. Identical output to
    * `jaccardPairs(corpus, …, k, threshold, maxDf)` for the index's
    * own k/maxDf (DedupSpec equality, hot shingle included). */
  def jaccardPairsFromIndex(index: DataFrame, threshold: Double)
      : DataFrame = {
    val lists = index.filter(col("cpids").isNotNull)
      .select(col("cpids").as("pids"))
      .localCheckpoint(eager = false) // consumed by sizes AND pairs
    val sz = lists.select(explode(col("pids")).as("pid"))
      .groupBy("pid").agg(count(lit(1)).as("n_sh"))
    val sh = lists.filter(size(col("pids")) >= 2)
      .select(col("pids"), posexplode(col("pids")))
      .select(col("col").as("a"),
        explode(slice(col("pids"), col("pos") + lit(2),
          size(col("pids")))).as("b"))
      .groupBy(col("a").as("id_a"), col("b").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
    sh.join(sz.select(col("pid").as("id_a"), col("n_sh").as("n_a")),
        Seq("id_a"))
      .join(sz.select(col("pid").as("id_b"), col("n_sh").as("n_b")),
        Seq("id_b"))
      .withColumn("jac", col("n_shared").cast("double") /
        (col("n_a") + col("n_b") - col("n_shared")))
      .filter(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"), col("jac"))
      .orderBy("id_a", "id_b")
  }

  /** Batch-vs-corpus INCREMENTAL Jaccard near-dup — the recrawl shape
    * every ingestion pipeline runs (corpus scratch + new batch), as
    * opposed to the single-corpus [[jaccardPairs]]: given the persisted
    * [[corpusShingleIndex]] and a NEW batch of documents, produce
    * exactly the full corpus∪batch recompute's qualifying pairs that
    * are INCIDENT TO THE BATCH (batch-batch and batch-corpus), without
    * re-scanning corpus text or re-considering corpus-corpus pairs.
    *
    * The subtle part is the df-cap algebra: the full recompute caps on
    * df over corpus∪batch, so a batch arrival can push a previously
    * in-universe corpus shingle over the cap — removing it from the
    * shared-shingle numerator AND from every corpus document's
    * denominator size. Reproduced exactly here:
    *   - universe = shingles with df_c + df_b ≤ maxDf;
    *   - corpus doc sizes = index-derived baseline MINUS the per-doc
    *     count of newly-hot shingles (df_c ≤ maxDf < df_c + df_b);
    *   - candidates = within-batch pairs + batch×corpus pairs from
    *     surviving shingles' lists (corpus/batch ids are disjoint).
    * Equality with the full recompute filtered to batch-incident pairs
    * is the q238 ORACLE (the oracle IS the full recompute) and a
    * DedupSpec assertion including a constructed cap-crossing case.
    *
    * Scale shape: one shuffle groups batch postings; one sh-keyed
    * full-outer join against the index (zero-exchange SMJ when the
    * index is bucketed by sh); pair generation is map-side from lists
    * bounded by maxDf, so candidates ≤ |batch postings|·maxDf; the
    * size/correction aggregates explode only ≤-cap lists. Total cost
    * is O(batch + incident candidates) — independent of corpus pair
    * structure, which is the point of the incremental form. */
  def incrementalJaccardPairs(index: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, k: Int, threshold: Double,
      maxDf: Int): DataFrame = {
    require(threshold > 0,
      "incremental equality needs threshold > 0 (a qualifying pair " +
        "must share >= 1 surviving shingle)")
    val bPost = postings(batch, idCol, textCol, k)
      .groupBy("sh")
      .agg(sort_array(collect_list(col("pid"))).as("bpids"))
    // merged per-shingle state; consumed by pairs, batch sizes, and the
    // newly-hot corrections — localCheckpoint so the join runs once
    val u = index.join(bPost, Seq("sh"), "full_outer")
      .select(col("sh"),
        coalesce(col("df_c"), lit(0L)).as("df_c"),
        col("cpids"),
        coalesce(size(col("bpids")).cast("long"), lit(0L)).as("df_b"),
        col("bpids"))
      .withColumn("df_u", col("df_c") + col("df_b"))
      .localCheckpoint(eager = false)
    val surviving = u.filter(col("df_u") <= maxDf && col("df_b") >= 1)
    // within-batch pairs: sorted distinct lists, each element against
    // only the elements after it (id_a < id_b built in, no post-filter)
    val bb = surviving.filter(size(col("bpids")) >= 2)
      .select(col("bpids"), posexplode(col("bpids")))
      .select(col("col").as("a"),
        explode(slice(col("bpids"), col("pos") + lit(2),
          size(col("bpids")))).as("b"))
    // batch × corpus pairs: ids are disjoint, order by value
    val bc = surviving.filter(col("df_c") >= 1)
      .select(explode(col("bpids")).as("x"), col("cpids"))
      .select(col("x"), explode(col("cpids")).as("y"))
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
    val shared = bb.unionByName(bc)
      .groupBy(col("a").as("id_a"), col("b").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
    // batch doc sizes over the MERGED universe
    val batchSizes = surviving
      .select(explode(col("bpids")).as("pid"))
      .groupBy("pid").agg(count(lit(1)).as("n_sh"))
    // corpus doc sizes: index baseline minus newly-hot corrections
    val corpusBase = index.filter(col("df_c") <= maxDf)
      .select(explode(col("cpids")).as("pid"))
      .groupBy("pid").agg(count(lit(1)).as("n_sh"))
    val corrections = u.filter(col("df_c") >= 1 &&
        col("df_c") <= maxDf && col("df_u") > maxDf)
      .select(explode(col("cpids")).as("pid"))
      .groupBy("pid").agg(count(lit(1)).as("n_lost"))
    val corpusSizes = corpusBase.join(corrections, Seq("pid"), "left")
      .select(col("pid"),
        (col("n_sh") - coalesce(col("n_lost"), lit(0L))).as("n_sh"))
    val sizes = batchSizes.unionByName(corpusSizes)
    shared
      .join(sizes.select(col("pid").as("id_a"), col("n_sh").as("n_a")),
        Seq("id_a"))
      .join(sizes.select(col("pid").as("id_b"), col("n_sh").as("n_b")),
        Seq("id_b"))
      .withColumn("jac", col("n_shared").cast("double") /
        (col("n_a") + col("n_b") - col("n_shared")))
      .filter(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"), col("jac"))
      .orderBy("id_a", "id_b")
  }

  /** Ingestion-time near-dup FLAGS against the persisted corpus index —
    * the STREAMING twin of [[incrementalJaccardPairs]]: each arriving
    * document is scored against the corpus as a batch of ONE, emitting
    * its qualifying (doc, corpus doc, jac) pairs the moment it lands.
    * Per-doc independence is the deliberate semantic: output does not
    * depend on how the stream happens to micro-batch (micro-batch
    * boundaries are nondeterministic in production), and each doc's
    * pairs equal `incrementalJaccardPairs(index, batch = {doc})` —
    * the df-cap algebra specialized to df_b = 1: a shingle survives iff
    * df_c + 1 ≤ maxDf; a corpus doc's size is its capped baseline minus
    * its shingles the arriving doc pushes over the cap (df_c = maxDf).
    * New-vs-new pairs are NOT this stage's job — they belong to the
    * within-stream dedup ([[graft.streaming.StreamingOps
    * .streamingNearDedup]]) or the next index refresh, exactly as a
    * recrawl pipeline stages them.
    *
    * Plan shape, streaming (one stateless stream-static join + ONE
    * windowed aggregation, append mode — single-stateful): doc shingles
    * LEFT-join the static index (df + capped postings lookup), one
    * groupBy(doc) collects the surviving candidate lists and counts n_a
    * map-side; candidate counts per corpus doc then come from a
    * SORTED-RUNS projection over the flattened candidate array
    * (array_sort + run-length — no second aggregation, which is what
    * keeps the streaming plan single-stateful). State is one group per
    * in-flight doc window — watermark-bounded, and per-doc array work
    * is bounded by that doc's candidate volume.
    *
    * Plan shape, batch (`streaming = false` — the q244/bulk surface):
    * the same join, then TWO relational hash aggregations —
    * (pid, cp) candidate counts and per-doc n_a — instead of the
    * per-row array math: higher-order array functions evaluate
    * interpreted, so at bulk scale (thousands of docs × L ≈
    * |shingles|·maxDf candidates each) the extra shuffle is ~50× faster
    * than the array path (measured at sf0.1: 103 s array vs ~2 s
    * relational). Both paths produce identical rows; StreamingSpec
    * asserts stream == batch == per-doc incrementalJaccardPairs, which
    * pins the two plans against each other. */
  def incrementalFlags(docs: DataFrame, index: DataFrame, idCol: String,
      textCol: String, k: Int, threshold: Double, maxDf: Int,
      streaming: Boolean = false): DataFrame = {
    require(threshold > 0,
      "a qualifying pair must share >= 1 surviving shingle")
    val (counted, nBase) = incrementalCandRows(docs, index, idCol,
      textCol, k, maxDf, streaming)
    val out = counted
      .join(nBase, Seq("cp")) // inner: drops the null-cp presence rows
      .withColumn("jac", col("n_shared").cast("double") /
        (col("n_a") + (col("n_base") - col("n_corr"))
          - col("n_shared")))
      .filter(col("jac") >= threshold)
      .select(least(col("pid"), col("cp")).as("id_a"),
        greatest(col("pid"), col("cp")).as("id_b"), col("jac"))
    if (streaming) out else out.orderBy("id_a", "id_b")
  }

  /** The candidate-scoring core shared by [[incrementalFlags]] and
    * [[assignClusters]]: per (arriving doc, corpus doc) — surviving
    * shared-shingle count `n_shared`, cap-crossing correction `n_corr`,
    * and the doc's universe size `n_a`, plus the static per-corpus-doc
    * baseline `n_base` frame to join against. Streaming rows carry the
    * doc's event-time window as `win` (for chained windowed
    * aggregation) and use a NULL-cp presence row for a doc with no
    * candidates (explode_outer — so an arriving CLEAN doc still reaches
    * the assignment aggregate; the flags path's inner n_base join drops
    * those rows, leaving its output unchanged). */
  private def incrementalCandRows(docs: DataFrame, index: DataFrame,
      idCol: String, textCol: String, k: Int, maxDf: Int,
      streaming: Boolean): (DataFrame, DataFrame) = {
    val tsCols = if (streaming) Seq(col("ts")) else Seq.empty[Column]
    val post = docs.select(tsCols ++ Seq(col(idCol).as("pid"),
      explode_outer(shingleHashes(col(textCol), k)).as("sh")): _*)
    val joined = post.join(index, Seq("sh"), "left")
      .select(tsCols ++ Seq(col("pid"),
        coalesce(col("df_c"), lit(0L)).as("df_c"), col("cpids")): _*)
    // corpus baseline sizes over the capped universe (static, from the
    // index alone — never the corpus text)
    val nBase = index.filter(col("df_c") <= maxDf)
      .select(explode(col("cpids")).as("cp"))
      .groupBy("cp").agg(count(lit(1)).as("n_base"))
    // per-(doc, corpus doc): n_shared (surviving shared shingles) and
    // n_corr (shared shingles the doc pushes over the cap, df_c = cap)
    val counted =
      if (!streaming) {
        // relational path: explode candidate lists, ONE (pid, cp)
        // hash-agg + ONE per-doc n_a agg
        val jj = joined.localCheckpoint(eager = false) // two consumers
        val cand = jj.filter(col("df_c").between(1, maxDf))
          .select(col("pid"), col("df_c"), explode(col("cpids")).as("cp"))
        val perPair = cand.groupBy("pid", "cp")
          .agg(sum(when(col("df_c") <= maxDf - 1, 1L).otherwise(0L))
              .as("n_shared"),
            sum(when(col("df_c") === maxDf, 1L).otherwise(0L))
              .as("n_corr"))
          .filter(col("n_shared") >= 1)
        val na = jj.groupBy("pid")
          .agg(sum(when(col("df_c") <= maxDf - 1, 1L).otherwise(0L))
            .as("n_a"))
        perPair.join(na, Seq("pid"))
      } else {
        // single-stateful path: ONE windowed aggregation, then the
        // per-doc counts come from a sorted-runs projection. get() is
        // 0-based and null-safe out of bounds (no ANSI error at
        // i−1 = −1; a null <> comparison is null, and `i = 0 OR null`
        // is true there)
        val grouped = joined
          .groupBy(window(col("ts"), "1 second"), col("pid"))
          .agg(sum(when(col("df_c") <= maxDf - 1, 1L).otherwise(0L))
              .as("n_a"),
            flatten(collect_list(
              when(col("df_c").between(1, maxDf - 1), col("cpids"))))
              .as("shared_cps"),
            flatten(collect_list(
              when(col("df_c") === maxDf, col("cpids")))).as("hot_cps"))
        val withRuns = grouped
          .withColumn("s", array_sort(col("shared_cps")))
          .withColumn("starts",
            when(size(col("s")) === 0,
              expr("CAST(array() AS array<int>)"))
              .otherwise(expr("filter(sequence(0, size(s) - 1), " +
                "i -> i = 0 OR get(s, i) <> get(s, i - 1))")))
          .withColumn("runs",
            when(size(col("starts")) === 0,
              expr("CAST(array() AS " +
                "array<struct<cp:bigint,n_shared:bigint>>)"))
              .otherwise(expr(
                "transform(sequence(0, size(starts) - 1), " +
                "j -> struct(get(s, get(starts, j)) AS cp, " +
                "CAST(coalesce(get(starts, j + 1), size(s)) " +
                "- get(starts, j) AS BIGINT) AS n_shared))")))
        withRuns
          // explode_outer + the window column: a doc with NO candidate
          // runs keeps a null-cp presence row (assignment needs the doc
          // to reach its aggregate; flags' inner n_base join drops it),
          // and `win` lets assignClusters chain a second windowed agg
          .select(col("window").as("win"), col("pid"), col("n_a"),
            col("hot_cps"), explode_outer(col("runs")).as("r"))
          .select(col("win"), col("pid"), col("n_a"),
            col("r.cp").as("cp"), col("r.n_shared").as("n_shared"),
            // hot corrections: count of this cp among the arriving
            // doc's cap-crossing shingles' lists — hot_cps is tiny
            // (only df_c = maxDf shingles), so a per-row scan is cheap
            size(filter(col("hot_cps"), x => x === col("r.cp")))
              .cast("long").as("n_corr"))
      }
    (counted, nBase)
  }

  /** Ingestion-time CLUSTER ASSIGNMENT — the operational composition of
    * [[incrementalFlags]] with the persisted cluster table (the q243
    * state): each arriving doc gets the cluster id it would receive
    * from [[upsertClusters]] run on ITS OWN qualifying pairs alone —
    * `least(own id, min matched corpus cluster)`, or its own id when
    * clean — the "is this a dup of cluster X" signal a crawler acts on
    * at ingestion, before the next index refresh. Per-doc independence
    * is inherited from the flags semantics (df_b = 1 algebra; doc-doc
    * pairs are the next refresh's job), so output is micro-batch-
    * boundary independent and the batch twin (q249) equals the
    * streaming run row-for-row on watermark-closed docs
    * (StreamingSpec, which also pins assignment == per-doc
    * upsertClusters).
    *
    * Plan shape, streaming: the flags pipeline's single windowed agg,
    * then two STATELESS stream-static joins (n_base, cluster table)
    * and ONE chained windowed min-aggregate (window-of-window) — the
    * arriving doc's presence row (null cp) flows through the left
    * joins so clean docs still emit. Batch: the two flag hash-aggs,
    * the cluster join, one per-doc min-agg, and a left join back to
    * the full doc set (clean docs -> own id). */
  def assignClusters(docs: DataFrame, index: DataFrame,
      clusters: DataFrame, idCol: String, textCol: String, k: Int,
      threshold: Double, maxDf: Int, streaming: Boolean = false)
      : DataFrame = {
    require(threshold > 0,
      "a qualifying pair must share >= 1 surviving shingle")
    val (counted, nBase) = incrementalCandRows(docs, index, idCol,
      textCol, k, maxDf, streaming)
    val cl = clusters.select(col(idCol).as("cp"), col("cluster"))
    val withJac = counted
      .join(nBase, Seq("cp"), if (streaming) "left" else "inner")
      .withColumn("jac", col("n_shared").cast("double") /
        (col("n_a") + (col("n_base") - col("n_corr"))
          - col("n_shared")))
    // batch: apply the threshold BEFORE the cluster join — the failing
    // majority of candidates never probes the cluster table, and the
    // full-doc-set left join below supplies clean docs. Streaming must
    // keep every row: a doc whose every candidate fails the threshold
    // is CLEAN, not absent, and only its (possibly null-cp) rows carry
    // it to the assignment aggregate — so non-qualifying rows keep a
    // null contribution instead of being dropped.
    val scored =
      (if (streaming) withJac
       else withJac.filter(col("jac") >= threshold))
        .join(cl, Seq("cp"), if (streaming) "left" else "inner")
        .withColumn("qc",
          when(col("jac") >= threshold, col("cluster")))
    if (streaming)
      scored
        .groupBy(window(col("win"), "1 second"), col("pid"))
        .agg(min(col("qc")).as("cl"))
        .select(col("pid").as(idCol),
          least(col("pid"), coalesce(col("cl"), col("pid")))
            .as("cluster"))
    else
      docs.select(col(idCol).as("pid")).distinct()
        .join(scored.filter(col("qc").isNotNull)
            .groupBy("pid").agg(min(col("qc")).as("cl")),
          Seq("pid"), "left")
        .select(col("pid").as(idCol),
          least(col("pid"), coalesce(col("cl"), col("pid")))
            .as("cluster"))
        .orderBy(idCol)
  }

  /** Merge a new batch into a persisted [[corpusShingleIndex]] WITHOUT
    * re-scanning corpus text — the maintenance half of the cross-run
    * story ([[incrementalJaccardPairs]] consumes the index, this
    * produces the NEXT run's): dfs add; posting lists concatenate (and
    * re-sort — corpus and batch ids are disjoint but interleave) while
    * the merged df stays ≤ cap, and null out once df > cap — exactly
    * what a fresh build over corpus∪batch would store. A capped row's
    * list is unrecoverable AND never needed: df only grows, so the
    * shingle can never re-enter the universe. Equality with the fresh
    * [[corpusShingleIndex]] over corpus∪batch is the q240 oracle and a
    * DedupSpec assertion.
    *
    * Scale shape: one shuffle groups batch postings; one sh-keyed
    * full-outer join against the index (zero-exchange SMJ when the
    * index is bucketed by sh); the merge itself is a map-side array
    * concat bounded by maxDf. Corpus text is never rescanned — index
    * maintenance costs O(batch), the recrawl requirement. */
  def upsertShingleIndex(index: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, k: Int, maxDf: Int): DataFrame = {
    val bPost = postings(batch, idCol, textCol, k)
      .groupBy("sh")
      .agg(sort_array(collect_list(col("pid"))).as("bpids"))
    // typed empty array: slice of whichever side is present (full-outer
    // guarantees one is), so the merge stays generic over the id type
    def emptyLike = slice(coalesce(col("cpids"), col("bpids")),
      lit(1), lit(0))
    val dfNew = coalesce(col("df_c"), lit(0L)) +
      coalesce(size(col("bpids")).cast("long"), lit(0L))
    index.join(bPost, Seq("sh"), "full_outer")
      .select(col("sh"), dfNew.as("df_c"),
        when(dfNew <= maxDf,
          sort_array(concat(coalesce(col("cpids"), emptyLike),
            coalesce(col("bpids"), emptyLike))))
          .as("cpids"))
  }

  /** Retract deleted documents from a persisted [[corpusShingleIndex]]
    * — [[upsertShingleIndex]]'s inverse, completing the index
    * lifecycle (build / upsert / retract). The takedown request
    * carries the deleted docs (id + text — a deletion always knows
    * what it deletes), so their postings recompute exactly: dfs
    * decrement by each shingle's deleted-member count; ≤-cap posting
    * lists drop the deleted ids; rows whose df reaches 0 vanish —
    * for the ≤-cap half this IS the fresh rebuild over the retained
    * corpus (DedupSpec equality).
    *
    * The honest asymmetry, stated not hidden: a HOT row (df > cap,
    * list dropped at build time) keeps its NULL list even if the
    * deletion cools its df back under the cap — the members are
    * unrecoverable from capped state. Its df still decrements (so
    * later upserts keep exact counts), but the shingle cannot
    * re-enter the candidate universe: the CONSERVATIVE direction
    * (pairs are never fabricated, some newly-eligible pairs are
    * missed until the next full rebuild), the same trade every
    * tombstone-based production index takes, and the q247 oracle pins
    * exactly these semantics — including the never-cools-back rule.
    * CONTRACT: `deletedDocs` ⊆ the corpus the index was built over
    * (foreign deletions would corrupt dfs). Duplicate rows for the
    * same id WITHIN one request are tolerated: the request is deduped
    * by id first, so a doubled row is not a double-decrement (round-9
    * advice). Re-delivery ACROSS calls stays excluded by the
    * ⊆-live-corpus contract above — after call one the doc is no
    * longer in the corpus the index represents — and cannot be made
    * safe from the index alone: hot rows carry NULL lists, so a
    * doc's liveness is not derivable here (unlike [[upsertClusters]],
    * whose anti-join against the persisted table sees every id). A
    * pipeline retrying takedowns must dedupe against its processed-set
    * (e.g. the retained-docs table it maintains anyway).
    *
    * Scale shape: one shuffle groups the deleted postings (O(deleted));
    * one sh-keyed LEFT join against the index (zero-exchange SMJ when
    * the index is bucketed by sh); the list subtraction is a map-side
    * array_except bounded by the cap. Retained corpus text is never
    * rescanned. */
  def retractShingleIndex(index: DataFrame, deletedDocs: DataFrame,
      idCol: String, textCol: String, k: Int, maxDf: Int): DataFrame = {
    // dedupe by id BEFORE postings: a re-delivered takedown row would
    // otherwise double-count in dpids and double-decrement df_c (a row
    // could be dropped by the df_c >= 1 filter while cpids still holds
    // live members). O(deleted) — tiny next to the postings explode.
    val dPost = postings(deletedDocs.dropDuplicates(idCol), idCol,
        textCol, k)
      .groupBy("sh")
      .agg(sort_array(collect_list(col("pid"))).as("dpids"))
    index.join(dPost, Seq("sh"), "left")
      .select(col("sh"),
        (col("df_c") - coalesce(size(col("dpids")).cast("long"),
          lit(0L))).as("df_c"),
        when(col("cpids").isNotNull,
          when(col("dpids").isNull, col("cpids"))
            // per-shingle pids are distinct, so array_except is exact
            // set subtraction and preserves the sorted order
            .otherwise(array_except(col("cpids"), col("dpids"))))
          .as("cpids"))
      .filter(col("df_c") >= 1)
  }

  /** Directional containment near-dup pairs:
    * C(A→B) = |A∩B| / |A| over distinct k-shingles — "how much of A is
    * inside B". The asymmetric counterpart of [[jaccardPairs]]: a short
    * quote, boilerplate block, or subset page scores near 1.0 against
    * its container while its Jaccard stays low (the container's size
    * inflates the union), so containment is the dedup signal that
    * catches swallowed documents. Returns BOTH qualifying directions as
    * (contained_id, container_id, containment ≥ threshold).
    *
    * Same candidate machinery, bounds, and df-cap semantics as
    * [[jaccardPairs]] (the cap redefines the shingle universe for
    * numerator AND denominator); exact over that universe for any
    * threshold > 0, since a qualifying pair shares ≥ 1 surviving
    * shingle. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int, threshold: Double, maxDf: Int = Int.MaxValue): DataFrame = {
    require(threshold > 0, "containment threshold must be positive")
    val (sizes, shared) = shingleCandidates(df, idCol, textCol, k, maxDf)
    val joined = shared
      .join(sizes.select(col("pid").as("id_a"), col("n_sh").as("n_a")),
        Seq("id_a"))
      .join(sizes.select(col("pid").as("id_b"), col("n_sh").as("n_b")),
        Seq("id_b"))
      .localCheckpoint(eager = true) // consumed by both directions
    val ab = joined.select(col("id_a").as("contained_id"),
      col("id_b").as("container_id"),
      (col("n_shared").cast("double") / col("n_a")).as("containment"))
    val ba = joined.select(col("id_b").as("contained_id"),
      col("id_a").as("container_id"),
      (col("n_shared").cast("double") / col("n_b")).as("containment"))
    ab.unionByName(ba).filter(col("containment") >= threshold)
  }

  /** EXACT Jaccard-join via prefix filtering (the third classic
    * set-similarity strategy next to [[jaccardPairs]]'s df-capped inverted
    * index and [[minhashLshPairs]]'s probabilistic banding): sort every
    * doc's shingle set by a GLOBAL rarest-first total order (ascending
    * document frequency, gram as tie-break), and index only each set's
    * first `m − ⌈t·m⌉ + 1` grams. Two sets with J ≥ t must share a gram
    * inside those prefixes (pigeonhole: J ≥ t forces overlap
    * ≥ ⌈t·m⌉ of each side's m grams, so skipping the prefix would leave
    * too few slots) — so joining on prefix grams loses no qualifying
    * pair, and the exact Jaccard verify drops false candidates. No cap,
    * no recall loss, and candidates come from RARE grams only: at t=0.8
    * the index carries ~20% of the posting rows, the rarest-first order
    * making them the lowest-df 20%.
    *
    * Scale shape: one df-aggregate (shuffle on gram), one per-doc
    * sort_array aggregate (shuffle on doc — per-doc state bounded by the
    * doc's token count, the same bound tfidf/chunking rely on), a
    * prefix-gram self-join (shuffle on gram, quadratic only in per-PREFIX-
    * gram frequency — bounded by construction, spec-asserted ≪ the full
    * posting join), and an array_intersect verify against the two sorted
    * sets. */
  def prefixJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int, threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    val sets = df.select(col(idCol).as("pid"),
        shingleHashes(col(textCol), k).as("gs"))
      .filter(size(col("gs")) > 0)
    val dfreq = sets.select(explode(col("gs")).as("g"))
      .groupBy("g").agg(count(lit(1)).as("gdf"))
    // rarest-first total order: (df, gram) structs sort lexicographically
    val ordered = sets.select(col("pid"), explode(col("gs")).as("g"))
      .join(dfreq, "g")
      .groupBy("pid")
      .agg(sort_array(collect_list(struct(col("gdf"), col("g")))).as("sg"))
      .select(col("pid"),
        transform(col("sg"), s => s.getField("g")).as("gs"),
        size(col("sg")).as("m"))
      // ceil over a DOUBLE product can round UP past an exact integer
      // boundary (0.55·20 → 11.000000000000002 → ceil 12), shortening the
      // prefix by one gram and silently dropping a pair whose overlap is
      // exactly t·m — the 1e-9 back-off keeps ceil exact there while never
      // reaching the next-lower integer (t·m is a ratio of doc-sized ints,
      // so true fractional parts are ≫ 1e-9); a too-LONG prefix only adds
      // candidates, never loses one
      .withColumn("plen",
        col("m") - ceil(col("m") * threshold - lit(1e-9)).cast("int") + 1)
      .localCheckpoint(eager = true) // consumed 4×: both join sides, twice
    val prefixes = ordered.select(col("pid"),
      explode(slice(col("gs"), lit(1), col("plen"))).as("g"))
    val cand = prefixes.select(col("g"), col("pid").as("id_a"))
      .join(prefixes.select(col("g"), col("pid").as("id_b")), Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cand
      .join(ordered.select(col("pid").as("id_a"), col("gs").as("gs_a"),
        col("m").as("m_a")), Seq("id_a"))
      .join(ordered.select(col("pid").as("id_b"), col("gs").as("gs_b"),
        col("m").as("m_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("gs_a"), col("gs_b"))))
      // filter on the UNROUNDED ratio: the pigeonhole guarantee covers
      // true J >= t only — a pair just below t that ROUNDS to t has no
      // prefix-collision guarantee, so a rounded filter could admit it
      // nondeterministically; round for output only (jaccardPairs
      // filters unrounded too, and the oracle mirrors this)
      .withColumn("jac_raw", col("inter").cast("double") /
        (col("m_a") + col("m_b") - col("inter")))
      .filter(col("jac_raw") >= threshold)
      .select(col("id_a"), col("id_b"),
        round(col("jac_raw"), 6).as("jac"))
      .orderBy("id_a", "id_b")
  }

  /** Canonical-document selection per duplicate cluster — the step after
    * [[dupClusters]] in the dedup end-game (pairs → clusters → keep ONE
    * doc per cluster): the representative is the highest-`scoreCol` doc,
    * ties broken by smallest id, picked with a single min-of-struct
    * aggregate ((−score, id) lexicographic) — deterministic under any
    * partitioning, no window, no second shuffle beyond the cluster-key
    * agg. `clusters` is (idCol, cluster) as produced by [[dupClusters]]. */
  def clusterRepresentatives(clusters: DataFrame, docs: DataFrame,
      idCol: String, scoreCol: String): DataFrame =
    clusters.join(docs.select(col(idCol), col(scoreCol)), idCol)
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_docs"),
        max(col(scoreCol)).as("max_score"),
        min(struct((-col(scoreCol)).as("neg"), col(idCol).as("id")))
          .as("__best"))
      .select(col("cluster"), col("__best.id").as("rep_id"),
        col("n_docs"), col("max_score"))

  /** Deterministic MinHash coefficient pairs (a_i, b_i) — fixed constants,
    * identical in the SQL oracle. */
  def minhashCoeffs(numHashes: Int): Seq[(Long, Long)] =
    (0 until numHashes).map { i =>
      ((2 * i + 1).toLong * 769L % HashPrime,
        (i + 1).toLong * 12289L % HashPrime)
    }

  /** MinHash signature columns over an exploded shingle-hash column:
    * sig_i = min over shingle hashes h of (a_i·h + b_i) mod P —
    * expressed as MIN aggregates so one hash-aggregate pass computes the
    * whole signature inside whole-stage codegen (the array-lambda form
    * `array_min(transform(...))` evaluates interpreted AND gets duplicated
    * by Catalyst's project collapsing, one copy per signature component). */
  def minhashSigAggs(sh: Column, numHashes: Int): Seq[Column] =
    minhashCoeffs(numHashes).zipWithIndex.map { case ((a, b), i) =>
      min((sh * a + b) % HashPrime).as(s"mh_$i")
    }

  /** Array-lambda signature over a shingle array (parity testing only). */
  def minhashSignature(shingles: Column, numHashes: Int): Seq[Column] =
    minhashCoeffs(numHashes).zipWithIndex.map { case ((a, b), i) =>
      array_min(transform(shingles, h => (h * a + b) % HashPrime))
        .as(s"mh_$i")
    }

  /** LSH candidate pairs from banded MinHash signatures: docs sharing any
    * band (of `rowsPerBand` consecutive signature components) are
    * candidates; each candidate pair is then verified with exact Jaccard.
    * bands = numHashes / rowsPerBand.
    *
    * Plan shape (all relational, all codegen):
    *   postings → [hash-agg] signatures + set sizes
    *            → explode bands → [self-join on band key] candidates
    *            → [join postings ×2 + hash-agg] shared-shingle counts
    *            → jaccard filter.
    * Postings are materialized once (localCheckpoint) so the shingle-hash
    * pass runs exactly once despite its four consumers. */
  def minhashBandPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int, numHashes: Int, rowsPerBand: Int, threshold: Double)
      : DataFrame = {
    val post = postings(df, idCol, textCol, k)
      .localCheckpoint(eager = false) // first consumer's job materializes
    val sigs = post.groupBy("pid")
      .agg(count(lit(1)).as("n_sh"),
        minhashSigAggs(col("sh"), numHashes): _*)
    val banded = bandKeys(sigs, numHashes, rowsPerBand)
    val cands = banded.as("x")
      .join(banded.as("y"),
        col("x.bk") === col("y.bk") && col("x.pid") < col("y.pid"))
      .select(col("x.pid").as("id_a"), col("y.pid").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    exactJaccardVerify(cands, post,
      sigs.select(col("pid"), col("n_sh")), threshold)
  }

  /** Exact-Jaccard verification of an (id_a < id_b) candidate pair set
    * against a posting frame (pid, sh) and set sizes (pid, n_sh) — the
    * shared tail of [[minhashBandPairs]], [[minhashBandPairsFromIndex]]
    * and [[incrementalMinhashPairs]]: shared-shingle counts via two
    * posting joins + one hash-agg, then the Jaccard filter. Pairs with
    * zero shared shingles never reach the output — the incremental /
    * from-index callers `require` threshold > 0 to make that contract
    * explicit; for [[minhashBandPairs]] the behavior is unchanged from
    * its pre-refactor form (zero-intersection band collisions never
    * surfaced there either, the verify join being inner). */
  private def exactJaccardVerify(cands: DataFrame, post: DataFrame,
      sizes: DataFrame, threshold: Double): DataFrame = {
    val shared = cands
      .join(post.select(col("pid").as("id_a"), col("sh").as("sh_a")),
        Seq("id_a"))
      .join(post.select(col("pid").as("pid_b"), col("sh").as("sh_b")),
        col("id_b") === col("pid_b") && col("sh_a") === col("sh_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.select(col("pid").as("id_a"), col("n_sh").as("n_a")),
        Seq("id_a"))
      .join(sizes.select(col("pid").as("id_b"), col("n_sh").as("n_b")),
        Seq("id_b"))
      .withColumn("jac", col("n_shared").cast("double") /
        (col("n_a") + col("n_b") - col("n_shared")))
      .filter(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"), col("jac"))
      .orderBy("id_a", "id_b")
  }

  /** Full corpus near-dup pairs FROM the persisted [[corpusLshIndex]] —
    * the state-only form of [[minhashBandPairs]]: candidate pairs
    * generate MAP-SIDE from each band bucket's sorted pid list (the
    * keyCandidates trick — each element against only the elements
    * after it, id_a < id_b built in), verified against the persisted
    * postings. Corpus TEXT is never rescanned, so a pipeline holding
    * the index (q242's scratch) derives its corpus pair set — and its
    * cluster table (q243) — from state alone: building index + pairs +
    * clusters costs exactly ONE corpus text scan. Same buckets, same
    * verify as minhashBandPairs ⇒ identical output (DedupSpec). */
  def minhashBandPairsFromIndex(bandIndex: DataFrame,
      corpusPost: DataFrame, corpusSizes: DataFrame, threshold: Double)
      : DataFrame = {
    require(threshold > 0,
      "zero-intersection band collisions never reach the verify join")
    val cands = bandIndex.filter(size(col("cpids")) >= 2)
      .select(col("cpids"), posexplode(col("cpids")))
      .select(col("col").as("id_a"),
        explode(slice(col("cpids"), col("pos") + lit(2),
          size(col("cpids")))).as("id_b"))
      .dropDuplicates("id_a", "id_b")
    exactJaccardVerify(cands, corpusPost, corpusSizes, threshold)
  }

  /** Corpus-side LSH scratch for cross-run incremental near-dup on the
    * BANDING (100 TB) path — the three tables a recrawl pipeline
    * persists: band-key index (bk → sorted corpus pids), shingle
    * postings (pid, sh), and set sizes (pid, n_sh). Signatures and band
    * keys are PER-DOC-deterministic, so unlike the df-capped exact path
    * ([[corpusShingleIndex]]/q238) nothing in this scratch shifts when
    * a batch arrives — the incremental decomposition is exact with no
    * correction algebra at all. */
  def corpusLshIndex(corpus: DataFrame, idCol: String, textCol: String,
      k: Int, numHashes: Int, rowsPerBand: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    val post = postings(corpus, idCol, textCol, k)
      .localCheckpoint(eager = false)
    val sigs = post.groupBy("pid")
      .agg(count(lit(1)).as("n_sh"),
        minhashSigAggs(col("sh"), numHashes): _*)
    val bandIndex = bandKeys(sigs, numHashes, rowsPerBand)
      .groupBy("bk")
      .agg(sort_array(collect_list(col("pid"))).as("cpids"))
    (bandIndex, post, sigs.select(col("pid"), col("n_sh")))
  }

  /** Batch-vs-corpus INCREMENTAL MinHash-LSH near-dup — q238's recrawl
    * shape moved to the banding path that actually runs at 100 TB:
    * given the persisted [[corpusLshIndex]] and a NEW batch, produce
    * exactly the full corpus∪batch [[minhashBandPairs]] rows incident
    * to the batch. Because band keys are per-doc-deterministic, the
    * candidate set decomposes EXACTLY into batch-batch band matches
    * plus batch-×-index matches — no cap crossings, no denominators to
    * correct; the exact-Jaccard verify then reads the persisted corpus
    * postings SEMI-JOIN-PRUNED to candidate-incident ids (corpus TEXT
    * is never rescanned, and the postings shuffle scales with the
    * candidate set, not the corpus).
    * Equality with the filtered full recompute is the q242 oracle and
    * a DedupSpec assertion.
    *
    * Id contract: batch and corpus pid spaces must be DISJOINT (a
    * crawl assigns fresh ids; the fixtures' % split models this). A
    * re-crawl that keeps corpus ids must retract the old postings
    * first ([[retractPostingsIndex]] on the band index plus dropping
    * the pid's rows from postings/sizes) — the union below would
    * otherwise double the doc's shingle rows in the verify. The
    * fingerprint sibling ([[incrementalFingerprintPairs]]) implements
    * batch-wins directly because its state is one row per pid; here
    * the persisted state is three tables, so the contract lives with
    * the state owner. */
  def incrementalMinhashPairs(bandIndex: DataFrame, corpusPost: DataFrame,
      corpusSizes: DataFrame, batch: DataFrame, idCol: String,
      textCol: String, k: Int, numHashes: Int, rowsPerBand: Int,
      threshold: Double): DataFrame = {
    require(threshold > 0,
      "incremental equality needs threshold > 0 (a zero-intersection " +
        "band collision survives the full recompute's jac >= 0 filter " +
        "but never reaches this function's shared-shingle join)")
    val bPost = postings(batch, idCol, textCol, k)
      .localCheckpoint(eager = false)
    val bSigs = bPost.groupBy("pid")
      .agg(count(lit(1)).as("n_sh"),
        minhashSigAggs(col("sh"), numHashes): _*)
    val bBand = bandKeys(bSigs, numHashes, rowsPerBand)
      .localCheckpoint(eager = false) // consumed by bb AND bc
    val bb = bBand.as("x")
      .join(bBand.as("y"),
        col("x.bk") === col("y.bk") && col("x.pid") < col("y.pid"))
      .select(col("x.pid").as("id_a"), col("y.pid").as("id_b"))
    val bc = bBand.join(bandIndex, Seq("bk"))
      .select(col("pid").as("bp"), explode(col("cpids")).as("cp"))
      .select(least(col("bp"), col("cp")).as("id_a"),
        greatest(col("bp"), col("cp")).as("id_b"))
    val cands = bb.unionByName(bc).dropDuplicates("id_a", "id_b")
      .localCheckpoint(eager = false) // consumed by candIds AND shared
    // prune the corpus postings to candidate-incident docs BEFORE the
    // shared-shingle join: without this every corpus posting shuffles
    // even when candidates touch few docs; with it the postings volume
    // scales with the candidate set, not the corpus (and when the
    // candidate id set is small AQE turns the semi-join into a
    // broadcast — no corpus shuffle at all)
    val candIds = cands.select(col("id_a").as("pid"))
      .unionByName(cands.select(col("id_b").as("pid")))
      .dropDuplicates("pid")
    val allPost = corpusPost.join(candIds, Seq("pid"), "left_semi")
      .unionByName(bPost)
    val sizes = corpusSizes
      .unionByName(bSigs.select(col("pid"), col("n_sh")))
    exactJaccardVerify(cands, allPost, sizes, threshold)
  }

  /** Blocking-quality audit of the MinHash banding scheme — the
    * measurement you run BEFORE committing a blocker to a 100 TB dedup
    * pass: against a ground-truth pair set `exact` (id_a < id_b — e.g.
    * the df-capped exact Jaccard pairs), report in one row
    *
    *  - `n_docs`, `n_cand` (distinct band-sharing candidate pairs),
    *    `n_exact`, `n_hit` (ground-truth pairs the blocker surfaces);
    *  - `pairs_completeness` = n_hit / n_exact — the blocker's recall
    *    against ground truth (what fraction of true pairs any downstream
    *    verifier can still see);
    *  - `reduction_ratio` = 1 − n_cand / C(n_docs, 2) — the fraction of
    *    the all-pairs quadratic the blocker never generates.
    *
    * The two metrics are the standard record-linkage trade-off axes
    * (completeness ~ OR-amplification recall, reduction ~ its cost);
    * banding parameters are chosen where both stay high. Candidates
    * come from the same [[bandKeys]] fold as [[minhashBandPairs]], so
    * the audit measures EXACTLY the production blocker. Cost: the
    * banding self-join plus two counts and one semi-join on the
    * (small) pair frames; the corpus shuffles once for signatures. */
  def blockingQuality(df: DataFrame, idCol: String, textCol: String,
      exact: DataFrame, k: Int, numHashes: Int, rowsPerBand: Int)
      : DataFrame = {
    val post = postings(df, idCol, textCol, k)
    val sigs = post.groupBy("pid")
      .agg(count(lit(1)).as("n_sh"),
        minhashSigAggs(col("sh"), numHashes): _*)
    val banded = bandKeys(sigs, numHashes, rowsPerBand)
    val cands = banded.as("x")
      .join(banded.as("y"),
        col("x.bk") === col("y.bk") && col("x.pid") < col("y.pid"))
      .select(col("x.pid").as("id_a"), col("y.pid").as("id_b"))
      .dropDuplicates("id_a", "id_b")
      .localCheckpoint(eager = true) // counted + semi-joined
    val ex = exact.select(col("id_a"), col("id_b"))
    val nCand = cands.agg(count(lit(1)).as("n_cand"))
    val nExact = ex.agg(count(lit(1)).as("n_exact"))
    val nHit = ex.join(cands, Seq("id_a", "id_b"), "leftsemi")
      .agg(count(lit(1)).as("n_hit"))
    df.agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(nCand))
      .crossJoin(broadcast(nExact))
      .crossJoin(broadcast(nHit))
      .select(col("n_docs"), col("n_cand"), col("n_exact"), col("n_hit"),
        round(when(col("n_exact") > 0,
          col("n_hit").cast("double") / col("n_exact")).otherwise(1.0), 6)
          .as("pairs_completeness"),
        round(lit(1.0) - col("n_cand").cast("double") /
          (col("n_docs").cast("double") * (col("n_docs") - 1) / 2), 6)
          .as("reduction_ratio"))
  }

  /** B³ (B-cubed) extrinsic cluster quality of a predicted clustering
    * against a ground-truth grouping — THE standard entity-resolution /
    * dedup-cluster metric (Bagga & Baldwin 1998; the one the TAC-KBP
    * evals settled on because pairwise F ignores singletons and purity
    * rewards shattering). Per element e: precision = |C(e) ∩ G(e)| /
    * |C(e)|, recall = |C(e) ∩ G(e)| / |G(e)|; B³P/B³R average those
    * over ALL elements (singletons included — each scores 1.0 unless
    * merged wrongly), F1 is their harmonic mean. Over-merging shows up
    * in precision, over-splitting in recall — the two failure axes of
    * a dedup cascade, separated. `pred` is (id, cluster), `truth` is
    * (id, gid); both must cover the same ids. One row out: (n_docs,
    * n_clusters, n_groups, bcubed_precision, bcubed_recall, bcubed_f1).
    *
    * The element-wise average collapses algebraically to the
    * (cluster, gid) contingency table: every element in cell (c, g)
    * shares precision n_cg/n_c and recall n_cg/n_g, so
    * B³P = Σ n_cg²/n_c / N — the metric costs ONE join + one hash-agg
    * on (cluster, gid) plus two marginal re-aggs of that bounded
    * contingency frame, never a per-element pass. Per-cell
    * contributions round at 12 dp into exact DECIMAL(38,12) sums
    * (add-order free, oracle-mirrorable). */
  def bcubedQuality(pred: DataFrame, truth: DataFrame): DataFrame = {
    val j = pred.select(col("id"), col("cluster"))
      .join(truth.select(col("id"), col("gid")), Seq("id"))
    val cg = j.groupBy("cluster", "gid").agg(count(lit(1)).as("n_cg"))
    val cs = cg.groupBy("cluster").agg(sum(col("n_cg")).as("n_c"))
    val gs = cg.groupBy("gid").agg(sum(col("n_cg")).as("n_g"))
    def contrib(den: Column) =
      sum(round(col("n_cg").cast("double") * col("n_cg") / den, 12)
        .cast("decimal(38,12)")).cast("double")
    val agg = cg.join(cs, "cluster").join(gs, "gid")
      .agg(sum(col("n_cg")).as("n_docs"),
        contrib(col("n_c")).as("sp"), contrib(col("n_g")).as("sr"))
    val nc = pred.agg(countDistinct(col("cluster")).as("n_clusters"))
    val ng = truth.agg(countDistinct(col("gid")).as("n_groups"))
    def p = col("sp") / col("n_docs")
    def r = col("sr") / col("n_docs")
    agg.crossJoin(broadcast(nc)).crossJoin(broadcast(ng))
      .select(col("n_docs"), col("n_clusters"), col("n_groups"),
        round(p, 6).as("bcubed_precision"),
        round(r, 6).as("bcubed_recall"),
        round(lit(2) * p * r / (p + r), 6).as("bcubed_f1"))
  }

  /** Banded MinHash keys from a signature frame (`pid`, `mh_0..mh_{n-1}`):
    * one row per (doc, band) with the band's rolling-combined key packed
    * in a `bk` struct — shared by [[minhashBandPairs]] (self-join on `bk`)
    * and [[cascadeSurvival]] (bucket-min greedy elimination). */
  private[ext] def bandKeys(sigs: DataFrame, numHashes: Int,
      rowsPerBand: Int): DataFrame = {
    val numBands = numHashes / rowsPerBand
    sigs.select(col("pid"),
      explode(array((0 until numBands).map { b =>
        val comps = (0 until rowsPerBand)
          .map(r => col(s"mh_${b * rowsPerBand + r}"))
        struct(lit(b).as("band"),
          comps.reduce((x, y) => (x * 31 + y) % HashPrime).as("bkey"))
      }: _*)).as("bk"))
  }

  /** Greedy keep-first dedup CASCADE — the production curation shape: the
    * cheap exact stage shrinks the corpus before the costlier near-dup
    * stages ever see it. Returns one row per input id with per-stage
    * survival flags:
    *
    *  - `keep_exact`: survives exact dedup on the normalized text
    *    ([[TextOps.normalizeText]]) — keeps the smallest id per identical
    *    normalized form;
    *  - `keep_simhash`: additionally survives identical-[[simhash32]]
    *    elimination among exact survivors;
    *  - `keep_minhash`: additionally survives MinHash band-bucket
    *    elimination among simhash survivors — a doc is eliminated iff it
    *    shares ANY of its `numHashes/rowsPerBand` band keys with any
    *    smaller-id SIMHASH-STAGE survivor (dominance over stage-2
    *    survivors, NOT sequential greedy keep-first: the eliminating doc
    *    may itself be minhash-eliminated by a yet-smaller id. bucketMin/
    *    partnerMin aggregate over all stage-2 banded docs, so every
    *    stage stays one window/aggregate and the whole cascade is
    *    deterministic and oracle-checkable; docs too short to shingle
    *    pass through).
    *
    * Scale shape: each stage is one key-partitioned window or hash-agg
    * over only the PREVIOUS stage's survivors; nothing is all-pairs, and
    * the band bucket-min aggregate bounds stage 3 by |banded postings|. */
  def cascadeSurvival(df: DataFrame, idCol: String, textCol: String,
      k: Int, numHashes: Int, rowsPerBand: Int): DataFrame = {
    val ids = df.select(col(idCol).as("id"), col(textCol).as("text"))
    val w1 = Window.partitionBy(col("__norm"))
    val s1 = ids
      .withColumn("__norm", TextOps.normalizeText(col("text")))
      .withColumn("keep_exact", col("id") === min(col("id")).over(w1))
      .localCheckpoint(eager = false) // feeds stage 2 AND the final join
    val w2 = Window.partitionBy(col("__sim"))
    val s2 = s1.filter(col("keep_exact"))
      .withColumn("__sim", simhash32(col("text")))
      .withColumn("keep_simhash", col("id") === min(col("id")).over(w2))
      .localCheckpoint(eager = false) // feeds stage 3 AND the final join
    val survivors2 = s2.filter(col("keep_simhash"))
      .select(col("id"), col("text"))
    val sigAggs = minhashSigAggs(col("sh"), numHashes)
    val sigs = postings(survivors2, "id", "text", k)
      .groupBy("pid").agg(sigAggs.head, sigAggs.tail: _*)
    val banded = bandKeys(sigs, numHashes, rowsPerBand)
    val bucketMin = banded.groupBy(col("bk"))
      .agg(min(col("pid")).as("bmin"))
    val partnerMin = banded.join(bucketMin, "bk")
      .groupBy(col("pid")).agg(min(col("bmin")).as("pmin"))
    ids.select(col("id"))
      .join(s1.select(col("id"), col("keep_exact")), Seq("id"))
      .join(s2.select(col("id"), col("keep_simhash")), Seq("id"), "left")
      .join(partnerMin.withColumnRenamed("pid", "id"), Seq("id"), "left")
      .select(col("id"),
        col("keep_exact"),
        coalesce(col("keep_simhash"), lit(false)).as("keep_simhash"),
        (coalesce(col("keep_simhash"), lit(false)) &&
          (col("pmin").isNull || col("pmin") >= col("id")))
          .as("keep_minhash"))
  }

  /** spark.ml MinHashLSH variant (SURVEY.md §7.4): shingle strings →
    * binary HashingTF vectors → `MinHashLSH.approxSimilarityJoin`, which
    * prunes candidate pairs via OR-amplified hash tables and returns
    * Jaccard DISTANCE on the hashed sets. Complements [[minhashBandPairs]]
    * (the hand-rolled, oracle-checkable formulation) with the MLlib
    * surface a reference user would reach for first. */
  def minhashLshMl(df: DataFrame, idCol: String, textCol: String,
      k: Int, numHashTables: Int, threshold: Double): DataFrame = {
    import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
    val prepared = df.select(col(idCol).as("pid"),
        array_distinct(shingleStrings(col(textCol), k)).as("shings"))
      .filter(size(col("shings")) > 0)
    val tf = new HashingTF().setInputCol("shings").setOutputCol("v")
      .setNumFeatures(1 << 18).setBinary(true)
    val vectorized = tf.transform(prepared)
    val mh = new MinHashLSH().setInputCol("v").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setSeed(42L)
    val model = mh.fit(vectorized)
    model.approxSimilarityJoin(vectorized, vectorized,
        1.0 - threshold, "dist")
      .filter(col("datasetA.pid") < col("datasetB.pid"))
      .select(col("datasetA.pid").as("id_a"),
        col("datasetB.pid").as("id_b"),
        (lit(1.0) - col("dist")).as("jac_approx"))
      .orderBy("id_a", "id_b")
  }

  /** Duplicate clusters from a near-dup pair list: connected components by
    * iterative min-label propagation over the (symmetrized) edge list —
    * each round joins labels to edges and takes the min neighbor label,
    * until a fixpoint. Rounds ≤ component diameter; every round is one
    * shuffle join + aggregate, so the approach scales to edge lists far
    * beyond driver memory (no union-find on the driver).
    * Returns (doc id, cluster = min doc id of its component); singleton
    * docs keep their own id.
    *
    * Each round combines neighbor-min propagation with POINTER JUMPING
    * (label ← min(label, label(label))): chasing the label's label halves
    * the remaining chain every round, so convergence is O(log diameter)
    * rounds instead of O(diameter) — on an adversarial 100 TB near-dup
    * chain that is ~40 rounds → ~7 (spec-asserted on a path graph). The
    * extra |V|-row self-join per round is noise next to the edge join. */
  def dupClusters(pairs: DataFrame, allIds: DataFrame, idCol: String)
      : DataFrame =
    dupClustersWithRounds(pairs, allIds, idCol)._1

  /** Symmetrize an (id_a, id_b) pair list into a (src, dst) edge list
    * with ONE evaluation of the (possibly expensive) pairs pipeline:
    * union(pairs, pairs.swapped) scans the upstream plan twice when the
    * cache first materializes — explode duplicates each row map-side
    * instead. `dedup` additionally collapses duplicate/self edges (keep
    * it on unless the input is known unique with id_a < id_b — the
    * shared invariant [[dupClusters]] and GraphOps.pageRank rely on). */
  private[graft] def symmetrized(pairs: DataFrame,
      dedup: Boolean = true): DataFrame = {
    val e = pairs
      .select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    if (dedup) e.distinct() else e
  }

  /** [[dupClusters]] + the number of rounds to fixpoint (exposed for the
    * convergence-rate spec). */
  private[ext] def dupClustersWithRounds(pairs: DataFrame,
      allIds: DataFrame, idCol: String): (DataFrame, Int) = {
    val edges = symmetrized(pairs).cache()
    // Iterate ONLY over edge-incident nodes: a node with no near-dup edge
    // is a singleton whose label (its own id) can never change, so keeping
    // it in the propagation frames makes every round's join/checkpoint/
    // count scale with the CORPUS instead of the dup subgraph — at 100 TB
    // that is iterating 100 TB to converge a few-GB component graph. The
    // singletons re-enter once, below, with cluster = own id. (symmetrized
    // emits both directions, so distinct src covers every incident node.)
    // LAZY checkpoint: first consumed inside round 1's convergence-count
    // job (no separate blocking job); the singleton anti-join below then
    // reads the same materialized blocks.
    val nodes = edges.select(col("src").as("id")).distinct()
      .localCheckpoint(eager = false)
    var labels = nodes.select(col("id"), col("id").as("cluster"))
    var cached: DataFrame = null
    var changed = 1L
    var rounds = 0
    try {
    while (changed > 0 && rounds < 50) {
      // mid = min(own label, neighbors' labels) — the propagation step,
      // as ONE join + ONE union-fed aggregate: neighbor labels arrive via
      // the edge join, the node's own label rides the union branch (tag 1
      // marks it so `old` can be recovered in the same agg — exactly one
      // own-label row exists per id), and the min folds both. This shape
      // has one fewer shuffle per round than the textbook
      // join→agg→left-join (the old-label recovery join), and per-round
      // exchanges are the whole cost of the iteration.
      //
      // localCheckpoint, not cache: the jump step references this twice,
      // so a cached-but-uncut lineage would DOUBLE the logical plan every
      // round (exponential tree → OOM in plan handling by round ~8); the
      // checkpoint materializes once AND truncates the plan to a flat
      // scan. LAZY (eager = false): the round's only action is the
      // convergence count below, so the checkpoint materializes inside
      // that job instead of paying a separate blocking job per round —
      // both consumers in the self-join share the one checkpointed RDD.
      // Blocks are freed asynchronously by the ContextCleaner once the
      // round's reference drops.
      val neighborLabels = edges
        .join(labels, edges("dst") === labels("id"))
        .select(col("src").as("id"), col("cluster"), lit(0).as("__own"))
      val prelim = neighborLabels
        .union(labels.select(col("id"), col("cluster"), lit(1).as("__own")))
        .groupBy("id")
        .agg(min(col("cluster")).as("mid"),
          max(when(col("__own") === 1, col("cluster"))).as("old"))
        .localCheckpoint(eager = false)
      // pointer jump: follow mid's own mid. label(v) always names a node
      // in v's component (propagation only ever copies labels along
      // edges), so the jump stays inside the component and labels remain
      // monotonically non-increasing — same fixpoint, reached in
      // logarithmically many rounds.
      val updated = prelim.as("x")
        .join(prelim.select(col("id").as("pid"), col("mid").as("pmid"))
          .as("p"), col("x.mid") === col("p.pid"), "left")
        .select(col("x.id").as("id"),
          least(col("x.mid"), coalesce(col("pmid"), col("x.mid")))
            .as("newc"),
          col("old"))
        .cache()
      // carry (new, old) labels side by side so ONE cached pass both
      // materializes the round and yields the convergence count
      changed = updated.filter(col("newc") =!= col("old")).count()
      if (cached != null) cached.unpersist() // drop the previous iteration
      cached = updated
      labels = updated.select(col("id"), col("newc").as("cluster"))
      rounds += 1
    }
    // never return silently-wrong labels: a component with diameter > cap
    // would still be mid-propagation
    require(changed == 0,
      s"dupClusters did not converge within $rounds rounds " +
        s"($changed labels still changing)")
    // singletons (ids with no incident edge) re-enter with their own id —
    // the anti-join's right side is the small node set, and the corpus id
    // scan is touched exactly once, outside the iteration
    val singletons = allIds.select(col(idCol).as("id"))
      .join(nodes, Seq("id"), "left_anti")
      .select(col("id"), col("id").as("cluster"))
    (labels.select(col("id"), col("cluster")).union(singletons)
      .select(col("id").as(idCol), col("cluster"))
      .orderBy(idCol).localCheckpoint(eager = true), rounds)
    } finally { // caches must not outlive the call, even on failure
      if (cached != null) cached.unpersist()
      edges.unpersist()
    }
  }

  /** Incremental CONNECTED-COMPONENT maintenance — the recrawl
    * end-game on the cluster side. [[incrementalJaccardPairs]] (q238)
    * and [[incrementalMinhashPairs]] (q242) produce the batch-incident
    * near-dup pairs; this folds them into the PERSISTED cluster table
    * without recomputing components from scratch: given `clusters`
    * (id → cluster = min id of its component, the [[dupClusters]]
    * output over the corpus pairs) and the `newPairs` delta, return
    * the cluster table over corpus ∪ `newIds` equal to a fresh
    * [[dupClusters]] over the FULL pair set (the q240 oracle pattern;
    * q243 hash-matches the full recompute).
    *
    * Why contraction to label space is exact: every old component is
    * already labeled by its min id, so collapsing each delta edge's
    * endpoints to their CURRENT labels (own id for unseen batch docs)
    * yields a graph whose components are exactly the merge groups, and
    * whose min label = min id of the merged component (each label IS
    * the min of its old sub-component; batch docs enter as their own
    * id). Components not incident to any delta edge appear nowhere in
    * the contracted graph and keep their labels untouched.
    *
    * Scale shape: everything iterative runs on the CONTRACTED label
    * graph — ≤ 2·|newPairs| nodes regardless of corpus size — via the
    * same pointer-jumping core as [[dupClusters]] (O(log diameter)
    * rounds over the delta, not the corpus). The persisted cluster
    * table is touched exactly once, by one relabel join against the
    * ≤ 2·|newPairs|-row label mapping (broadcast at any realistic
    * delta size — map-side, no corpus shuffle); corpus pairs and
    * corpus text are never re-read. CONTRACT: `clusters` covers every
    * corpus id (dupClusters emits singletons); `newIds` are the batch
    * doc ids (disjoint from the corpus — known ids are dropped via
    * anti-join so re-delivery is harmless); `newPairs` touch only
    * corpus ∪ `newIds` ids. */
  def upsertClusters(clusters: DataFrame, newPairs: DataFrame,
      newIds: DataFrame, idCol: String): DataFrame = {
    val cur = clusters.select(col(idCol).as("id"), col("cluster"))
    val mapping = clusterMergeMapping(cur, newPairs)
    // ONE pass over the persisted table: relabel merged clusters
    val corpusOut = cur
      .join(mapping, cur("cluster") === mapping("lbl"), "left")
      .select(col("id"), coalesce(col("new_lbl"), col("cluster"))
        .as("cluster"))
    val batchOut = batchClusterLabels(cur, mapping, newIds, idCol)
    corpusOut.unionByName(batchOut)
      .select(col("id").as(idCol), col("cluster"))
      .orderBy(idCol)
  }

  /** The label-space MERGE MAPPING at the heart of [[upsertClusters]],
    * factored out so [[upsertClustersPartitioned]] can never key its
    * partition pruning differently than the in-memory merge it
    * mirrors: given the current (id, cluster) table and the delta
    * pairs, contract the delta to label space (own id for unseen batch
    * docs), run components over the CONTRACTED graph only
    * (≤ 2·|newPairs| nodes regardless of corpus size), and return the
    * (lbl → new_lbl) rows for labels that actually MERGE — identity
    * rows drop, so untouched clusters never meet the relabel join. */
  private def clusterMergeMapping(cur: DataFrame, newPairs: DataFrame)
      : DataFrame = {
    val pairs = newPairs.select(col("id_a"), col("id_b"))
      .localCheckpoint(eager = false) // consumed by ends AND labelEdges
    val ends = pairs.select(col("id_a").as("id"))
      .unionByName(pairs.select(col("id_b").as("id")))
      .dropDuplicates("id")
    // current label of each delta endpoint: persisted cluster for
    // corpus docs, own id for unseen (batch) docs
    val endLabels = ends.join(cur, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("lbl"))
      .localCheckpoint(eager = false) // consumed twice (both endpoints)
    // contract the delta to label space; self-edges (both endpoints
    // already in one component) vanish here
    val labelEdges = pairs
      .join(endLabels.select(col("id").as("id_a"), col("lbl").as("lbl_a")),
        Seq("id_a"))
      .join(endLabels.select(col("id").as("id_b"), col("lbl").as("lbl_b")),
        Seq("id_b"))
      .select(col("lbl_a").as("id_a"), col("lbl_b").as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
      .localCheckpoint(eager = false) // consumed by nodes AND components
    val labelNodes = labelEdges.select(col("id_a").as("lbl"))
      .unionByName(labelEdges.select(col("id_b").as("lbl")))
      .dropDuplicates("lbl")
    dupClusters(labelEdges, labelNodes, "lbl")
      .select(col("lbl"), col("cluster").as("new_lbl"))
      .filter(col("new_lbl") =!= col("lbl"))
  }

  /** Batch docs' cluster labels under a merge mapping — the batch half
    * of [[upsertClusters]], shared with [[upsertClustersPartitioned]]
    * for the same reason [[clusterMergeMapping]] is: the partitioned
    * path must not be ABLE to label a batch doc differently than the
    * in-memory merge it mirrors. Unseen ids only (the anti-join makes
    * re-delivery harmless); a doc a delta edge touched maps through
    * the mapping keyed on its own id (its current label), anyone else
    * is a singleton with its own id. Returns (id, cluster). */
  private def batchClusterLabels(cur: DataFrame, mapping: DataFrame,
      newIds: DataFrame, idCol: String): DataFrame =
    newIds.select(col(idCol).as("id"))
      .join(cur.select(col("id")), Seq("id"), "left_anti")
      .join(mapping.withColumnRenamed("lbl", "id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("new_lbl"), col("id"))
        .as("cluster"))

  /** Incremental cluster RETRACTION — the deletion half of the cluster
    * lifecycle ([[dupClusters]] builds, [[upsertClusters]] merges, this
    * retracts): given the persisted cluster table, the persisted pair
    * table, and a set of deleted doc ids (takedowns, right-to-be-
    * forgotten, license revocations — a real obligation for a training
    * corpus), return the cluster table over the retained docs equal to
    * a fresh [[dupClusters]] over the retained pair subgraph.
    *
    * Deletion is structurally harder than merge: removing a doc can
    * SPLIT its component (it may have been the only bridge), so labels
    * cannot be patched algebraically. But the damage is CONTAINED: only
    * components holding a deleted doc can change (an unaffected
    * component keeps its members, hence its min-id label), and a pair
    * can never cross components, so re-clustering the affected
    * components' surviving pair subgraph — and nothing else — is
    * exact. Cost: one id-keyed semi-join of the cluster table against
    * the deleted set, two label-keyed semi/anti joins against the
    * ≤ |deleted|-cluster affected set (broadcast), two endpoint
    * semi-joins pruning the pair table, plus pointer jumping over the
    * affected subgraph only.
    *
    * CONTRACT: the persisted PAIR table is the source of truth — the
    * output is the clustering of the RETAINED pairs. A deletion that
    * cools a hot shingle back under the df-cap could create pairs that
    * a from-scratch rerun over the shrunken corpus would newly emit;
    * a capped index cannot recover those (hot posting lists were
    * dropped), so this operator is deliberately the CONSERVATIVE
    * direction every tombstone-based production dedup takes: it never
    * fabricates a merge, and the q246 oracle (fresh components over
    * the retained pair set) pins exactly that semantics. */
  def retractClusters(clusters: DataFrame, pairs: DataFrame,
      deletedIds: DataFrame, idCol: String): DataFrame = {
    val del = deletedIds.select(col(idCol).as("id"))
      .localCheckpoint(eager = false) // consumed by affected + survivors
    val cur = clusters.select(col(idCol).as("id"), col("cluster"))
    // only components holding a deleted doc can change structure
    val affected = cur.join(del, Seq("id"), "left_semi")
      .select(col("cluster")).dropDuplicates("cluster")
      .localCheckpoint(eager = false) // consumed by members + untouched
    val survivors = cur.join(affected, Seq("cluster"), "left_semi")
      .select(col("id"))
      .join(del, Seq("id"), "left_anti")
      .localCheckpoint(eager = false) // consumed by sub (×2) + relabel
    // surviving pair subgraph of the affected components (pairs never
    // cross components, so semi-joining both endpoints to affected
    // survivors is exactly the subgraph that needs re-clustering)
    val sub = pairs.select(col("id_a"), col("id_b"))
      .join(survivors.withColumnRenamed("id", "id_a"), Seq("id_a"),
        "left_semi")
      .join(survivors.withColumnRenamed("id", "id_b"), Seq("id_b"),
        "left_semi")
    val relabeled = dupClusters(sub,
      survivors.select(col("id").as(idCol)), idCol)
    val untouched = cur.join(affected, Seq("cluster"), "left_anti")
      .select(col("id").as(idCol), col("cluster"))
    untouched.unionByName(relabeled.select(col(idCol), col("cluster")))
      .orderBy(idCol)
  }

  /** Fingerprint width of [[simhash32]]: token hashes are polynomial hashes
    * mod 1e9+7 < 2^30, so only the low 30 bits carry entropy — iterating
    * bits 30/31 would produce constant-zero fingerprint bits, making any
    * Hamming bit-slice band over the top slice degenerate (everything
    * collides). */
  val SimhashBits = 30

  /** 30-bit SimHash over distinct token hashes: bit j of the fingerprint is
    * set iff Σ_tokens (2·((h>>j)&1) − 1) > 0. One projection, no explode —
    * and one native codegen pass over the hash array
    * ([[graft.functions.SimHashExpr]]; the per-bit lambda form below runs
    * [[SimhashBits]] interpreted scans per row). */
  def simhash32(text: Column): Column =
    graft.functions.VectorHash.simhash(
      array_distinct(
        transform(TextOps.tokens(text), w => TextOps.polyHash(w))),
      SimhashBits)

  /** SimHash near-dup pairs via Hamming bit-slice banding: the
    * [[SimhashBits]]-bit fingerprint splits into `slices` contiguous
    * slices; docs sharing ANY slice value are candidates, then verified by
    * exact Hamming distance ≤ `maxHamming`. By pigeonhole, a pair at
    * Hamming d can differ in at most d slices, so for d ≤ slices − 1 at
    * least one slice matches — recall is EXACT (not probabilistic) for
    * `maxHamming < slices` (spec-asserted against the brute-force pair
    * set). Candidate cost is per-slice-bucket occupancy, never |docs|²;
    * the fingerprint is one native-codegen projection, the verify is a
    * bit_count over scalars (filter runs map-side before the pair
    * dedupe, mirroring the q60 shape). */
  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      slices: Int = 5, maxHamming: Int = 3): DataFrame =
    fingerprintNearDupPairs(
      df.select(col(idCol).as("pid"), simhash32(col(textCol)).as("fp")),
      SimhashBits, slices, maxHamming)

  /** The Hamming bit-slice banding core behind [[simhashNearDupPairs]],
    * generalized to ANY fixed-width fingerprint frame `(pid, fp)` —
    * shared with the multimodal payload blockhash (q237), whose
    * perceptual fingerprint needs exactly this candidate machinery over
    * different bits. Same pigeonhole contract: recall is EXACT for
    * `maxHamming < slices` (a pair at Hamming d differs in at most d
    * slices, so at least one of the `slices` slices matches). */
  def fingerprintNearDupPairs(fps: DataFrame, bits: Int, slices: Int,
      maxHamming: Int): DataFrame = {
    require(maxHamming < slices,
      s"pigeonhole guarantee needs maxHamming < slices " +
        s"($maxHamming >= $slices)")
    require(bits % slices == 0,
      s"$bits bits must split evenly into $slices slices")
    val fp = fps.select(col("pid"), col("fp"))
    val banded = fp.select(col("pid"), col("fp"),
      explode(sliceBands(col("fp"), bits, slices)).as("b"))
    banded.as("x").join(banded.as("y"),
        col("x.b") === col("y.b") && col("x.pid") < col("y.pid"))
      .select(col("x.pid").as("id_a"), col("y.pid").as("id_b"),
        bit_count(col("x.fp").bitwiseXOR(col("y.fp"))).cast("int")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
      .orderBy("id_a", "id_b")
  }

  /** The Hamming slice-band derivation shared by every fingerprint
    * banding site ([[fingerprintNearDupPairs]],
    * [[corpusFingerprintIndex]], [[incrementalFingerprintPairs]]) —
    * ONE definition so the incremental path's candidate keys can never
    * silently diverge from the full recompute's: an array of
    * (sl, sv) structs, sv = the sl-th w-bit slice of the fingerprint.
    * The mask keeps the top slice clean of sign-extension if `bits`
    * ever grows to 64. */
  private def sliceBands(fp: Column, bits: Int, slices: Int): Column = {
    val w = bits / slices
    val mask = (1L << w) - 1
    array((0 until slices).map { sl =>
      struct(lit(sl).as("sl"),
        shiftright(fp, sl * w).bitwiseAND(lit(mask)).as("sv"))
    }: _*)
  }

  /** Corpus-side FINGERPRINT scratch for cross-run incremental payload
    * dedup — the multimodal member of the persisted-index family
    * ([[corpusShingleIndex]] exact text, [[corpusLshIndex]] banded
    * text, [[graft.ext.SimSearch.corpusEmbeddingLshIndex]] vectors,
    * this one opaque payloads): the two tables a recrawl pipeline
    * persists per fingerprint modality — Hamming slice index
    * ((sl, sv) → sorted corpus pids) and the fingerprint table
    * (pid, fp). Fingerprints are PER-DOC-deterministic (pure functions
    * of the payload), so like the banding paths the incremental
    * decomposition is exact with no correction algebra. */
  def corpusFingerprintIndex(fps: DataFrame, bits: Int, slices: Int)
      : (DataFrame, DataFrame) = {
    require(bits % slices == 0,
      s"$bits bits must split evenly into $slices slices")
    val f = fps.select(col("pid"), col("fp"))
    val sliceIndex = f.select(col("pid"),
        explode(sliceBands(col("fp"), bits, slices)).as("b"))
      .groupBy(col("b.sl").as("sl"), col("b.sv").as("sv"))
      .agg(sort_array(collect_list(col("pid"))).as("cpids"))
    (sliceIndex, f)
  }

  /** Full corpus payload near-dup pairs FROM the persisted
    * [[corpusFingerprintIndex]] — the state-only form of
    * [[fingerprintNearDupPairs]] (the fingerprint sibling of
    * [[minhashBandPairsFromIndex]]): candidate pairs generate MAP-SIDE
    * from each slice bucket's sorted pid list (the keyCandidates
    * trick), the Hamming verify reads the persisted fingerprint table
    * — payloads are never rescanned, so a pipeline holding the q250
    * state derives its corpus pair set (and cluster table) from state
    * alone. Same slice keys, same verify ⇒ identical output
    * (DedupSpec). */
  def fingerprintPairsFromIndex(sliceIndex: DataFrame, fps: DataFrame,
      maxHamming: Int): DataFrame = {
    val cands = sliceIndex.filter(size(col("cpids")) >= 2)
      .select(col("cpids"), posexplode(col("cpids")))
      .select(col("col").as("id_a"),
        explode(slice(col("cpids"), col("pos") + lit(2),
          size(col("cpids")))).as("id_b"))
      .dropDuplicates("id_a", "id_b")
    cands
      .join(fps.select(col("pid").as("id_a"), col("fp").as("fa")),
        Seq("id_a"))
      .join(fps.select(col("pid").as("id_b"), col("fp").as("fb")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("fa").bitwiseXOR(col("fb"))).cast("int")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .orderBy("id_a", "id_b")
  }

  /** Batch-vs-corpus INCREMENTAL payload near-dup — q237's recrawl
    * shape over the persisted [[corpusFingerprintIndex]]: produce
    * exactly the full corpus∪batch [[fingerprintNearDupPairs]] rows
    * incident to the batch, without recomputing any corpus fingerprint
    * or corpus-corpus candidate. Slice keys are per-payload
    * deterministic, so candidates decompose exactly into batch-batch
    * slice matches plus batch-×-index matches (the
    * [[incrementalMinhashPairs]] argument verbatim); the Hamming
    * verify reads the persisted fingerprint table SEMI-JOIN-PRUNED to
    * candidate-incident ids — scaling with the candidate set, not the
    * corpus. Equality with the filtered full recompute is the q250
    * oracle and a DedupSpec assertion.
    *
    * Id-overlap contract: the BATCH WINS. A re-crawled doc that keeps
    * its corpus pid contributes only its fresh batch fingerprint to the
    * verify (the stale corpus row is anti-joined out before the union),
    * and index-sourced self-candidates drop — so a recrawl scores
    * against what the doc IS, not what it was (round-10 advice; the
    * stale slice-index rows only ever ADD candidates, which the verify
    * then scores on fresh fingerprints, so no pair is lost). A pipeline
    * folding the batch forward afterwards retracts the stale postings
    * via [[retractPostingsIndex]] before [[upsertPostingsIndex]]. */
  def incrementalFingerprintPairs(sliceIndex: DataFrame,
      corpusFps: DataFrame, batchFps: DataFrame, bits: Int, slices: Int,
      maxHamming: Int): DataFrame = {
    require(maxHamming < slices,
      s"pigeonhole guarantee needs maxHamming < slices " +
        s"($maxHamming >= $slices)")
    require(bits % slices == 0,
      s"$bits bits must split evenly into $slices slices")
    val bf = batchFps.select(col("pid"), col("fp"))
      .localCheckpoint(eager = false) // consumed by bands AND verify
    val bBand = bf.select(col("pid"),
        explode(sliceBands(col("fp"), bits, slices)).as("b"))
      .select(col("pid"), col("b.sl").as("sl"), col("b.sv").as("sv"))
      .localCheckpoint(eager = false) // consumed by bb AND bc
    val bb = bBand.as("x").join(bBand.as("y"),
        col("x.sl") === col("y.sl") && col("x.sv") === col("y.sv") &&
          col("x.pid") < col("y.pid"))
      .select(col("x.pid").as("id_a"), col("y.pid").as("id_b"))
    val bc = bBand.join(sliceIndex, Seq("sl", "sv"))
      .select(col("pid").as("bp"), explode(col("cpids")).as("cp"))
      // a re-crawled pid meets its own stale index rows — drop the
      // self-candidate rather than emit a degenerate (pid, pid) pair
      .filter(col("bp") =!= col("cp"))
      .select(least(col("bp"), col("cp")).as("id_a"),
        greatest(col("bp"), col("cp")).as("id_b"))
    val cands = bb.unionByName(bc).dropDuplicates("id_a", "id_b")
      .localCheckpoint(eager = false) // consumed by candIds AND verify
    // prune the persisted fingerprint table to candidate-incident docs
    // before the verify joins (the incrementalMinhashPairs discipline);
    // the batch-pid anti-join makes the batch WIN on overlapping ids —
    // without it a re-crawled doc carries TWO fp rows per pid, fanning
    // out the verify joins and scoring against its stale fingerprint
    val candIds = cands.select(col("id_a").as("pid"))
      .unionByName(cands.select(col("id_b").as("pid")))
      .dropDuplicates("pid")
    val allFps = corpusFps
      .join(bf.select("pid"), Seq("pid"), "left_anti")
      .join(candIds, Seq("pid"), "left_semi")
      .unionByName(bf)
    cands
      .join(allFps.select(col("pid").as("id_a"), col("fp").as("fa")),
        Seq("id_a"))
      .join(allFps.select(col("pid").as("id_b"), col("fp").as("fb")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("fa").bitwiseXOR(col("fb"))).cast("int")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .orderBy("id_a", "id_b")
  }

  /** The (sl, sv, pid) posting rows of a fingerprint table — the
    * per-doc slice keys as ROWS rather than [[corpusFingerprintIndex]]'s
    * grouped lists, the delta shape [[upsertPostingsIndex]] /
    * [[retractPostingsIndex]] consume. Built on the same [[sliceBands]]
    * as every other fingerprint site, so maintenance deltas can never
    * key differently than the index they maintain. */
  def fingerprintPostings(fps: DataFrame, bits: Int, slices: Int)
      : DataFrame = {
    require(bits % slices == 0,
      s"$bits bits must split evenly into $slices slices")
    fps.select(col("pid"),
        explode(sliceBands(col("fp"), bits, slices)).as("b"))
      .select(col("b.sl").as("sl"), col("b.sv").as("sv"), col("pid"))
  }

  /** The (pid, bk) band-key rows of a shingle-postings frame — the
    * MinHash sibling of [[fingerprintPostings]]: the delta shape
    * [[upsertPostingsIndex]] / [[retractPostingsIndex]] consume to
    * maintain [[corpusLshIndex]]'s band table. Built on the SAME
    * signature pipeline ([[minhashSigAggs]] coefficients,
    * [[bandKeys]] rolling fold) as the index, so maintenance deltas
    * can never key differently than the index they maintain. Because
    * the LSH family PERSISTS its postings table, retraction deltas
    * derive from state alone — a takedown never rescans text. */
  def bandRowsFromPostings(post: DataFrame, numHashes: Int,
      rowsPerBand: Int): DataFrame = {
    val aggs = minhashSigAggs(col("sh"), numHashes)
    bandKeys(post.groupBy("pid").agg(aggs.head, aggs.tail: _*),
      numHashes, rowsPerBand)
  }

  /** Merge a new batch's postings into a persisted BANDED posting index
    * (key cols → sorted distinct `cpids`) — the upsert half of
    * maintenance for the UNCAPPED grouped-list banded indexes
    * ([[corpusLshIndex]]'s bk → cpids and [[corpusFingerprintIndex]]'s
    * (sl, sv) → cpids; the third banded state,
    * [[graft.ext.SimSearch.corpusEmbeddingLshIndex]], keeps EXPLODED
    * rows rather than grouped lists, so its maintenance is the plain
    * anti-join + union pair
    * [[graft.ext.SimSearch.upsertEmbeddingIndex]] /
    * [[graft.ext.SimSearch.retractEmbeddingIndex]], oracle-checked as
    * q255/q256). Keys are per-doc
    * deterministic and nothing is df-capped, so unlike
    * [[upsertShingleIndex]] there is no cap algebra at all — the merge
    * is a pure per-key set union, and the upserted index equals the
    * fresh corpus∪batch rebuild EXACTLY (byte-identical, the q251
    * oracle on the fingerprint modality and a DedupSpec assertion on
    * the MinHash band modality; no cooled-hot-row asymmetry to pin).
    * `array_union` makes a RE-DELIVERED batch a no-op (idempotent, the
    * [[upsertClusters]] posture), and the full-outer join admits keys
    * the corpus has never seen.
    *
    * Scale shape: O(batch) postings shuffle to group the delta, then
    * ONE key-keyed full-outer join against the index with a map-side
    * array union — the corpus is never rescanned. */
  def upsertPostingsIndex(index: DataFrame, batchPostings: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    // the empty-list element type derives from the index's own cpids
    // schema, so non-bigint pid spaces (string ids etc.) work as long
    // as index and delta agree — the operator is generic over keyCols
    // AND pid type (round-10 advice: the old array<bigint> hardcode
    // failed analysis for any other id type)
    val ct = index.schema("cpids").dataType.sql
    val bp = batchPostings
      .groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_set(col("pid"))).as("bpids"))
    index.join(bp, keyCols, "full_outer")
      .select(keyCols.map(col) :+
        sort_array(array_union(
          coalesce(col("cpids"), array().cast(ct)),
          coalesce(col("bpids"), array().cast(ct))))
          .as("cpids"): _*)
  }

  /** Remove deleted docs' postings from a persisted BANDED posting
    * index — [[upsertPostingsIndex]]'s inverse and the banded sibling
    * of [[retractShingleIndex]], but with a STRONGER contract: no df
    * bookkeeping exists, so the retracted index equals the fresh
    * rebuild over the retained docs EXACTLY (the q252 oracle) — none
    * of the exact path's pinned cooled-hot-row asymmetry.
    * `array_except` is set subtraction, so a RE-DELIVERED takedown is
    * a no-op by construction (no dedupe step needed); keys whose list
    * empties drop, exactly as a fresh build would never emit them.
    * CONTRACT: `deletedPostings` keys must come from the SAME
    * fingerprint/signature the index was built with — which the
    * persisted fingerprint table supplies for free
    * ([[fingerprintPostings]] over its deleted rows), so takedowns
    * never rescan payloads.
    *
    * Scale shape: O(deleted) postings shuffle, ONE key-keyed left
    * join, map-side array subtraction — corpus never rescanned. */
  def retractPostingsIndex(index: DataFrame, deletedPostings: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val dp = deletedPostings
      .groupBy(keyCols.map(col): _*)
      .agg(collect_set(col("pid")).as("dpids"))
    index.join(dp, keyCols, "left")
      .select(keyCols.map(col) :+
        when(col("dpids").isNotNull,
          array_except(col("cpids"), col("dpids")))
          .otherwise(col("cpids")).as("cpids"): _*)
      .filter(size(col("cpids")) >= 1)
  }

  /** Write a banded posting index as HASH-PARTITIONED parquet state
    * (`pbucket = pmod(hash(keys), numBuckets)` as the partition
    * column) — the production layout for
    * [[upsertPostingsIndexPartitioned]]: at 100 TB the index itself is
    * large, and the single-table [[upsertPostingsIndex]] necessarily
    * rewrites (and re-sorts) every row per upsert because parquet
    * state is immutable — a 0.1%-of-keys delta still costs a full
    * table rewrite. Partitioned state bounds the rewrite to the
    * partitions the delta touches. */
  def writePostingsIndexPartitioned(index: DataFrame, path: String,
      keyCols: Seq[String], numBuckets: Int): Unit =
    index.withColumn("pbucket",
        pmod(hash(keyCols.map(col): _*), lit(numBuckets)))
      .write.mode("overwrite").partitionBy("pbucket").parquet(path)

  /** [[upsertPostingsIndex]] against hash-partitioned parquet state,
    * rewriting ONLY the partitions the delta touches: the merge logic
    * is identical (grouped delta, one key-keyed full-outer join,
    * map-side `array_union`), but the state side is partition-PRUNED
    * to the delta's buckets before the join and written back with
    * dynamic partition overwrite — untouched partitions' files are
    * never read and never rewritten (DedupSpec pins both directions:
    * untouched leaf files byte-stable, full post-upsert read equals
    * the in-memory [[upsertPostingsIndex]] and hence the fresh
    * rebuild). Returns the touched bucket ids.
    *
    * The bucket-id collect is ≤ `numBuckets` ints (KB-bounded by
    * construction — the partition-pruning literal, same class as the
    * documented top-k / subtotal collects); the eager checkpoint
    * before the write is the read-then-overwrite barrier (the merge
    * output is materialized before its own input partitions are
    * replaced) and is itself bounded by the touched partitions.
    * BARRIER CAVEAT (round-11 advice): `localCheckpoint` blocks are
    * NON-reliable — safe in this repo's single-process local[n]
    * harness, but on a real cluster an executor loss during the write
    * job would trigger lineage recompute that re-reads the state path
    * mid-overwrite. At scale the merge output must go through a
    * reliable checkpoint (`sparkContext.setCheckpointDir` +
    * `checkpoint()`), a staging-path write-then-swap, or — the real
    * production answer — a table format's transactional commit
    * (Iceberg/Delta-class), which replaces both the barrier and the
    * directory surgery below.
    * A retraction variant is the same shape with the
    * [[retractPostingsIndex]] merge body — a takedown delta prunes
    * identically. */
  def upsertPostingsIndexPartitioned(statePath: String,
      batchPostings: DataFrame, keyCols: Seq[String], numBuckets: Int)
      : Seq[Int] = {
    val spark = batchPostings.sparkSession
    val delta = batchPostings
      .groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_set(col("pid"))).as("bpids"))
      .withColumn("pbucket",
        pmod(hash(keyCols.map(col): _*), lit(numBuckets)))
      .localCheckpoint(eager = true) // consumed by touched AND merge
    val touched = delta.select("pbucket").distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    val cur = spark.read.parquet(statePath)
      .filter(col("pbucket").isin(touched: _*))
    val ct = cur.schema("cpids").dataType.sql
    val merged = cur.drop("pbucket")
      .join(delta.drop("pbucket"), keyCols, "full_outer")
      .select(keyCols.map(col) :+
        sort_array(array_union(
          coalesce(col("cpids"), array().cast(ct)),
          coalesce(col("bpids"), array().cast(ct))))
          .as("cpids"): _*)
      .withColumn("pbucket",
        pmod(hash(keyCols.map(col): _*), lit(numBuckets)))
      .localCheckpoint(eager = true) // barrier: materialize BEFORE the
                                     // overwrite replaces its own input
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("pbucket").parquet(statePath)
    touched
  }

  /** [[retractPostingsIndex]] against hash-partitioned parquet state —
    * [[upsertPostingsIndexPartitioned]]'s takedown half, completing
    * the partitioned-state demonstration in both maintenance
    * directions: the deletion delta prunes the state read to its
    * touched buckets, the same left-join + map-side `array_except`
    * merge runs on the pruned side only (emptied keys drop, exactly
    * as the in-memory form), and dynamic partition overwrite rewrites
    * only touched partitions. One retraction-specific edge the upsert
    * cannot hit: a bucket whose keys ALL empty produces NO output
    * rows, and dynamic overwrite only replaces partitions PRESENT in
    * the write — so fully-emptied buckets are dropped explicitly
    * afterwards (a ≤ numBuckets driver-side directory delete; a table
    * format does this as a transactional metadata drop). DedupSpec
    * pins the case. Returns the touched bucket ids.
    *
    * CRASH-WINDOW AUDIT (round-11 advice): between the
    * dynamic-overwrite commit and the emptied-bucket drops there is a
    * window where a failure leaves stale files readable — a silently
    * surviving partition would UN-apply a takedown until the same
    * delta is re-delivered. So before returning, the touched buckets
    * are re-read and every retracted (key, pid) posting is required
    * absent (cost bounded by the touched partitions; a re-delivered
    * delta passes the same audit as a no-op). The
    * [[upsertPostingsIndexPartitioned]] barrier caveat applies here
    * too: the localCheckpoint barrier is single-process-safe only —
    * at scale, use a reliable checkpoint / staged swap / table-format
    * transactional commit. */
  def retractPostingsIndexPartitioned(statePath: String,
      deletedPostings: DataFrame, keyCols: Seq[String], numBuckets: Int)
      : Seq[Int] = {
    val spark = deletedPostings.sparkSession
    val delta = deletedPostings
      .groupBy(keyCols.map(col): _*)
      .agg(collect_set(col("pid")).as("dpids"))
      .withColumn("pbucket",
        pmod(hash(keyCols.map(col): _*), lit(numBuckets)))
      .localCheckpoint(eager = true) // consumed by touched AND merge
    val touched = delta.select("pbucket").distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    val cur = spark.read.parquet(statePath)
      .filter(col("pbucket").isin(touched: _*))
    val merged = cur.drop("pbucket")
      .join(delta.drop("pbucket"), keyCols, "left")
      .select(keyCols.map(col) :+
        when(col("dpids").isNotNull,
          array_except(col("cpids"), col("dpids")))
          .otherwise(col("cpids")).as("cpids"): _*)
      .filter(size(col("cpids")) >= 1)
      .withColumn("pbucket",
        pmod(hash(keyCols.map(col): _*), lit(numBuckets)))
      .localCheckpoint(eager = true) // barrier before self-overwrite
    val remaining = merged.select("pbucket").distinct()
      .collect().map(_.getInt(0)).toSet
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("pbucket").parquet(statePath)
    // fully-emptied buckets wrote no rows, so the dynamic overwrite
    // left their old files in place — drop them THROUGH THE HADOOP
    // FILESYSTEM of the state path (java.io would silently no-op on
    // hdfs://, s3a:// or a differently-resolved relative path, and a
    // silently surviving partition un-applies a takedown), and fail
    // loudly if a drop does not succeed (bounded by numBuckets; the
    // table-format equivalent is a transactional metadata drop)
    dropEmptiedBuckets(spark, statePath, touched.filterNot(remaining))
    // post-commit audit: no retracted (key, pid) posting may survive in
    // the touched buckets (see scaladoc — this closes the crash window
    // between the overwrite commit and the directory drops)
    if (anyBucketLeft(spark, statePath)) {
      val retracted = delta.drop("pbucket")
        .select(keyCols.map(col) :+ explode(col("dpids")).as("rpid"): _*)
      val stale = spark.read.parquet(statePath)
        .filter(col("pbucket").isin(touched: _*))
        .join(retracted, keyCols)
        .filter(array_contains(col("cpids"), col("rpid")))
        .count()
      require(stale == 0,
        s"retraction audit failed: $stale retracted postings still " +
          s"readable under $statePath — stale partition files survived " +
          "the takedown")
    }
    touched
  }

  /** Drop fully-emptied `pbucket=` partition directories after a
    * dynamic-partition overwrite (which only replaces partitions
    * PRESENT in the write) — the shared edge handler of every
    * partitioned-state op here. Goes through the Hadoop FileSystem of
    * the state path (java.io would silently no-op on hdfs:// / s3a://
    * or a differently-resolved relative path) and fails loudly;
    * bounded by the touched-bucket count. A table format does this as
    * a transactional metadata drop. */
  private def dropEmptiedBuckets(spark: org.apache.spark.sql.SparkSession,
      statePath: String, buckets: Seq[Int]): Unit =
    buckets.foreach { b =>
      val p = new org.apache.hadoop.fs.Path(s"$statePath/pbucket=$b")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p))
        require(fs.delete(p, true),
          s"failed to drop emptied state partition $p")
    }

  /** True iff the partitioned state path still holds any `pbucket=`
    * partition — the guard before a post-maintenance read-back audit
    * (reading a fully-emptied parquet dir throws on schema inference,
    * and an empty state is trivially consistent). */
  private def anyBucketLeft(spark: org.apache.spark.sql.SparkSession,
      statePath: String): Boolean = {
    val root = new org.apache.hadoop.fs.Path(statePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(root).exists(_.getPath.getName.startsWith("pbucket="))
  }

  /** Write a cluster table as HASH-PARTITIONED parquet state
    * (`pbucket = pmod(hash(cluster), numBuckets)`) — the production
    * layout for [[upsertClustersPartitioned]] /
    * [[retractClustersPartitioned]]: the cluster table is the OTHER
    * state table every lifecycle chain rewrites per maintenance cycle
    * (round-11 verdict — [[upsertClusters]]' algebra is delta-bounded
    * but its single-table parquet output is not), and partitioning on
    * the LABEL bounds the rewrite to the partitions whose labels the
    * delta actually moves. Partitioning on the label rather than the
    * id is what makes maintenance prunable: every row that can change
    * in an upsert has cluster ∈ merged-labels, and every row that can
    * change in a retraction has cluster ∈ affected-labels — both
    * delta-bounded label sets. */
  def writeClustersPartitioned(clusters: DataFrame, path: String,
      idCol: String, numBuckets: Int): Unit =
    clusters.select(col(idCol), col("cluster"))
      .withColumn("pbucket", pmod(hash(col("cluster")), lit(numBuckets)))
      .write.mode("overwrite").partitionBy("pbucket").parquet(path)

  /** [[upsertClusters]] against hash-partitioned parquet state,
    * rewriting ONLY the partitions the merge touches. The merge
    * mapping is the SAME [[clusterMergeMapping]] the in-memory form
    * uses (contracted label graph — delta-bounded), so the touched
    * set is exact: a corpus row relabels iff its cluster ∈
    * mapping.lbl, and relabeled rows LAND in their merged label's
    * bucket — so the write set is buckets of {mapping.lbl ∪
    * mapping.new_lbl ∪ batch output labels} and nothing else.
    * Untouched partitions' files are never read by the merge join and
    * never rewritten (DedupSpec pins byte-stability and full-read ==
    * in-memory [[upsertClusters]] == fresh rebuild).
    *
    * Two reads the REWRITE bound does not cover, both read-only: the
    * endpoint-label lookup and the batch-id anti-join scan the full
    * state (label-partitioned state cannot prune an id-keyed probe) —
    * each shuffles only delta-sized rows, and a production pipeline
    * holding the q245-family layout keeps the id-keyed cluster
    * projection anyway.
    *
    * Unlike the postings upsert, a bucket CAN fully empty here — all
    * of a bucket's labels may merge away into other buckets' labels —
    * so the emptied-partition drop applies in the UPSERT direction
    * too (spec-pinned). Bucket-id collects are ≤ numBuckets ints; the
    * eager checkpoints are the read-before-self-overwrite barrier,
    * single-process-safe only (see
    * [[upsertPostingsIndexPartitioned]]'s caveat — at scale use a
    * reliable checkpoint / staged swap / table-format commit).
    * Returns the touched bucket ids. */
  def upsertClustersPartitioned(statePath: String, newPairs: DataFrame,
      newIds: DataFrame, idCol: String, numBuckets: Int): Seq[Int] = {
    val spark = newPairs.sparkSession
    def bucketOf(c: Column): Column = pmod(hash(c), lit(numBuckets))
    val cur = spark.read.parquet(statePath)
      .select(col(idCol).as("id"), col("cluster"))
    val mapping = clusterMergeMapping(cur, newPairs)
      .localCheckpoint(eager = true) // delta-bounded; read from state,
                                     // consumed after the overwrite
    val batchOut = batchClusterLabels(cur, mapping, newIds, idCol)
      .localCheckpoint(eager = true) // reads state (anti-join) — must
                                     // materialize before the overwrite
    val touched = mapping.select(bucketOf(col("lbl")).as("b"))
      .unionByName(mapping.select(bucketOf(col("new_lbl")).as("b")))
      .unionByName(batchOut.select(bucketOf(col("cluster")).as("b")))
      .distinct().collect().map(_.getInt(0)).sorted.toSeq
    val curT = spark.read.parquet(statePath)
      .filter(col("pbucket").isin(touched: _*))
      .drop("pbucket")
    val merged = curT
      .join(mapping, curT("cluster") === mapping("lbl"), "left")
      .select(col(idCol),
        coalesce(col("new_lbl"), curT("cluster")).as("cluster"))
      .unionByName(batchOut.select(col("id").as(idCol), col("cluster")))
      .withColumn("pbucket", bucketOf(col("cluster")))
      .localCheckpoint(eager = true) // barrier before self-overwrite
    val remaining = merged.select("pbucket").distinct()
      .collect().map(_.getInt(0)).toSet
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("pbucket").parquet(statePath)
    dropEmptiedBuckets(spark, statePath, touched.filterNot(remaining))
    touched
  }

  /** [[retractClusters]] against hash-partitioned parquet state —
    * [[upsertClustersPartitioned]]'s takedown half, and the
    * structurally interesting direction: deletion can SPLIT a
    * component, and the re-clustered survivors take new labels (min
    * retained id of each split part) that can hash into partitions
    * the deletion delta never listed. So the write set is discovered
    * in two steps — buckets of the AFFECTED labels (where every row
    * that can change lives; pairs never cross components, so this is
    * exact) plus buckets of the RELABELED output's labels, known only
    * after re-clustering the affected components' surviving pair
    * subgraph. Partitions in neither set are never rewritten
    * (DedupSpec pins the split-component case: a new label landing in
    * a bucket the delta didn't list rewrites exactly that bucket and
    * leaves the rest byte-stable, and the full read equals the
    * in-memory [[retractClusters]] == fresh components over retained
    * pairs).
    *
    * The id→affected-label lookup scans the full state read-only (as
    * in the upsert); everything iterative runs on the affected
    * subgraph only. After the overwrite + emptied-partition drops, a
    * TAKEDOWN AUDIT re-reads the touched buckets and requires no
    * deleted id's row is still readable (the
    * [[retractPostingsIndexPartitioned]] crash-window posture;
    * affected LABELS may legitimately survive — a split part keeps
    * label L when L itself is retained — so the audit checks ids, not
    * labels). Same single-process barrier caveat as the upsert.
    * Returns the touched bucket ids. */
  def retractClustersPartitioned(statePath: String, pairs: DataFrame,
      deletedIds: DataFrame, idCol: String, numBuckets: Int): Seq[Int] = {
    val spark = deletedIds.sparkSession
    def bucketOf(c: Column): Column = pmod(hash(c), lit(numBuckets))
    val del = deletedIds.select(col(idCol).as("id"))
      .dropDuplicates("id")
      .localCheckpoint(eager = true) // consumed by affected, survivors,
                                     // and the post-overwrite audit
    // only components holding a deleted doc can change structure
    val affected = spark.read.parquet(statePath)
      .select(col(idCol).as("id"), col("cluster"))
      .join(del, Seq("id"), "left_semi")
      .select("cluster").dropDuplicates("cluster")
      .localCheckpoint(eager = true)
    val readBuckets = affected.select(bucketOf(col("cluster")).as("b"))
      .distinct().collect().map(_.getInt(0)).sorted.toSeq
    // surviving members of the affected components, from the pruned
    // buckets only
    val survivors = spark.read.parquet(statePath)
      .filter(col("pbucket").isin(readBuckets: _*))
      .select(col(idCol).as("id"), col("cluster"))
      .join(affected, Seq("cluster"), "left_semi")
      .select("id")
      .join(del, Seq("id"), "left_anti")
      .localCheckpoint(eager = true) // consumed by sub (×2) + nodes;
                                     // reads state — barrier
    val sub = pairs.select(col("id_a"), col("id_b"))
      .join(survivors.withColumnRenamed("id", "id_a"), Seq("id_a"),
        "left_semi")
      .join(survivors.withColumnRenamed("id", "id_b"), Seq("id_b"),
        "left_semi")
    // dupClusters eagerly checkpoints its output — materialized here
    val relabeled = dupClusters(sub,
      survivors.select(col("id").as(idCol)), idCol)
    // split parts can take labels hashing into buckets the delta never
    // listed — those join the write set and their unchanged rows are
    // carried through (dynamic overwrite replaces whole partitions)
    val touched = (readBuckets ++
      relabeled.select(bucketOf(col("cluster")).as("b")).distinct()
        .collect().map(_.getInt(0))).distinct.sorted
    val keep = spark.read.parquet(statePath)
      .filter(col("pbucket").isin(touched: _*))
      .drop("pbucket")
      .join(affected, Seq("cluster"), "left_anti")
    val out = keep.select(col(idCol), col("cluster"))
      .unionByName(relabeled.select(col(idCol), col("cluster")))
      .withColumn("pbucket", bucketOf(col("cluster")))
      .localCheckpoint(eager = true) // barrier before self-overwrite
    val remaining = out.select("pbucket").distinct()
      .collect().map(_.getInt(0)).toSet
    out.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("pbucket").parquet(statePath)
    dropEmptiedBuckets(spark, statePath, touched.filterNot(remaining))
    if (anyBucketLeft(spark, statePath)) {
      val stale = spark.read.parquet(statePath)
        .filter(col("pbucket").isin(touched: _*))
        .select(col(idCol).as("id"))
        .join(del, Seq("id"), "left_semi")
        .count()
      require(stale == 0,
        s"cluster takedown audit failed: $stale deleted ids still " +
          s"readable under $statePath — stale partition files survived")
    }
    touched
  }

  /** Write any ID-KEYED state table as hash-partitioned parquet
    * (`pbucket = pmod(hash(id), numBuckets)`) — the generic layout for
    * the two remaining per-maintenance-cycle full rewrites (round-11
    * verdict item 4): the embedding exploded-row index
    * ([[graft.ext.SimSearch.corpusEmbeddingLshIndex]], id = vec_id,
    * several rows per id) and the fingerprint table
    * ([[corpusFingerprintIndex]]'s (pid, fp) half, id = pid). Both
    * maintain by id-keyed anti-join (+ union), so — unlike the
    * cluster table — rows NEVER change buckets: an id's fresh rows
    * hash exactly where its stale rows lived, which makes the pruning
    * trivial and the upsert direction incapable of emptying a bucket.
    * Schema-generic: every non-id column passes through untouched. */
  def writeIdKeyedStatePartitioned(state: DataFrame, path: String,
      idCol: String, numBuckets: Int): Unit =
    state.withColumn("pbucket", pmod(hash(col(idCol)), lit(numBuckets)))
      .write.mode("overwrite").partitionBy("pbucket").parquet(path)

  /** Batch-wins UPSERT against [[writeIdKeyedStatePartitioned]] state:
    * prune the state read to the batch ids' buckets, anti-join the
    * batch ids' stale rows out, union the fresh rows (same buckets by
    * construction), dynamic-overwrite only those partitions — the
    * [[graft.ext.SimSearch.upsertEmbeddingIndex]] semantics with the
    * rewrite bounded to delta-touched partitions (DedupSpec pins
    * byte-stability of untouched leaves and full-read == the
    * in-memory anti-join + union == fresh rebuild). A re-delivered
    * identical batch rewrites the same buckets to identical contents
    * (idempotent). No emptied-bucket edge: every touched bucket
    * receives the fresh rows that made it touched. Single-process
    * barrier caveat as above. Returns the touched bucket ids. */
  def upsertIdKeyedStatePartitioned(statePath: String,
      freshRows: DataFrame, idCol: String, numBuckets: Int): Seq[Int] = {
    val spark = freshRows.sparkSession
    val fresh = freshRows
      .withColumn("pbucket", pmod(hash(col(idCol)), lit(numBuckets)))
      .localCheckpoint(eager = true) // consumed by touched AND merge
    val touched = fresh.select("pbucket").distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    val cur = spark.read.parquet(statePath)
      .filter(col("pbucket").isin(touched: _*))
    val merged = cur
      .join(fresh.select(col(idCol)).dropDuplicates(idCol), Seq(idCol),
        "left_anti")
      .unionByName(fresh)
      .localCheckpoint(eager = true) // barrier before self-overwrite
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("pbucket").parquet(statePath)
    touched
  }

  /** Takedown RETRACTION against [[writeIdKeyedStatePartitioned]]
    * state: prune to the deleted ids' buckets, ONE id-keyed anti-join
    * on the pruned side, dynamic overwrite, drop fully-emptied
    * partitions, then audit that no deleted id's row is still
    * readable (the [[retractPostingsIndexPartitioned]] crash-window
    * posture). [[graft.ext.SimSearch.retractEmbeddingIndex]] semantics
    * with the rewrite bounded to delta-touched partitions; a
    * re-delivered takedown is a no-op that passes the same audit.
    * Returns the touched bucket ids. */
  def retractIdKeyedStatePartitioned(statePath: String,
      deletedIds: DataFrame, idCol: String, numBuckets: Int): Seq[Int] = {
    val spark = deletedIds.sparkSession
    val del = deletedIds.select(col(idCol)).dropDuplicates(idCol)
      .withColumn("pbucket", pmod(hash(col(idCol)), lit(numBuckets)))
      .localCheckpoint(eager = true) // consumed by touched, merge, audit
    val touched = del.select("pbucket").distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    val merged = spark.read.parquet(statePath)
      .filter(col("pbucket").isin(touched: _*))
      .join(del.select(col(idCol)), Seq(idCol), "left_anti")
      .localCheckpoint(eager = true) // barrier before self-overwrite
    val remaining = merged.select("pbucket").distinct()
      .collect().map(_.getInt(0)).toSet
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("pbucket").parquet(statePath)
    dropEmptiedBuckets(spark, statePath, touched.filterNot(remaining))
    if (anyBucketLeft(spark, statePath)) {
      val stale = spark.read.parquet(statePath)
        .filter(col("pbucket").isin(touched: _*))
        .join(del.select(col(idCol)), Seq(idCol), "left_semi")
        .count()
      require(stale == 0,
        s"id-keyed takedown audit failed: $stale deleted ids' rows " +
          s"still readable under $statePath")
    }
    touched
  }

  /** Exact edit-distance ≤ `maxDist` (1 or 2) self-join via deletion
    * neighborhoods (FastSS / symmetric-delete blocking): every string
    * emits itself plus each deletion variant as candidate keys; two strings
    * within Levenshtein distance 1 ALWAYS share a key — equal strings
    * share the string itself, an insert/delete pair shares the shorter
    * string, and a substitution pair shares the deletion at the
    * substituted position — so an equi-join on the variant key followed
    * by a `levenshtein` verify is EXACT (no recall loss), with no cross
    * join anywhere.
    *
    * Scale shape: key blowup is len+1 per string (linear, and
    * `array_distinct` collapses repeated-character variants);
    * candidates are Σ C(|bucket|, 2) over shared-key buckets — for
    * name/title-length strings the buckets stay small, and a pathological
    * hot variant would show up in the q118-style skew profile before it
    * hurt (the df-cap/rarest-first tricks from [[jaccardPairs]] /
    * [[prefixJaccardPairs]] apply unchanged if one ever does). Pair
    * dedupe shuffles on the (id_a, id_b) key; the verify is a scalar
    * `levenshtein` on the joined strings, map-side.
    *
    * `maxDist = 2` generalizes the neighborhood to deletions of
    * deletions: SymSpell's symmetric-delete lemma holds for any d — two
    * strings within Levenshtein d ALWAYS share a member of their
    * ≤ d-deletion neighborhoods — so the equi-join stays EXACT (recall
    * proven by q239's brute-force oracle, not assumed). Key blowup is
    * 1 + L + C(L, 2) ≈ L²/2 per string — a few hundred keys at
    * name/title length, still linear in the corpus and still no cross
    * join; d = 1 stays the typo-level sweet spot, d = 2 the coverage
    * setting entity resolution usually needs (OCR noise, double typos).
    *
    * Returns (id_a, id_b, dist) with id_a < id_b, dist ≤ maxDist. */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int = 1): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"maxDist must be 1 or 2, got $maxDist")
    val named = df.select(col(idCol).as("eid"), col(strCol).as("s"))
    // every single-deletion variant of an arbitrary string expression
    // (empty-string guard: sequence(1, 0) would flip descending)
    def delVariants(s: Column): Column =
      when(length(s) > 0,
        transform(sequence(lit(1), length(s)),
          i => concat(s.substr(lit(1), i - 1),
            s.substr(i + 1, length(s)))))
        .otherwise(array())
    val d1 = delVariants(col("s"))
    // the string itself + its ≤ maxDist deletion neighborhood, deduped
    val keys =
      if (maxDist == 1) concat(array(col("s")), d1)
      else concat(array(col("s")), d1,
        flatten(transform(d1, v => delVariants(v))))
    val keyed = named.select(col("eid"),
      explode(array_distinct(keys)).as("vkey"))
    val candidates = keyed.as("a").join(keyed.as("b"),
        col("a.vkey") === col("b.vkey") && col("a.eid") < col("b.eid"))
      .select(col("a.eid").as("id_a"), col("b.eid").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    candidates
      .join(named.select(col("eid").as("id_a"), col("s").as("s_a")), "id_a")
      .join(named.select(col("eid").as("id_b"), col("s").as("s_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        levenshtein(col("s_a"), col("s_b")).as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /** Per-document repeated-span coverage: the fraction of a document's
    * tokens lying inside at least one n-gram that also occurs in ≥
    * `minDocs` OTHER distinct documents — the span-level cross-corpus
    * duplication signal used to filter training data (a doc that is 80%
    * boilerplate shared with other pages keeps a low Jaccard against any
    * single one of them, but its span coverage is 0.8). Within-document
    * repetition deliberately does not count (that is repetition profiling,
    * a different signal).
    *
    * Returns (idCol, n_toks, covered, dup_frac) for EVERY input row
    * (short docs: covered = 0).
    *
    * Scale shape: occurrences carry (id, start, 8-byte gram hash) — no
    * gram strings ever shuffle (native [[graft.functions.ShingleHash]]
    * rolling hash, O(chars + n·k)). Unlike pair-generating dedup there is
    * NO quadratic term to cap: a boilerplate gram in f docs costs f
    * occurrence rows through a membership semi-join, linear in corpus
    * size, so no df-cap is needed. The position explode (×n) applies only
    * to occurrences of qualifying grams. */
  def repeatedSpanCoverage(df: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Int = 2): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    val base = df.select(col(idCol),
      graft.functions.ShingleHash.shingle_hash(toks, n).as("ghs"),
      size(toks).as("n_toks"))
    val occ = base
      .select(col(idCol), posexplode(col("ghs")).as(Seq("s", "gh")))
    // two-phase distinct-doc count: (gh, id) dedup is map-side partial,
    // so the gh shuffle carries each doc's first occurrence only
    val rep = occ.select(col("gh"), col(idCol)).distinct()
      .groupBy("gh").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("gh")
    val covered = occ.join(rep, "gh")
      .select(col(idCol),
        explode(sequence(col("s"), col("s") + (n - 1))).as("pos"))
      .groupBy(idCol).agg(countDistinct(col("pos")).as("covered"))
    base.select(col(idCol), col("n_toks"))
      .join(covered, Seq(idCol), "left")
      .select(col(idCol), col("n_toks"),
        coalesce(col("covered"), lit(0L)).as("covered"),
        round(coalesce(col("covered"), lit(0L)).cast("double") /
          col("n_toks"), 6).as("dup_frac"))
  }

  /** Sorted-neighborhood record-linkage blocking: sort within blocks by
    * the link key, compare each record to its next `w−1` sort neighbors
    * only, keep pairs with edit distance in [1, maxDist] (distance-0
    * pairs are exact-dedup's job, [[exactDedup]]). The classic SNM
    * candidate generator: near-miss keys (typos, reorderings that leave
    * the prefix intact) land adjacent in sort order, so the quadratic
    * all-pairs compare collapses to a linear windowed one. Misses pairs
    * whose keys sort far apart — the standard remedy is multi-pass SNM
    * (union over different block/sort keys), which composes here as
    * `pass1.unionByName(pass2).dropDuplicates`.
    *
    * Scale shape: the window is partitioned by `blockExpr` — a real
    * shuffle-partitionable key, NOT a global sort — and all w−1 `lead`s
    * share one window pass (one Exchange + sort). Output is ≤ n·(w−1)
    * rows before the distance filter; nothing quadratic anywhere.
    * Ordering ties break by id, so pair generation is deterministic
    * under re-partitioning. */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String, keyCol: String,
      blockExpr: Column, w: Int, maxDist: Int): DataFrame = {
    require(w >= 2, "window must cover at least one neighbor")
    val win = Window.partitionBy("__blk").orderBy(col("__k"), col("__id"))
    val base = df.select(col(idCol).as("__id"), col(keyCol).as("__k"),
      blockExpr.as("__blk"))
    val neighbors = (1 until w).map { i =>
      struct(lead(col("__id"), i).over(win).as("id_b"),
        lead(col("__k"), i).over(win).as("k_b")).as(s"__l$i")
    }
    base.select(col("__id") +: col("__k") +: neighbors: _*)
      .select(col("__id").as("id_a"), col("__k").as("k_a"),
        explode(array((1 until w).map(i => col(s"__l$i")): _*)).as("nb"))
      .filter(col("nb.id_b").isNotNull)
      .select(col("id_a"), col("nb.id_b").as("id_b"),
        levenshtein(col("k_a"), col("nb.k_b")).as("dist"))
      .filter(col("dist") >= 1 && col("dist") <= maxDist)
  }

  /** Per-bit lambda form of [[simhash32]] (parity testing only). */
  def simhash32Lambda(text: Column): Column = {
    val hashes = array_distinct(
      transform(TextOps.tokens(text), w => TextOps.polyHash(w)))
    val bitCols = (0 until SimhashBits).map { j =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + (shiftright(h, j) % 2) * 2 - 1)
      when(votes > 0, lit(1L << j)).otherwise(0L)
    }
    bitCols.reduce(_ + _)
  }

  /** Golden-record survivorship over near-dup clusters — the MDM step
    * AFTER clustering: each multi-member cluster collapses to one
    * synthesized record by per-attribute rules (representative = the
    * LONGEST text, tie to min id — "most complete wins"; lang/source =
    * the modal value, tie to min — "majority wins"; chars = max).
    * Rule-based and deterministic, so a re-run of the pipeline emits
    * the same golden rows — the property downstream training-data
    * snapshots need.
    *
    * Scale shape: one join docs⋈clusters on id, then one window (rep
    * pick) and two (cluster, attr) hash-aggs with |cluster|-bounded
    * windows for the modes — all partitioned by cluster, nothing
    * corpus-wide. `docs` needs (id, text, lang, source, chars). */
  def goldenRecord(docs: DataFrame, clusters: DataFrame,
      idCol: String): DataFrame = {
    val d = docs.join(clusters, idCol)
      .select(col(idCol).as("id"), col("cluster"), col("text"),
        col("lang"), col("source"), col("n_chars"))
      .localCheckpoint(eager = false) // rep window + two mode aggs
    val multi = d.groupBy("cluster")
      .agg(count(lit(1)).as("n_members"), max(col("n_chars")).as("mc"))
      .filter(col("n_members") >= 2)
    val wRep = Window.partitionBy("cluster")
      .orderBy(length(col("text")).desc, col("id"))
    val rep = d.withColumn("__rn", row_number().over(wRep))
      .filter(col("__rn") === 1)
      .select(col("cluster"), col("id").as("rep_id"))
    def mode(attr: String) = {
      // asc_nulls_last, not plain asc: Spark's default ascending sort is
      // NULLS FIRST while the DuckDB oracle's `ORDER BY __n DESC, attr`
      // is NULLS LAST — on a cluster whose modal attr ties include NULL
      // the two engines would otherwise pick different winners
      val w = Window.partitionBy("cluster")
        .orderBy(col("__n").desc, col(attr).asc_nulls_last)
      d.groupBy(col("cluster"), col(attr))
        .agg(count(lit(1)).as("__n"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("cluster"), col(attr).as(s"${attr}_mode"))
    }
    multi.join(rep, "cluster").join(mode("lang"), "cluster")
      .join(mode("source"), "cluster")
      .select(col("cluster"), col("n_members"), col("rep_id"),
        col("lang_mode"), col("source_mode"),
        col("mc").as("max_chars"))
      .orderBy("cluster")
  }
}
