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
object Dedup extends DedupMaintenance with DedupLinkage {

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
    // explode_OUTER + isNotNull, deliberately: plain explode makes the
    // optimizer infer a size(...) > 0 filter below the Generate whose
    // alias substitution re-evaluates the WHOLE shingle pipeline a
    // second time per row; outer infers no filter, and the null row an
    // empty doc emits drops on the generator OUTPUT column (cheap)
    // NO fan-out here (round-18, measured and reverted on a healthy
    // host window): the shingle explode's map work is too light to
    // amortize an extra AQE stage at this scale — interleaved A/B over
    // the text families read OFF 17.3/18.9 s vs ON 20.0/20.9 s
    // (q242 3.6 vs 5.5, q247 0.87 vs 1.26). The fan-out stays where
    // the per-row map work measurably dominates (WAV container encode,
    // ×B replicate explode, deletion neighborhoods, JSON parse).
    df.select(col(idCol).as("pid"),
        explode_outer(shingleHashes(col(textCol), k)).as("sh"))
      .filter(col("sh").isNotNull)

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
      k: Int, threshold: Double, maxDf: Int = Int.MaxValue,
      ordered: Boolean = true): DataFrame = {
    val (sizes, shared) = shingleCandidates(df, idCol, textCol, k, maxDf)
    val out = shared
      .join(sizes.select(col("pid").as("id_a"), col("n_sh").as("n_a")),
        Seq("id_a"))
      .join(sizes.select(col("pid").as("id_b"), col("n_sh").as("n_b")),
        Seq("id_b"))
      .withColumn("jac", col("n_shared").cast("double") /
        (col("n_a") + col("n_b") - col("n_shared")))
      .filter(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"), col("jac"))
    // `ordered = false` skips the deterministic output sort — for
    // SCRATCH-table builds (round-18): a range sort costs an extra
    // sampling pass plus a recompute of the plan's final stage, and a
    // persisted pair table's consumers (cluster builds, joins,
    // aggregates) never depend on its row order. The query-surface
    // callers keep the default ordered form (oracle hash stability).
    if (ordered) out.orderBy("id_a", "id_b") else out
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
  def jaccardPairsFromIndex(index: DataFrame, threshold: Double,
      ordered: Boolean = true): DataFrame = {
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
    val out = sh
      .join(sz.select(col("pid").as("id_a"), col("n_sh").as("n_a")),
        Seq("id_a"))
      .join(sz.select(col("pid").as("id_b"), col("n_sh").as("n_b")),
        Seq("id_b"))
      .withColumn("jac", col("n_shared").cast("double") /
        (col("n_a") + col("n_b") - col("n_shared")))
      .filter(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"), col("jac"))
    if (ordered) out.orderBy("id_a", "id_b") else out
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
      sizes: DataFrame, threshold: Double, ordered: Boolean = true)
      : DataFrame = {
    val shared = cands
      .join(post.select(col("pid").as("id_a"), col("sh").as("sh_a")),
        Seq("id_a"))
      .join(post.select(col("pid").as("pid_b"), col("sh").as("sh_b")),
        col("id_b") === col("pid_b") && col("sh_a") === col("sh_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
    val verified = shared
      .join(sizes.select(col("pid").as("id_a"), col("n_sh").as("n_a")),
        Seq("id_a"))
      .join(sizes.select(col("pid").as("id_b"), col("n_sh").as("n_b")),
        Seq("id_b"))
      .withColumn("jac", col("n_shared").cast("double") /
        (col("n_a") + col("n_b") - col("n_shared")))
      .filter(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"), col("jac"))
    if (ordered) verified.orderBy("id_a", "id_b") else verified
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
      corpusPost: DataFrame, corpusSizes: DataFrame, threshold: Double,
      ordered: Boolean = true): DataFrame = {
    require(threshold > 0,
      "zero-intersection band collisions never reach the verify join")
    val cands = bandIndex.filter(size(col("cpids")) >= 2)
      .select(col("cpids"), posexplode(col("cpids")))
      .select(col("col").as("id_a"),
        explode(slice(col("cpids"), col("pos") + lit(2),
          size(col("cpids")))).as("id_b"))
      .dropDuplicates("id_a", "id_b")
    exactJaccardVerify(cands, corpusPost, corpusSizes, threshold,
      ordered)
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
  def dupClusters(pairs: DataFrame, allIds: DataFrame, idCol: String,
      ordered: Boolean = true): DataFrame =
    dupClustersWithRounds(pairs, allIds, idCol, ordered = ordered)._1

  /** Pair-count bound under which [[dupClusters]] takes the SMALL-GRAPH
    * path: exact min-label union-find over the whole edge list in ONE
    * executor task instead of the distributed pointer-jumping iteration
    * (round-18 optimization; guide §1.2 "the distributed algorithm" +
    * §2.4 "remove shuffles outright"). Rationale: each propagation
    * round costs three shuffles plus a count action, so converging a
    * delta of a few thousand edges pays ~10–15 tiny shuffle stages for
    * work one core finishes in milliseconds — the classic case for a
    * runtime strategy dispatch (the same philosophy as AQE's
    * sort-merge→broadcast rewrite, or this repo's own CMS-planned join
    * q230). At 1M pairs the single task holds ≤ 2M (id → label) map
    * entries (~tens of MB in a primitive-keyed map) — comfortably
    * inside one task, far below what would justify a 3-shuffle round
    * trip per iteration. At 100 TB the dup-subgraph delta exceeds the
    * bound and the iterative path runs unchanged; both paths produce
    * IDENTICAL labels (component min-id; DedupSpec equivalence test).
    * Env override SPARK_GRAFT_LOCAL_CC_MAX_PAIRS (0 disables — the
    * convergence spec forces the iterative path this way). */
  private[ext] val LocalCcMaxPairs: Long =
    sys.env.get("SPARK_GRAFT_LOCAL_CC_MAX_PAIRS").map(_.toLong)
      .getOrElse(1000000L)

  /** Exact min-label union-find over one partition's edge iterator —
    * the small-graph kernel of [[dupClustersWithRounds]]. Union-by-min
    * (the smaller root always wins) with path compression, so the final
    * root of every node IS its component's minimum id — exactly the
    * fixpoint the propagation iteration converges to. Emits one
    * (id, cluster) row per edge-incident node. */
  private def unionFindLabels(it: Iterator[(Long, Long)])
      : Iterator[(Long, Long)] = {
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x0: Long): Long = {
      var x = x0
      while (parent(x) != x) {
        val p = parent(x); val gp = parent(p)
        parent(x) = gp // path halving
        x = gp
      }
      x
    }
    it.foreach { case (a, b) =>
      if (!parent.contains(a)) parent(a) = a
      if (!parent.contains(b)) parent(b) = b
      val ra = find(a); val rb = find(b)
      if (ra < rb) parent(rb) = ra
      else if (rb < ra) parent(ra) = rb
    }
    // keys snapshot first: find() compresses paths (mutates values),
    // and mutating a LongMap while iterating it is undefined
    val ids = parent.keys.toArray
    ids.iterator.map(id => (id, find(id)))
  }

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
    * convergence-rate spec; the small-graph union-find path reports 0
    * rounds). `localMaxPairs` parameterizes the strategy dispatch —
    * [[LocalCcMaxPairs]] by default, 0 to force the iterative path
    * (spec use). The dispatch count is one action over the (lazily
    * checkpointed) pair frame; both paths then read the checkpointed
    * blocks, so the possibly-expensive pairs pipeline still evaluates
    * exactly once. Ids must be bigint for the local kernel (every
    * production id here is); any other type falls through to the
    * iterative path unchanged. */
  private[ext] def dupClustersWithRounds(pairs: DataFrame,
      allIds: DataFrame, idCol: String,
      localMaxPairs: Long = LocalCcMaxPairs,
      ordered: Boolean = true): (DataFrame, Int) = {
    import org.apache.spark.sql.types.LongType
    val raw = pairs.select(col("id_a"), col("id_b"))
    val longIds = raw.schema.fields.forall(_.dataType == LongType) &&
      allIds.schema(idCol).dataType == LongType
    if (localMaxPairs > 0 && longIds) {
      // one evaluation of the pairs pipeline feeds the dispatch count
      // AND whichever path wins
      val rawCk = raw.localCheckpoint(eager = false)
      if (rawCk.count() <= localMaxPairs) {
        val spark = rawCk.sparkSession
        import spark.implicits._
        val labels = rawCk.as[(Long, Long)]
          .coalesce(1) // single task over the checkpointed blocks —
                       // bounded by localMaxPairs, never driver-side
          .mapPartitions(unionFindLabels)
          .toDF("id", "cluster")
          .localCheckpoint(eager = false) // consumed by anti-join + union
        val singletons = allIds.select(col(idCol).as("id"))
          .join(labels.select(col("id")), Seq("id"), "left_anti")
          .select(col("id"), col("id").as("cluster"))
        val out = labels.union(singletons)
          .select(col("id").as(idCol), col("cluster"))
        // ordered=false (round 19): SCRATCH builds and the maintenance
        // internals (merge mapping, affected-subgraph relabel) never
        // read row order — skip the range sort. LAZY checkpoint (was
        // eager): nothing here needs an early materialization barrier
        // (unlike the iterative path, whose caches are unpersisted in
        // its finally) — the blocks materialize inside the first
        // consumer's job, one scheduler round-trip fewer per call.
        return ((if (ordered) out.orderBy(idCol) else out)
          .localCheckpoint(eager = false), 0)
      }
      // over the bound: fall through, reusing the materialized blocks
      return iterativeDupClusters(rawCk, allIds, idCol, ordered)
    }
    iterativeDupClusters(raw, allIds, idCol, ordered)
  }

  /** The distributed pointer-jumping iteration — the 100 TB path of
    * [[dupClustersWithRounds]], unchanged semantics. */
  private def iterativeDupClusters(pairs: DataFrame,
      allIds: DataFrame, idCol: String,
      ordered: Boolean = true): (DataFrame, Int) = {
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
    // EAGER checkpoint, deliberately: the finally below unpersists the
    // caches this lineage references, so the result must materialize
    // before this call returns
    val out = labels.select(col("id"), col("cluster")).union(singletons)
      .select(col("id").as(idCol), col("cluster"))
    ((if (ordered) out.orderBy(idCol) else out)
      .localCheckpoint(eager = true), rounds)
    } finally { // caches must not outlive the call, even on failure
      if (cached != null) cached.unpersist()
      edges.unpersist()
    }
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
      maxHamming: Int, ordered: Boolean = true): DataFrame = {
    val cands = sliceIndex.filter(size(col("cpids")) >= 2)
      .select(col("cpids"), posexplode(col("cpids")))
      .select(col("col").as("id_a"),
        explode(slice(col("cpids"), col("pos") + lit(2),
          size(col("cpids")))).as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val out = cands
      .join(fps.select(col("pid").as("id_a"), col("fp").as("fa")),
        Seq("id_a"))
      .join(fps.select(col("pid").as("id_b"), col("fp").as("fb")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("fa").bitwiseXOR(col("fb"))).cast("int")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
    if (ordered) out.orderBy("id_a", "id_b") else out
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

}
