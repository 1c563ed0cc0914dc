package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine._
import graft.engine.Aggregates._
import graft.ext._

/** [[ExtQueries]] query definitions q25-q91 — split out of the
  * monolith (round-12 verdict item 6), zero behavior change;
  * the registry stays in [[ExtQueries]].
  */
private[graft] trait ExtQueriesQ025 extends ExtQueriesShared {
  /** q25 — Pearson correlation re-homed distributed
    * (`Preprocessing.py:774-798`), exact-decimal sums, rounded 6dp. */
  private[graft] val q25: Q = (s, d) =>
    Tables.lineitem(s, d).groupBy("l_returnflag")
      .agg(round(corrExact(col("l_quantity"), col("l_extendedprice")), 6)
        .as("corr_qty_price"))
      .orderBy("l_returnflag")

  /** q26 — token counting: whitespace + BPE-ish (§7.4 text). */
  private[graft] val q26: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_tok"),
        TextOps.bpeishTokenCount(col("text")).as("n_bpeish"))
      .orderBy("doc_id")

  /** q27 — quality scoring: length/punct/stopword ratios (§7.4 text). */
  private[graft] val q27: Q = (s, d) =>
    TextOps.withQualityFeatures(Tables.documents(s, d), "text")
      .select(col("doc_id"), col("q_chars"), col("q_tokens"),
        col("q_stop"), col("avg_token_len"), col("stop_ratio"))
      .orderBy("doc_id")

  /** q28 — language-ID heuristic: marker-count argmax, then a confusion
    * table against the labeled lang column. */
  private[graft] val q28: Q = (s, d) =>
    TextOps.withLangId(Tables.documents(s, d), "text", "doc_id",
      keep = Seq("lang"))
      .groupBy("lang", "lang_pred")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "lang_pred")

  /** q29 — document fingerprints: order-sensitive rolling hash + 30-bit
    * SimHash (see [[graft.ext.Dedup.SimhashBits]]), both oracle-replicable
    * (§7.4 text/dedup). */
  private[graft] val q29: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        TextOps.docFingerprint(col("text")).as("fp"),
        Dedup.simhash32(col("text")).as("simhash"))
      .orderBy("doc_id")

  /** q30 — exact dedup accounting over full text (§7.4 dedup). */
  private[graft] val q30: Q = (s, d) =>
    Tables.documents(s, d)
      .agg(count(lit(1)).as("n_total"),
        countDistinct(col("text")).as("n_distinct"))

  /** q31 — n-gram Jaccard near-dup pairs via inverted-index join
    * (§7.4 dedup; never |docs|², and the df-cap bounds the hot-shingle
    * self-join quadratic — the cap is mirrored in the oracle, so the
    * result stays hash-checked whether or not the cap binds). */
  private[graft] val q31: Q = (s, d) =>
    Dedup.jaccardPairs(Tables.documents(s, d), "doc_id", "text",
      k = 3, threshold = 0.1, maxDf = 100)

  /** q32 — MinHash + LSH banding near-dup candidates, Jaccard-verified
    * (§7.4 dedup; the 100 TB path). */
  private[graft] val q32: Q = (s, d) =>
    Dedup.minhashBandPairs(Tables.documents(s, d), "doc_id", "text",
      k = 3, numHashes = 12, rowsPerBand = 3, threshold = 0.05)

  /** q33 — exact brute-force top-k cosine ANN baseline (§7.4 simsearch). */
  private[graft] val q33: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    SimSearch.bruteForceTopK(emb, emb.filter(col("vec_id") < 3), k = 5)
  }

  /** q34 — LSH-bucketed approximate ANN (§7.4 simsearch scale path). */
  private[graft] val q34: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    SimSearch.lshTopK(emb, emb.filter(col("vec_id") < 3), k = 5, bits = 4)
  }

  /** q49 — IVF ANN (KMeans coarse quantizer, nProbe cells per query).
    * The neighbor SET is seeded-but-partitioning-sensitive (MLlib KMeans
    * init), so the ORACLE-CHECKED output is the index's CONTRACT (the
    * q43/q56 pattern): per query, recall@5 against the exact brute-force
    * top-k (the fully oracle-checked q33) of at least 2/5 — nProbe=4 of
    * 8 cells always includes the query's own cell, so this floor holds
    * for any KMeans outcome the spec's recall assertions admit
    * (SimSearchSpec pins full-probe == exact and partial-probe
    * recall > 0.3). */
  private[graft] val q49: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val queries = emb.filter(col("vec_id") < 3)
    val ivf = SimSearch.ivfTopK(emb, queries, k = 5,
      nClusters = 8, nProbe = 4)
    SimSearch.bruteForceTopK(emb, queries, k = 5)
      .join(ivf.select(col("q_id"), col("n_id"), lit(1L).as("hit")),
        Seq("q_id", "n_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("k"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .select(col("q_id"), col("k"),
        (col("n_hit") >= 2).as("recall_ok"))
      .orderBy("q_id")
  }

  /** q35 — embedding-cosine near-dup pairs with blocking (§7.4 dedup). */
  private[graft] val q35: Q = (s, d) =>
    SimSearch.cosineNearDupPairs(Tables.embeddings(s, d), threshold = 0.35)

  /** q36 — tumbling event-time window (batch form of the streaming
    * aggregation; equality with the watermarked stream is test-asserted). */
  private[graft] val q36: Q = (s, d) =>
    graft.streaming.StreamingOps.tumblingCounts(Tables.events(s, d))

  /** q37 — sliding window (10 min window, 5 min slide). */
  private[graft] val q37: Q = (s, d) =>
    graft.streaming.StreamingOps.slidingCounts(Tables.events(s, d))

  /** q38 — session windows (30-minute gap) per user. */
  private[graft] val q38: Q = (s, d) =>
    graft.streaming.StreamingOps.sessionCounts(Tables.events(s, d))

  /** q39 — JSON property extraction (events.props → typed column). */
  private[graft] val q39: Q = (s, d) =>
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .orderBy("event_type")

  /** q40 — multimodal plumbing: opaque binary payload column + typed
    * metadata extraction (§7.4 multimodal; the media tables proper
    * carry REAL WAV containers — see graft.ext.Multimodal). */
  private[graft] val q40: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .select(col("doc_id"),
        length(col("payload")).as("n_bytes"),
        ascii(col("text")).as("head_code"))
      .orderBy("doc_id")

  /** q41 — ML class-weight statistics (M4, `XGBoost.py:247-257`):
    * inverse-frequency clipped to [0.1, 5.0] — DataFrame-native. */
  private[graft] val q41: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val p = Tables.part(s, d)
    val labeled = li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .withColumn("category", Features.category4(col("p_type")))
    val counts = labeled.groupBy("category").agg(count(lit(1)).as("n"))
    val total = lit(4.0) // n_classes
    counts
      .withColumn("weight",
        least(lit(5.0), greatest(lit(0.1),
          sum(col("n")).over() / (total * col("n")))))
      .select(col("category"), col("n"), round(col("weight"), 6).as("weight"))
      .orderBy("category")
  }

  /** q42 — stratified sample (one-pass sampleBy, `Preprocessing.py:423-427`
    * upgraded). The sampled count is seed- AND partitioning-dependent, so
    * the ORACLE-CHECKED output is the sampler's CONTRACT (the q43/q56
    * pattern): each stratum's Bernoulli sample size lands within ±6σ of
    * its binomial expectation N·p (σ = √(N·p·(1−p)); violation odds
    * ~1e-9 per stratum — treated as a hard bound; the +1 absorbs the
    * discrete tail at tiny N), alongside the exact stratum totals. The
    * fully deterministic sampler counterpart is q89. */
  private[graft] val q42: Q = (s, d) => {
    val p = 0.01
    val li = Tables.lineitem(s, d)
    val sampled = Sampling.stratified(li, "l_returnflag",
        Map("A" -> p, "N" -> p, "R" -> p), seed = 42)
      .groupBy("l_returnflag").agg(count(lit(1)).as("n_sample"))
    li.groupBy("l_returnflag").agg(count(lit(1)).as("n_total"))
      .join(sampled, Seq("l_returnflag"), "left")
      .select(col("l_returnflag"), col("n_total"),
        (abs(coalesce(col("n_sample"), lit(0L)) - col("n_total") * p) <=
          sqrt(col("n_total") * p * (1 - p)) * 6 + 1).as("within_6sigma"))
      .orderBy("l_returnflag")
  }

  /** q43 — approx median (GK sketch, the reference's actual scale choice,
    * `Preprocessing.py:145-147`). The sketch value is engine-specific,
    * so the ORACLE-CHECKED output is the sketch's CONTRACT: the estimate
    * must land inside the exact [P48, P52] band (ε=0.01 at accuracy 100,
    * band doubled to absorb interpolated-vs-element quantiles) — the
    * oracle asserts `within_band = true` plus the exact median. */
  private[graft] val q43: Q = (s, d) =>
    Tables.lineitem(s, d).groupBy("l_returnflag")
      .agg(round(percentile(col("l_quantity"), lit(0.5)), 6)
          .as("med_exact"),
        percentile_approx(col("l_quantity"), lit(0.5), lit(100))
          .as("approx"),
        percentile(col("l_quantity"), lit(0.48)).as("lo"),
        percentile(col("l_quantity"), lit(0.52)).as("hi"))
      .select(col("l_returnflag"), col("med_exact"),
        (col("approx") >= col("lo") && col("approx") <= col("hi"))
          .as("within_band"))
      .orderBy("l_returnflag")

  /** q44 — running-total window frame (rows unbounded-preceding → current),
    * fully tie-broken ordering; prefix sums over exact decimals are
    * order-deterministic. */
  private[graft] val q44: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_suppkey")
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.lineitem(s, d)
      .filter(col("l_suppkey") <= 5)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        sum(col("l_quantity").cast("decimal(18,2)")).over(w)
          .cast("double").as("running_qty"))
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
  }

  /** q45 — SQL frontend surface: the same engine via `spark.sql` over temp
    * views (TPC-H Q1 shape with exact-decimal aggregates). */
  private[graft] val q45: Q = (s, d) => {
    Tables.lineitem(s, d).createOrReplaceTempView("v_lineitem")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(count(*) AS BIGINT) AS count_order
        |FROM v_lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  /** q50 — custom AS-OF JOIN operator (graft.plans.AsOfJoinExec): each
    * purchase event joined to the user's most recent prior click. Right
    * side is (key, time)-unique by pre-aggregation so results are
    * engine-deterministic. */
  private[graft] val q50: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id").as("c_user"), col("ts").as("click_ts"))
      .agg(count(lit(1)).as("n_clicks"))
    graft.plans.AsOf.join(purchases, clicks,
      ("user_id", "c_user"), ("ts", "click_ts"))
      .select(col("event_id"), col("user_id"), col("click_ts"),
        col("n_clicks"))
      .orderBy("event_id")
  }

  /** q51 — CUBE over two keys (grouping-set breadth beyond q10's rollup). */
  private[graft] val q51: Q = (s, d) =>
    Tables.lineitem(s, d).cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** q52 — scalar string function breadth (F3 extension surface):
    * lower/upper/trim/substring/regexp_extract/length/concat. */
  private[graft] val q52: Q = (s, d) =>
    Tables.part(s, d).select(
        col("p_partkey"),
        lower(col("p_brand")).as("brand_lc"),
        upper(col("p_type")).as("type_uc"),
        length(col("p_name")).as("name_len"),
        regexp_extract(col("p_name"), "^[a-z]+", 0).as("first_word"),
        substring(col("p_name"), 1, 3).as("name_pfx"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy("p_partkey")

  /** q53 — lag/lead window: inter-event gap per user in microseconds. */
  private[graft] val q53: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
      .select("event_id", "user_id", "gap_us")
      .orderBy("event_id")
  }

  /** q54 — multimodal feature extraction through the mapPartitions batch
    * path (§7.4 multimodal; the payload is a REAL WAV container and the
    * features compute over the REALLY-decoded samples — graft.functions
    * .WavCodecUtil's chunk-walking parser). The float histogram features
    * are projected back to exact integer byte-bin counts
    * (count = round(freq · n_bytes), exact because the float only ever
    * encodes count/total), so the output is scalar-only AND the DuckDB
    * oracle can recompute it byte-for-byte from the hex of the CONTENT
    * bytes (bin index of a byte = its high hex nibble) — decode strips
    * the container, so the oracle never sees header bytes. */
  private[graft] val q54: Q = (s, d) => {
    val media = Multimodal.mediaTable(Tables.documents(s, d))
    Multimodal.extractFeatures(s, media).toDF()
      .select(col("doc_id"), col("media_type"), col("n_bytes"),
        posexplode(col("features")).as(Seq("bin", "freq")))
      .select(col("doc_id"), col("media_type"), col("n_bytes"), col("bin"),
        round(col("freq").cast("double") *
          greatest(col("n_bytes"), lit(1)), 0).cast("long").as("n_in_bin"))
      .orderBy("doc_id", "bin")
  }

  /** q55 — duplicate clusters: connected components over the q31 near-dup
    * pair graph via iterative min-label propagation (the dedup end-game:
    * pairs → clusters → canonical doc per cluster). q55 is the OWNER of
    * the shared cluster scratch table ([[sharedClusters]]): its measured
    * cost includes the full pair→cluster compute plus the parquet
    * materialization that q88/q108/q125 then read. */
  private[graft] val q55: Q = (s, d) =>
    sharedClusters(s, d).orderBy("doc_id")

  /** q56 — mergeable HLL sketches (Datasketches, Spark 3.5+): per-type
    * distinct-user sketches merged into a global estimate — THE 100 TB
    * distinct-count pattern (sketches union across partitions/days
    * without re-scanning). Sketch binaries/estimates are
    * engine-specific, so the ORACLE-CHECKED output is the accuracy
    * CONTRACT: each estimate (including the merged `__all__` row) within
    * 10% (≈6σ at lgK 12 — treated as a hard bound; the 3σ 5% band the
    * sketch nominally quotes has a real, if small, flake probability on
    * other fixtures) of the exact distinct count — the oracle asserts
    * `within_10pct = true` plus the exact counts. */
  private[graft] val q56: Q = (s, d) => {
    val ev = Tables.events(s, d)
    // materialized once: both union branches consume it, and plan reuse
    // would otherwise run the countDistinct expand/shuffle twice
    val perType = ev.groupBy("event_type")
      .agg(hll_sketch_agg(col("user_id")).as("sk"),
        countDistinct(col("user_id")).as("exact_distinct"))
      .localCheckpoint(true)
    val typed = perType.select(col("event_type"), col("exact_distinct"),
      hll_sketch_estimate(col("sk")).as("est"))
    val merged = perType
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .withColumn("event_type", lit("__all__"))
      .crossJoin(broadcast(
        ev.agg(countDistinct(col("user_id")).as("exact_distinct"))))
      .select(col("event_type"), col("exact_distinct"), col("est"))
    typed.unionByName(merged)
      .select(col("event_type"), col("exact_distinct"),
        (abs(col("est") - col("exact_distinct")) <=
          col("exact_distinct") * 0.10).as("within_10pct"))
      .orderBy("event_type")
  }

  /** q57 — TF-IDF over documents as exploded (doc_id, term_hash, tf, w)
    * rows with the MLlib IDF formula, fully oracle-checked (the MLlib
    * HashingTF+IDF pipeline variant lives in [[TextOps.tfidf]], invariants
    * pinned in TfIdfSpec — its murmur3 hashing and vector UDT output are
    * not oracle-replicable, this relational form is). */
  private[graft] val q57: Q = (s, d) =>
    TextOps.tfidfRelational(Tables.documents(s, d), "doc_id", "text")
      .orderBy("doc_id", "term_hash")

  /** q58 — spark.ml MinHashLSH near-dup CONTRACT (was rows-only): the
    * MLlib surface is seeded but its murmur3/coefficient internals are
    * not oracle-replicable, so the gate now checks the index's CONTRACT
    * (the q42/q43/q49 pattern), computed IN-ENGINE against the exact
    * relational formulation and reduced to oracle-predictable counts:
    *  - `soundness_violations` (= 0): every reported pair's EXACT
    *    shingle-set Jaccard clears threshold − 0.05 (the slack is the
    *    2^18-feature HashingTF collision gap between hashed-set and
    *    true-set Jaccard — collisions only merge features);
    *  - `exact_dup_recall_misses` (= 0): documents with IDENTICAL
    *    shingle sets hash to identical vectors, share every band, and
    *    are returned at distance 0 for ANY seed — pigeonhole, the one
    *    recall statement MinHashLSH makes deterministically;
    *  - `exact_dup_pairs` (> 0, star pairing min-id↔other, Σ(n−1) over
    *    identical-shingle-set groups): data-derived and recomputed
    *    independently by the DuckDB oracle, so the recall check is
    *    provably non-vacuous on this corpus.
    * The identical-set group key is sha2(chr(1)-joined sorted shingles)
    * — the 100 TB shape (the shuffle carries 32 bytes, not the shingle
    * array); fixture text is whitespace-tokenized so the delimiter
    * cannot occur inside a shingle. Hand-rolled oracle-checked LSH
    * formulations: q32 (banding), q101 (prefix filter). */
  private[graft] val q58: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val pairs = Dedup.minhashLshMl(docs, "doc_id", "text",
        k = 3, numHashTables = 8, threshold = 0.3)
      .select(col("id_a"), col("id_b"))
      .localCheckpoint(true) // read twice: soundness + recall anti-join
    val sh = docs.select(col("doc_id"),
      Dedup.shingleHashes(col("text"), 3).as("shs"))
    val inter = size(array_intersect(col("sa"), col("sb")))
    val nViol = pairs
      .join(sh.select(col("doc_id").as("id_a"), col("shs").as("sa")),
        Seq("id_a"))
      .join(sh.select(col("doc_id").as("id_b"), col("shs").as("sb")),
        Seq("id_b"))
      .filter(inter.cast("double") /
        (size(col("sa")) + size(col("sb")) - inter) < 0.3 - 0.05)
      .agg(count(lit(1)).as("n"))
    val distinctShs = array_distinct(Dedup.shingleStrings(col("text"), 3))
    val grp = docs.select(col("doc_id"),
        sha2(concat_ws("\u0001", sort_array(distinctShs)), 256).as("k"),
        size(distinctShs).as("nsh"))
      .filter(col("nsh") > 0).select("doc_id", "k")
    val mins = grp.groupBy("k").agg(min(col("doc_id")).as("id_a"))
    val expPairs = grp.join(mins, "k")
      .filter(col("doc_id") =!= col("id_a"))
      .select(col("id_a"), col("doc_id").as("id_b"))
      .localCheckpoint(true) // read twice: count + anti-join
    val nExp = expPairs.agg(count(lit(1)).as("n"))
    val nMissed = expPairs
      .join(pairs, Seq("id_a", "id_b"), "left_anti")
      .agg(count(lit(1)).as("n"))
    nExp.select(lit("exact_dup_pairs").as("check"), col("n"),
        (col("n") > 0).as("pass"))
      .unionAll(nMissed.select(
        lit("exact_dup_recall_misses").as("check"), col("n"),
        (col("n") === 0).as("pass")))
      .unionAll(nViol.select(
        lit("soundness_violations").as("check"), col("n"),
        (col("n") === 0).as("pass")))
      .orderBy("check")
  }

  /** q59 — video-style frame sampling over binary payloads AT THE
    * CONTAINER OFFSET: the validating chunk walk locates the data span
    * and every frame substrings the container directly — frames are
    * still positions in the CONTENT (the span offset un-shears the
    * header width) but the full decoded copy the r13 plan materialized
    * per row is gone (its decode pass was q59's whole 2.9× regression;
    * MultimodalSpec pins row-set equality with the decode-first plan).
    * Tiling metadata is deterministic and oracle-checked. */
  private[graft] val q59: Q = (s, d) =>
    Multimodal.sampleFramesInContainer(
      Multimodal.mediaTable(Tables.documents(s, d)),
      frameBytes = 64, stride = 2)
      .select(col("doc_id"), col("frame_idx"), col("frame_bytes"))
      .orderBy("doc_id", "frame_idx")

  /** q60 — LSH-blocked embedding near-dup pairs (the 100 TB blocking form
    * of q35); deterministic hyperplanes make even the LSH stage
    * oracle-checkable. bits=16 keeps expected bucket occupancy O(1) at
    * this corpus size (2^16 buckets ≥ n) so the within-bucket all-pairs
    * join stays bounded; 4 OR-amplified tables buy back the recall that
    * 16 AND-ed bits alone would lose. */
  private[graft] val q60: Q = (s, d) =>
    SimSearch.cosineNearDupPairsLsh(Tables.embeddings(s, d),
      threshold = 0.25, bits = 16, tables = 4)

  /** q61 — grouping_id over rollup: distinguishes "null because subtotal"
    * from "null data" (the correctness-bearing companion of q10). */
  private[graft] val q61: Q = (s, d) =>
    Tables.lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** q62 — rank-family windows: rank / dense_rank / percent_rank / ntile
    * over per-supplier revenue. */
  private[graft] val q62: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("revenue").desc, col("l_suppkey"))
    Tables.lineitem(s, d)
      .groupBy("l_suppkey")
      .agg(sumExact6(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .select(col("l_suppkey"), col("revenue"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        round(percent_rank().over(w), 9).as("prnk"),
        ntile(4).over(w).as("quartile"))
      .orderBy("l_suppkey")
  }

  /** q63 — deterministic array aggregation: sorted collect_list /
    * collect_set (Spark's collect order is nondeterministic — sort_array
    * restores engine-independent results). Output arrays are serialized
    * with array_join so every result column is a sortable scalar — the
    * driver's comparator cannot sort raw array columns. */
  private[graft] val q63: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_suppkey") <= 3)
      .groupBy("l_suppkey")
      .agg(sort_array(collect_set(col("l_returnflag"))).as("flags_arr"),
        sort_array(collect_list(col("l_linenumber"))).as("linenos"))
      .select(col("l_suppkey"),
        array_join(col("flags_arr"), ",").as("flags"),
        array_join(transform(slice(col("linenos"), 1, 20),
          x => x.cast("string")), ",").as("linenos_head"))
      .orderBy("l_suppkey")

  /** q64 — JSON → typed MapType: from_json over events.props, map_keys /
    * element access (the F3/json extension surface beyond q39's
    * get_json_object). */
  private[graft] val q64: Q = (s, d) =>
    Tables.events(s, d)
      .withColumn("m", from_json(col("props"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.IntegerType)))
      .select(col("event_id"),
        size(map_keys(col("m"))).as("n_keys"),
        col("m")("k").as("k_val"))
      .orderBy("event_id")

  /** q65 — date/time arithmetic: datediff, date_add, months_between,
    * last_day, trunc (F1 breadth). */
  private[graft] val q65: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        datediff(lit("2002-01-01").cast("date"),
          col("o_orderdate").cast("date")).as("days_to_ref"),
        date_add(col("o_orderdate").cast("date"), 30).as("due_date"),
        round(months_between(lit("2002-01-01").cast("date"),
          col("o_orderdate").cast("date")), 6).as("months_to_ref"),
        last_day(col("o_orderdate").cast("date")).as("month_end"),
        trunc(col("o_orderdate").cast("date"), "quarter").as("quarter_start"))
      .orderBy("o_orderkey")

  /** q66 — INTERSECT ALL and EXCEPT ALL (bag semantics, vs q21/q22's set
    * semantics): multiplicity-preserving counts for both legs, tagged. */
  private[graft] val q66: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val a = li.filter(col("l_discount") > 0.08).select("l_partkey")
    val b = li.filter(col("l_quantity") > 40).select("l_partkey")
    val both = a.intersectAll(b)
      .groupBy("l_partkey").agg(count(lit(1)).as("n"))
      .withColumn("leg", lit("both"))
    val onlyA = a.exceptAll(b)
      .groupBy("l_partkey").agg(count(lit(1)).as("n"))
      .withColumn("leg", lit("only_a"))
    both.unionByName(onlyA)
      .select("leg", "l_partkey", "n")
      .orderBy("leg", "l_partkey")
  }

  /** q67 — array higher-order functions: filter / transform / exists /
    * aggregate over token arrays (the lambda surface itself, distinct from
    * the native-expression fast paths). */
  private[graft] val q67: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("toks", TextOps.tokens(col("text")))
      .select(col("doc_id"),
        size(filter(col("toks"), t => length(t) > 4)).as("n_long"),
        exists(col("toks"), t => t === "spark").cast("int").as("has_spark"),
        forall(col("toks"), t => length(t) > 0).cast("int").as("all_nonempty"),
        aggregate(transform(col("toks"), t => length(t).cast("long")),
          lit(0L), (acc, x) => acc + x).as("total_chars"))
      .orderBy("doc_id")

  /** q68 — pivot with a non-count aggregate (exact-decimal sum per cell). */
  private[graft] val q68: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sumExact(col("l_quantity")))
      .na.fill(0.0, Seq("F", "O"))
      .select(col("l_returnflag"), col("F").as("qty_F"),
        col("O").as("qty_O"))
      .orderBy("l_returnflag")

  /** q69 — unpivot (wide → long), the inverse of q11/q68. */
  private[graft] val q69: Q = (s, d) =>
    Tables.part(s, d)
      .unpivot(
        Array(col("p_partkey")),
        Array(col("p_size").cast("double").as("size"),
          col("p_retailprice").as("retail")),
        "measure", "val")
      .orderBy("p_partkey", "measure")

  /** q70 — RANGE window frame (value-based, vs q44's ROWS frame): sum of
    * quantities over all same-supplier rows within ±2 of this row's
    * quantity. */
  private[graft] val q70: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_suppkey").orderBy(col("l_quantity"))
      .rangeBetween(-2, 2)
    Tables.lineitem(s, d)
      .filter(col("l_suppkey") <= 5)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"),
        sum(col("l_quantity").cast("decimal(18,2)")).over(w)
          .cast("double").as("near_qty_sum"))
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
  }

  /** q71 — TPC-H Q3 (shipping priority): the canonical 3-way
    * join + date filters + top-k by revenue, exact-decimal aggregates. */
  private[graft] val q71: Q = (s, d) => {
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp_ntz"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sumExact6(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** q72 — correlated/scalar subquery via the SQL frontend: orders above
    * the exact global average price. */
  private[graft] val q72: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("v_orders")
    s.sql(
      """SELECT o_orderkey, o_totalprice FROM v_orders
        |WHERE o_totalprice > (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         / count(*) FROM v_orders)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** q73 — int8 embedding quantization (4× storage at 100 TB): per-vector
    * scale + code statistics, oracle-replicated bit-for-bit. */
  private[graft] val q73: Q = (s, d) =>
    Tables.embeddings(s, d)
      .withColumn("qs", SimSearch.quantizeInt8(col("embedding")))
      .select(col("vec_id"),
        col("qs.scale").as("scale"),
        aggregate(col("qs.q"), lit(0L),
          (acc, x) => acc + x.cast("long")).as("sum_q"),
        array_min(col("qs.q")).cast("int").as("min_q"),
        array_max(col("qs.q")).cast("int").as("max_q"))
      .orderBy("vec_id")

  /** q74 — multi-table OR-amplified LSH ANN (oracle-checked: deterministic
    * hyperplanes make every table's bucket replicable in SQL; recall vs
    * the exact baseline is additionally measured in SimSearchSpec;
    * single-table LSH is q34). */
  private[graft] val q74: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    SimSearch.lshTopKMulti(emb, emb.filter(col("vec_id") < 3),
      k = 5, bits = 4, tables = 4)
  }

  /** q75 — exact weighted median via the typed Aggregator (§7.3's one
    * deliberate UDAF); oracle replicates the lower-weighted-median with
    * range-frame cumulative weights. */
  private[graft] val q75: Q = (s, d) => {
    import s.implicits._
    val li = Tables.lineitem(s, d)
    li.select(col("l_returnflag"), col("l_quantity"),
        (lit(1.0) + col("l_discount")).as("w"))
      .as[(String, Double, Double)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(graft.functions.WeightedMedian.asColumn.name("wmed"))
      .toDF("l_returnflag", "wmed")
      .orderBy("l_returnflag")
  }

  /** q76 — CSV source scan (S1) over a crime-shaped file exercising the
    * reference's full ingest surface in one query: explicit string-first
    * schema, no inference (`Preprocessing.py:20,103-116`), stray embedded
    * header drop (D4, `Preprocessing.py:70`), sentinel→null
    * (`Preprocessing.py:60-64`), try-casts, and the 12-hour AM/PM
    * timestamp parse (F1, `XGBoost.py:80`). The fixture CSV ships in the
    * repo so the DuckDB oracle reads the exact same bytes; BOTH the Spark
    * side and the oracle SQL (dumped at Verify time) resolve the path via
    * SPARK_GRAFT_FIXTURES_DIR so non-standard checkouts stay consistent. */
  private[graft] val q76: Q = (s, _) => {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val schema = StructType(Seq("ID", "case_number", "date_str",
      "primary_type", "arrest", "district", "latitude")
      .map(StructField(_, StringType)))
    val raw = s.read.option("header", "true").schema(schema)
      .csv(s"$fixturesDir/crime_sample.csv")
    val cleaned = Cleaning.sentinelsToNull(
      Cleaning.dropStrayHeader(raw, "ID"),
      Seq("primary_type", "district", "latitude"), Seq("NULL"))
    cleaned.select(
        col("ID").cast("long").as("id"),
        col("primary_type"),
        (col("arrest") === "true").cast("int").as("arrest_i"),
        col("district").try_cast("int").as("district"),
        col("latitude").try_cast("double").as("latitude"),
        Cleaning.tryParseTimestamp(col("date_str"), "MM/dd/yyyy hh:mm:ss a")
          .cast("timestamp_ntz").as("ts"))
      .withColumn("hr", hour(col("ts")))
      .orderBy("id")
  }

  /** q77 — SimHash bit-slice banding near-dup pairs: pigeonhole-exact
    * recall for Hamming ≤ slices−1 (see Dedup.simhashNearDupPairs),
    * fully oracle-checked — fingerprint, slice keys, and Hamming verify
    * all replicate in SQL. Registered over a bounded doc subset (the
    * synthetic fixture's template docs share most tokens, so fingerprints
    * collapse and the FULL corpus has ~5M Hamming≤3 pairs at sf0.1 —
    * data-realistic for the operator, unhelpfully large for a hash-diffed
    * result dump; q44/q70 bound their outputs the same way). */
  private[graft] val q77: Q = (s, d) =>
    Dedup.simhashNearDupPairs(
      Tables.documents(s, d).filter(col("doc_id") < 200),
      "doc_id", "text", slices = 5, maxHamming = 3)

  /** q78 — token frequency top-k (the tokenizer-training / vocab-stats
    * staple): explode → hash-aggregate with map-side partial counts →
    * TakeOrdered. Fully tie-broken (count desc, token) so LIMIT is
    * deterministic. */
  private[graft] val q78: Q = (s, d) =>
    Tables.documents(s, d)
      .select(explode(TextOps.tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(50)

  /** q79 — bloom-pruned semi-join (the 100 TB join-pruning pattern): a
    * KB-scale bloom sketch of the filtered key side broadcasts and prunes
    * the fact rows BEFORE the exact semi-join verifies them, so the join
    * shuffle carries ~selectivity × |fact| rows instead of all of them.
    * Bloom false positives are removed by the verifying join ⇒ the result
    * is EXACT and the oracle is a plain IN-subquery (sketch internals
    * never reach the output). No false negatives is spec-asserted. */
  private[graft] val q79: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val hot = Tables.part(s, d).filter(col("p_size") >= 45)
      .select("p_partkey")
    val bf = graft.functions.Bloom.bloomOf(hot, "p_partkey", 1000L, 8192L)
    li.filter(graft.functions.Bloom.might_contain(bf, col("l_partkey")))
      .join(hot, li("l_partkey") === hot("p_partkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sumExact(col("l_quantity")).as("sum_qty"))
      .orderBy("l_returnflag")
  }

  /** q80 — Gopher-style quality rule flags ([[PipelineOps.qualityFlags]]):
    * the rule-based doc filter a pretraining build runs after scoring. */
  private[graft] val q80: Q = (s, d) =>
    PipelineOps.qualityFlags(Tables.documents(s, d), "text")
      .orderBy("doc_id")

  /** q81 — concat-then-chunk sequence packing into 512-token context
    * windows, partitioned by lang ([[PipelineOps.packSequences]]). */
  private[graft] val q81: Q = (s, d) =>
    PipelineOps.packSequences(Tables.documents(s, d), "text", "lang", 512L)
      .orderBy("lang", "doc_id")

  /** q82 — temperature-0.5 source mixture weights
    * ([[PipelineOps.mixtureWeights]]). */
  private[graft] val q82: Q = (s, d) =>
    PipelineOps.mixtureWeights(Tables.documents(s, d), "text", "source")

  /** q83 — band (interval) join with NO equi-key, bucketed to an
    * equi-join ([[graft.operators.BandJoin]]): lineitem unit price within
    * ±0.05 of a part's retail price; aggregated per brand. The oracle is
    * the plain BETWEEN non-equi join — the bucketing must be invisible in
    * the result. */
  private[graft] val q83: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
      .withColumn("unit_price", col("l_extendedprice") / col("l_quantity"))
      .select("l_orderkey", "l_linenumber", "unit_price")
    val p = Tables.part(s, d)
      .withColumn("lo", col("p_retailprice") - 0.05)
      .withColumn("hi", col("p_retailprice") + 0.05)
      .select("p_partkey", "p_brand", "p_retailprice", "lo", "hi")
    // two-level agg instead of count+countDistinct+sum in one: a mixed
    // distinct/non-distinct agg Expands every joined row ×2; aggregating
    // per (brand, partkey) first uses the same shuffles with no Expand,
    // and the second level runs over |part| rows, not |pairs|
    graft.operators.BandJoin.join(li, "unit_price", p, "lo", "hi", 0.1,
        bloomPrune = false) // interval side broadcasts at any SF here —
                            // the bloom pass only pays when the interval
                            // side is too big to broadcast (see BandJoin)
      .groupBy("p_brand", "p_partkey")
      .agg(count(lit(1)).as("c"),
        sum((col("unit_price") - col("p_retailprice"))
          .cast("decimal(38,6)")).as("s"))
      .groupBy("p_brand")
      .agg(sum(col("c")).as("n_pairs"),
        count(lit(1)).as("n_parts"),
        round(sum(col("s")).cast("double"), 4).as("sum_diff"))
      .orderBy("p_brand")
  }

  /** q84 — benchmark decontamination: 8-gram overlap of every corpus doc
    * against a held-out benchmark slice (doc_id ≡ 0 mod 50)
    * ([[PipelineOps.decontamination]]). */
  private[graft] val q84: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    PipelineOps.decontamination(
      docs.filter(col("doc_id") % 50 =!= 0),
      docs.filter(col("doc_id") % 50 === 0), "text", 8)
  }

  /** q85 — Gopher-style repetition signals
    * ([[PipelineOps.repetitionStats]]): duplicate-token and top-bigram
    * fractions per doc. */
  private[graft] val q85: Q = (s, d) =>
    PipelineOps.repetitionStats(Tables.documents(s, d), "text")

  /** q86 — PII detection + redaction ([[PipelineOps.piiScrub]]). The
    * synthetic corpus carries no PII, so a deterministic email / phone /
    * IPv4 suffix derived from doc_id is appended first (identically in
    * the oracle) — the regex extraction and layered redaction are what
    * is under test. */
  private[graft] val q86: Q = (s, d) => {
    val docs = Tables.documents(s, d).withColumn("text",
      concat(col("text"),
        lit(" contact u"), col("doc_id").cast("string"),
        lit("@ex"), (col("doc_id") % 7).cast("string"),
        lit(".org or +1-555-"),
        lpad(col("doc_id").cast("string"), 4, "0"),
        lit(" ip 10."), (col("doc_id") % 256).cast("string"),
        lit(".0.1")))
    PipelineOps.piiScrub(docs, "text").orderBy("doc_id")
  }

  /** q87 — JSONL (newline-delimited JSON) scan with explicit schema: the
    * canonical interchange format of LLM-data pipelines. Same
    * fixture-resolution discipline as q76 (one path shared with the
    * oracle); the schema is explicit, never inferred — at 100 TB schema
    * inference is a full extra pass over the data. */
  private[graft] val q87: Q = (s, _) => {
    val docs = s.read
      .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, " +
        "n_chars BIGINT")
      .json(s"$fixturesDir/docs_sample.jsonl")
    docs.select(col("doc_id"), col("lang"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tok"),
        col("n_chars"))
      .orderBy("doc_id")
  }

  /** q88 — the end-to-end curation pipeline a pretraining build runs,
    * composed from the engine's own operators: quality gate
    * ([[PipelineOps.qualityFlags]]) → near-dup clusters over the
    * survivors ([[Dedup.jaccardPairs]] + [[Dedup.dupClusters]]) →
    * canonical doc per cluster (min id) → per-source survivor counts and
    * token totals. One oracle checks the whole composition — the
    * strongest integration signal the DuckDB gate can give. */
  private[graft] val q88: Q = (s, d) => {
    // Pipeline order is DEDUP FIRST (global cluster canonicalization over
    // the full corpus via the shared cluster table), THEN the quality
    // gate on the surviving canonical docs — the order a production build
    // runs when the cluster table is a materialized intermediate shared
    // by every downstream consumer (rounds ≤3 ran quality→dedup, which
    // forced a private cluster iteration over the survivor subset; the
    // df-capped pair graph differs per subset, so that variant could
    // share nothing). Both orders are legitimate curation pipelines; this
    // one is the scale shape.
    val docs = Tables.documents(s, d)
    val canonical = sharedClusters(s, d)
      .filter(col("doc_id") === col("cluster")).select("doc_id")
    docs.join(canonical, Seq("doc_id"))
      .join(PipelineOps.qualityFlags(docs, "text")
        .filter(col("pass") === 1L).select("doc_id"), Seq("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(TextOps.tokenCount(col("text")).cast("long")).as("n_tok"))
      .orderBy("source")
  }

  /** q89 — deterministic per-source sample
    * ([[PipelineOps.deterministicSample]]): the reproducible (and
    * therefore oracle-checkable) counterpart of the seeded-RNG q42. */
  private[graft] val q89: Q = (s, d) =>
    PipelineOps.deterministicSample(Tables.documents(s, d), "doc_id",
        "source", 5)
      .orderBy("source", "rank")

  /** q90 — exact heavy hitters via a Misra–Gries prefilter
    * ([[graft.functions.MisraGriesAgg]]): pass 1 sketches the token
    * stream into ≤ k=64 candidates (O(k) memory per partial, mergeable);
    * pass 2 recounts ONLY the candidates (an `isin` literal filter —
    * map-side, no join) and keeps true count ≥ n/40. Exact because the
    * MG guarantee puts every item with frequency > n/(k+1) = n/65 in the
    * candidate set, and n/40 > n/65. The candidate list and n come to
    * the driver as one KB-scale row (same documented pattern as the
    * KMeans centroids). At 100 TB the sketch pass replaces the full
    * token-frequency shuffle of q78 with k counters per partition; k
    * must exceed 1/θ for threshold θ·n (here 65 > 40). */
  private[graft] val q90: Q = (s, d) => {
    val toks = Tables.documents(s, d)
      .select(explode(TextOps.tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
    val row = toks.agg(
      graft.functions.FreqItems.mg_candidates(col("tok"), 64).as("cands"),
      count(lit(1)).as("n")).head()
    val cands = row.getSeq[String](0)
    val n = row.getLong(1)
    toks.filter(col("tok").isin(cands: _*))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 40 >= lit(n))
      .orderBy(col("cnt").desc, col("tok"))
  }

  private[graft] val q91: Q = (s, d) => {
    val tmp = scratch("orc", d)
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_quantity", "l_returnflag")
      .write.mode("overwrite").orc(tmp)
    s.read.orc(tmp)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sumExact(col("l_quantity")).as("sum_qty"))
      .orderBy("l_returnflag")
  }
}
