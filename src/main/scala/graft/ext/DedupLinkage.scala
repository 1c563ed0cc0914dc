package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record-linkage and survivorship operators of the dedup surface —
  * edit-distance blocking (FastSS/symmetric-delete), sorted-
  * neighborhood candidate generation, cross-document span coverage,
  * and golden-record synthesis — mixed into [[Dedup]] (same API
  * surface, split out of the monolith per the round-12 verdict
  * item 6).
  */
private[graft] trait DedupLinkage { this: Dedup.type =>

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
    // explode_OUTER + isNotNull (not plain explode): the inferred
    // size(...) > 0 filter would re-build the whole L²-key deletion
    // neighborhood a second time per row — see
    // [[graft.ext.Multimodal.sampleFramesInContainer]] on the pattern
    //
    // round 19 (guide §2.3 shuffle keys-and-metadata, the
    // repeatedSpanCoverage precedent): the variant STRINGS never leave
    // the map side — an 8-byte xxhash64 shuffles, sorts and joins in
    // their place. A hash collision can only ADD a candidate pair
    // (recall is untouched), and the exact `levenshtein` verify below
    // discards it — the same false-positive tolerance the banding
    // operators already rely on.
    val keyed = named.select(col("eid"),
        explode_outer(transform(array_distinct(keys),
          v => xxhash64(v))).as("vkey"))
      .filter(col("vkey").isNotNull)
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
