package graft

import graft.ext.{Dedup, PipelineOps, TextOps}

/** DuckDB oracle SQL for every [[ExtQueries]] entry (split out of
  * ExtQueries in round 12 — the 5k-line oracle half of the old
  * monolith; strings moved VERBATIM so no hash can move). Each key's
  * SQL is the ANSI equivalent the driver runs over the same parquet
  * tables; column names/aliases match the Spark results exactly
  * (the driver's compare sorts columns by name before hashing).
  * Private helpers here are the SQL-side replicas of the engine's
  * kernels (polyHash, MinHash banding, blockhash, BPE rounds, …) —
  * the Scala-side twins live next to their queries in ExtQueries.
  */
object ExtOracles {
  private def fixturesDir: String = ExtQueries.fixturesDir

  private def sumExact6Sql(c: String): String =
    s"CAST(SUM(CAST($c AS DECIMAL(38,6))) AS DOUBLE)"

  /** DuckDB expression replicating TextOps.polyHash(expr). */
  private def polyHashSql(e: String): String =
    s"COALESCE(list_reduce(list_transform(string_split($e, ''), " +
      s"c -> CAST(ord(c) AS BIGINT)), (a, b) -> (a*31 + b) % 1000000007), 0)"

  /** DuckDB expression replicating TextOps.scrambledHash(expr) — the
    * ordering/uniform-draw form (see the Scala doc for why raw polyHash
    * must not drive an ordering). */
  private def scrambledHashSql(e: String): String =
    s"((${polyHashSql(e)} * 2654435761 + 12345) % 1000000007)"

  private val toksSql = "regexp_split_to_array(trim(text), '\\s+')"

  /** Rounds shared by q231 (merge table) and q232 (compression audit)
    * — the SAME literal must drive the Spark call and both oracles. */
  private val BpeRounds = 6

  /** Generated BPE-training CTE chain ([[TextOps.bpeMerges]] replica):
    * one block per round — parallel-unnest explode of the space-joined
    * symbol string, LEAD adjacent pairs, 1-row top pair (cnt DESC, a,
    * b), and the merge applied via the run-parity islands formulation
    * of left-to-right greedy pairing (provably the engine's array
    * fold: only a==b pairs form runs, and greedy takes the 1st/3rd/5th
    * match of each run). Every per-round CTE is MATERIALIZED — the
    * chain is iterative and DuckDB would otherwise inline it
    * exponentially (the q211/q201 lesson). Exposes t0..t{n-1} (the
    * learned merges) and s{n} (the final segmentation). */
  private def bpeCtePrefix(rounds: Int): String = {
    val roundCtes = (0 until rounds).map { r =>
      s"""e$r AS MATERIALIZED (
         |  SELECT word, freq,
         |    unnest(string_split(s, ' ')) AS sym,
         |    unnest(generate_series(1, len(string_split(s, ' '))))
         |      AS i
         |  FROM s$r),
         |l$r AS MATERIALIZED (
         |  SELECT word, freq, i, sym,
         |    LEAD(sym) OVER (PARTITION BY word ORDER BY i) AS nxt
         |  FROM e$r),
         |t$r AS MATERIALIZED (
         |  SELECT sym AS a, nxt AS b, SUM(freq) AS cnt
         |  FROM l$r WHERE nxt IS NOT NULL
         |  GROUP BY 1, 2 ORDER BY cnt DESC, a, b LIMIT 1),
         |g$r AS MATERIALIZED (
         |  SELECT l.word, l.freq, l.i, l.sym,
         |    (l.sym = t.a AND l.nxt = t.b) AS mt, t.a || t.b AS mg,
         |    CASE WHEN l.sym = t.a AND l.nxt = t.b THEN l.i -
         |      ROW_NUMBER() OVER (
         |        PARTITION BY l.word, l.sym = t.a AND l.nxt = t.b
         |        ORDER BY l.i) END AS grp
         |  FROM l$r l, t$r t),
         |sel$r AS MATERIALIZED (
         |  SELECT word, i FROM (
         |    SELECT word, i, ROW_NUMBER() OVER (
         |      PARTITION BY word, grp ORDER BY i) AS rn
         |    FROM g$r WHERE mt)
         |  WHERE rn % 2 = 1),
         |s${r + 1} AS MATERIALIZED (
         |  SELECT g.word, g.freq,
         |    string_agg(CASE WHEN s1.i IS NOT NULL THEN g.mg
         |      WHEN s2.i IS NOT NULL THEN NULL ELSE g.sym END,
         |      ' ' ORDER BY g.i) AS s
         |  FROM g$r g
         |  LEFT JOIN sel$r s1 ON g.word = s1.word AND g.i = s1.i
         |  LEFT JOIN sel$r s2 ON g.word = s2.word AND g.i = s2.i + 1
         |  GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    s"""v AS MATERIALIZED (
       |  SELECT tok AS word, count(*) AS freq
       |  FROM (SELECT unnest($toksSql) AS tok FROM documents)
       |  WHERE len(tok) > 0 GROUP BY 1),
       |s0 AS MATERIALIZED (
       |  SELECT word, freq,
       |    array_to_string(string_split(word, ''), ' ') AS s
       |  FROM v),
       |$roundCtes""".stripMargin
  }

  /** DuckDB expression for the distinct 3-shingle hash list. */
  private def shinglesSql(toks: String, k: Int): String =
    s"list_distinct(CASE WHEN len($toks) >= $k THEN " +
      s"list_transform(generate_series(1, len($toks) - ${k - 1}), " +
      s"i -> ${polyHashSql(s"array_to_string(list_slice($toks, i, i + ${k - 1}), ' ')")}) " +
      s"ELSE [] END)"

  private val stopList =
    "('the','a','an','and','or','of','to','in','is','it','on','for','with','as','at','by')"

  /** DuckDB replica of Dedup.simhash32 (30-bit vote fold over distinct
    * token hashes) — shared by the q29 and q77 oracles. */
  private val simhashSql: String =
    s"""COALESCE(list_reduce(list_transform(generate_series(0, 29),
       |    j -> CASE WHEN list_reduce(
       |           list_transform(list_distinct(list_transform($toksSql,
       |             w -> ${polyHashSql("w")})),
       |           h -> ((h >> j) & 1) * 2 - 1), (a, b) -> a + b) > 0
       |         THEN (CAST(1 AS BIGINT) << j) ELSE 0 END),
       |    (a, b) -> a + b), 0)""".stripMargin

  /** Sequential-fold dot product matching SimSearch.dot. */
  private def dotSql(a: String, b: String): String =
    s"COALESCE(list_reduce(list_transform(list_zip($a, $b), " +
      s"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y), 0.0)"

  /** BM25 CTE chain ending in `lexall(doc_id, bm25)` — the SQL twin of
    * `TextOps.bm25Scores` for the q100 query terms, shared by the q100
    * and q154 oracles. */
  private val bm25Ctes: String =
    s"""toks AS (
       |  SELECT did, tok FROM (
       |    SELECT doc_id AS did, unnest($toksSql) AS tok FROM documents)
       |  WHERE length(tok) > 0),
       |dl AS (SELECT did, count(*) AS dl FROM toks GROUP BY did),
       |corpus AS (SELECT count(*) AS n_docs,
       |  CAST(SUM(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
       |tf AS (SELECT did, tok, count(*) AS tf FROM toks
       |  WHERE tok IN ('join', 'hash', 'filter') GROUP BY did, tok),
       |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
       |s AS (
       |  SELECT tf.did,
       |    ln((corpus.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
       |      * tf.tf * 2.2
       |      / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / corpus.avgdl)) AS s
       |  FROM tf, dfreq, dl, corpus
       |  WHERE tf.tok = dfreq.tok AND tf.did = dl.did),
       |lexall AS (
       |  SELECT did AS doc_id,
       |    round(CAST(SUM(CAST(round(s, 9) AS DECIMAL(28,9))) AS DOUBLE), 6)
       |      AS bm25
       |  FROM s GROUP BY did)""".stripMargin

  private def cosineSql(a: String, b: String): String =
    s"CASE WHEN sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}) > 0 THEN " +
      s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})) END"

  private val langCase: String = {
    val langs = TextOps.langMarkers.toSeq.sortBy(_._1)
    def score(markers: Seq[String]) =
      s"len(list_filter($toksSql, w -> w IN (${markers.map("'" + _ + "'").mkString(",")})))"
    val maxExpr = langs.map { case (_, m) => score(m) }.mkString("greatest(", ", ", ")")
    val whens = langs.map { case (l, m) =>
      s"WHEN ${score(m)} = __max THEN '$l'"
    }.mkString(" ")
    s"(SELECT CASE WHEN __max = 0 THEN 'und' $whens END FROM (SELECT $maxExpr AS __max))"
  }

  /** q31's pair derivation as reusable CTE text (shared by q55's oracle):
    * df-capped postings (mirroring Dedup.jaccardPairs' maxDf — shingles in
    * more than `cap` docs leave the shingle universe, numerator AND
    * denominator) → inverted-index self-join → Jaccard ≥ threshold. */
  /** df-capped shingle candidate CTEs through `sizes` + `shared` — the
    * SQL twin of `Dedup.shingleCandidates`, shared by the q31-family
    * Jaccard oracles ([[pairCtes]]) and the q138 containment oracle. */
  /** The q237 blockhash near-dup pipeline as oracle SQL: 32-block
    * perceptual fingerprint from the payload bytes, 4×8-bit Hamming
    * slice banding, exact bit_count verify at ≤ 3. `extraWhere` ANDs
    * onto the final filter — q250 passes the batch-incidence predicate
    * (per-doc-deterministic fingerprints make the full recompute
    * filtered to incidence exactly the incremental contract). */
  /** The 32-block blockhash fingerprint derivation as oracle CTE text,
    * ending at `fp(pid, fp)` — shared by the pair oracles
    * ([[blockhashPairsSql]]) and the slice-index maintenance oracles
    * ([[fpIndexSql]], q251/q252). `docWhere` restricts the doc
    * universe (q252's retained-corpus rebuild). */
  private def blockhashFpCtes(docWhere: String = ""): String =
    s"""media AS (
       |  SELECT doc_id, encode(text) AS payload FROM documents$docWhere),
       |hx AS (
       |  SELECT doc_id, hex(payload) AS h,
       |         octet_length(payload) AS n
       |  FROM media),
       |bytes AS (
       |  SELECT doc_id, n, h, unnest(range(1, n + 1)) AS i
       |  FROM hx WHERE n > 0),
       |vals AS (
       |  SELECT doc_id, n, CAST(((i - 1) * 32) // n AS INT) AS blk,
       |    ('0x' || substring(h, CAST(2 * i - 1 AS INT), 2))::BIGINT AS v
       |  FROM bytes),
       |blk AS (
       |  SELECT doc_id, n, blk,
       |    CAST(sum(v) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS c
       |  FROM vals GROUP BY 1, 2, 3),
       |tot AS (
       |  SELECT doc_id, CAST(sum(s) AS BIGINT) AS ts
       |  FROM blk GROUP BY 1),
       |fp AS (
       |  SELECT b.doc_id AS pid,
       |    CAST(sum(CASE WHEN b.s * b.n > t.ts * b.c
       |             THEN (1::BIGINT << b.blk) ELSE 0 END) AS BIGINT)
       |      AS fp
       |  FROM blk b JOIN tot t USING (doc_id) GROUP BY 1
       |  UNION ALL
       |  SELECT doc_id, 0::BIGINT FROM hx WHERE n = 0)""".stripMargin

  /** Fresh slice-index rebuild as oracle SQL — the q251/q252 contract:
    * banded posting indexes are uncapped with per-payload-deterministic
    * keys, so BOTH maintenance directions must reproduce the fresh
    * rebuild over the post-maintenance doc set byte-identically. Same
    * canonical serialization as the Spark side's `fpIndexRows`. */
  private def fpIndexSql(docWhere: String = ""): String =
    s"""WITH ${blockhashFpCtes(docWhere)},
       |banded AS (
       |  SELECT pid, CAST(t.range AS INT) AS sl,
       |         (fp >> (CAST(t.range AS INT) * 8)) & 255 AS sv
       |  FROM fp, range(0, 4) t)
       |SELECT sl, sv,
       |  array_to_string(list(pid ORDER BY pid), ',') AS pids_str
       |FROM banded GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private def blockhashPairsSql(extraWhere: String = ""): String =
    s"""WITH ${blockhashFpCtes()},
       |banded AS (
       |  SELECT pid, fp, t.range AS sl,
       |         (fp >> (CAST(t.range AS INT) * 8)) & 255 AS sv
       |  FROM fp, range(0, 4) t),
       |cand AS (
       |  SELECT DISTINCT x.pid AS id_a, y.pid AS id_b,
       |         x.fp AS fa, y.fp AS fb
       |  FROM banded x JOIN banded y
       |    ON x.sl = y.sl AND x.sv = y.sv AND x.pid < y.pid)
       |SELECT id_a, id_b, hamming FROM (
       |  SELECT id_a, id_b,
       |         CAST(bit_count(xor(fa, fb)) AS INT) AS hamming
       |  FROM cand)
       |WHERE hamming <= 3$extraWhere ORDER BY id_a, id_b""".stripMargin

  /** `pre` prefixes every CTE name so two instantiations (e.g. the
    * q248 lifecycle oracle's corpus-universe and union-universe pair
    * sets) can coexist in one WITH chain; "" keeps the historical
    * names for all existing single-instance oracles. */
  private def candCtes(cap: Int, from: String = "documents",
      pre: String = ""): String =
    s"""${pre}sh AS (
       |  SELECT doc_id, ${shinglesSql(toksSql, 3)} AS shs FROM $from),
       |${pre}post0 AS (SELECT doc_id, unnest(shs) AS h FROM ${pre}sh),
       |${pre}keep AS (SELECT h FROM ${pre}post0 GROUP BY h
       |               HAVING count(*) <= $cap),
       |${pre}post AS (SELECT p.doc_id, p.h
       |               FROM ${pre}post0 p JOIN ${pre}keep USING (h)),
       |${pre}sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh
       |          FROM ${pre}post GROUP BY 1),
       |${pre}shared AS (
       |  SELECT x.doc_id AS id_a, y.doc_id AS id_b,
       |         CAST(count(*) AS BIGINT) AS n_shared
       |  FROM ${pre}post x JOIN ${pre}post y
       |    ON x.h = y.h AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2)""".stripMargin

  private def pairCtes(cap: Int, threshold: Double,
      from: String = "documents", pre: String = ""): String =
    s"""${candCtes(cap, from, pre)},
       |${pre}scored AS (
       |  SELECT id_a, id_b,
       |    CAST(n_shared AS DOUBLE) / (a.n_sh + b.n_sh - n_shared) AS jac
       |  FROM ${pre}shared JOIN ${pre}sizes a ON a.doc_id = id_a
       |              JOIN ${pre}sizes b ON b.doc_id = id_b),
       |${pre}pairs AS (SELECT id_a, id_b, jac FROM ${pre}scored
       |                WHERE jac >= $threshold)""".stripMargin

  /** Unrolled per-iteration CTEs for the q126 directed-PageRank oracle:
    * round i derives dm_i (dangling mass — 12-dp decimal sum of ranks
    * with no out-edges), inf_i (per-dest 12-dp decimal contribution sum)
    * and pr_i from pr_{i-1}, with the exact double-arithmetic shape of
    * [[GraphOps.pageRankDirected]] so iterates match bit-for-bit. */
  private def directedPrRounds(iters: Int): String =
    (1 to iters).map { i =>
      val p = s"pr${i - 1}"
      s"""dm$i AS (
         |  SELECT COALESCE(SUM(CAST(round(p.rank, 12) AS DECIMAL(28,12))),
         |    CAST(0 AS DECIMAL(28,12))) AS dm
         |  FROM $p p LEFT JOIN odeg o ON o.src = p.id
         |  WHERE o.src IS NULL),
         |inf$i AS (
         |  SELECT e.dst AS id,
         |    CAST(SUM(CAST(round(p.rank / e.deg, 12) AS DECIMAL(28,12)))
         |      AS DOUBLE) AS inflow
         |  FROM $p p JOIN de e ON p.id = e.src GROUP BY 1),
         |pr$i AS (
         |  SELECT n.id,
         |    round((CAST(1.0 AS DOUBLE) - 0.85) / nn.n
         |      + 0.85 * (COALESCE(i.inflow, CAST(0.0 AS DOUBLE))
         |        + CAST(d.dm AS DOUBLE) / nn.n), 9) AS rank
         |  FROM nodes n CROSS JOIN nn CROSS JOIN dm$i d
         |  LEFT JOIN inf$i i ON i.id = n.id)""".stripMargin
    }.mkString(",\n")

  /** DuckDB replica of SimSearch.lshBucket for `bits` hyperplanes starting
    * at `planeOffset` (table t of a multi-table scheme uses offset
    * t·bits, mirroring SimSearch.lshTopKMulti / cosineNearDupPairsLsh). */
  private def lshBucketSql(emb: String, bits: Int,
      planeOffset: Int = 0): String =
    (0 until bits).map { b =>
      val p = planeOffset + b
      val proj = s"COALESCE(list_reduce(list_transform(" +
        s"list_zip($emb, generate_series(0, len($emb) - 1)), " +
        s"x -> CAST(x[1] AS DOUBLE) * " +
        s"(((${p.toLong * 2654435761L} + x[2] * 40503) % 8191) / 4095.5 - 1.0)), " +
        s"(a, b) -> a + b), 0.0)"
      s"(CASE WHEN $proj > 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Shared shape of the q34/q74 oracle: rank bucket-collision candidates
    * by cosine, keep top-k per query. `candSql` must yield
    * (q_id, q_emb, vec_id, embedding). */
  private def annTopKSql(candSql: String, k: Int): String =
    s"""SELECT q_id, n_id, sim, rnk FROM (
       |  SELECT q_id, vec_id AS n_id,
       |    ${cosineSql("q_emb", "embedding")} AS sim,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
       |      ORDER BY ${cosineSql("q_emb", "embedding")} DESC, vec_id)
       |      AS INT) AS rnk
       |  FROM ($candSql))
       |WHERE rnk <= $k ORDER BY q_id, rnk""".stripMargin

  /** The q32 MinHash-LSH pipeline as a CTE chain ending in
    * `mh_pairs(id_a, id_b, jac)`: signatures (same deterministic
    * coefficient pairs as Dedup.minhashCoeffs), LSH banding with the
    * identical rolling band-key fold, exact-Jaccard verification of the
    * candidates. Shared by [[minhashBandPairsSql]] (q32/q242) and the
    * q243 cluster oracle (which chains a RECURSIVE reach clustering on
    * top of the pair set). */
  /** The shingles → signatures → band-key prefix of the MinHash
    * oracle chain, ending at `banded(pid, band, bkey)` — shared by
    * [[minhashPairCtes]] (pairs) and [[lshIndexSql]] (the q253/q254
    * band-index rebuilds). `docWhere` restricts the doc universe. */
  private def minhashBandedCtes(k: Int, numHashes: Int,
      rowsPerBand: Int, docWhere: String = ""): String = {
    val P = graft.ext.TextOps.HashPrime
    val sigExprs = Dedup.minhashCoeffs(numHashes).zipWithIndex.map {
      case ((a, b), i) =>
        s"list_min(list_transform(shs, h -> (h * $a + $b) % $P)) AS mh_$i"
    }.mkString(",\n  ")
    val numBands = numHashes / rowsPerBand
    val bandSelects = (0 until numBands).map { bnd =>
      val key = (0 until rowsPerBand)
        .map(r => s"mh_${bnd * rowsPerBand + r}")
        .reduce((x, y) => s"(($x) * 31 + $y) % $P")
      s"SELECT pid, $bnd AS band, $key AS bkey FROM sigs"
    }.mkString("\n  UNION ALL\n  ")
    s"""sh AS (
       |  SELECT doc_id AS pid, ${shinglesSql(toksSql, k)} AS shs
       |  FROM documents$docWhere),
       |sigs AS (
       |  SELECT pid, shs,
       |  $sigExprs
       |  FROM sh WHERE len(shs) > 0),
       |banded AS (
       |  $bandSelects)""".stripMargin
  }

  private def minhashPairCtes(k: Int, numHashes: Int, rowsPerBand: Int,
      threshold: Double): String =
    s"""${minhashBandedCtes(k, numHashes, rowsPerBand)},
       |cand AS (
       |  SELECT DISTINCT x.pid AS id_a, y.pid AS id_b
       |  FROM banded x JOIN banded y
       |    ON x.band = y.band AND x.bkey = y.bkey AND x.pid < y.pid),
       |mh_pairs AS (
       |  SELECT id_a, id_b, jac FROM (
       |    SELECT id_a, id_b,
       |      CAST(len(list_intersect(a.shs, b.shs)) AS DOUBLE)
       |        / (len(a.shs) + len(b.shs)
       |           - len(list_intersect(a.shs, b.shs))) AS jac
       |    FROM cand JOIN sigs a ON a.pid = id_a
       |              JOIN sigs b ON b.pid = id_b)
       |  WHERE jac >= $threshold)""".stripMargin

  /** Fresh MinHash band-index rebuild as oracle SQL — the q253/q254
    * contract ([[fpIndexSql]]'s sibling on the banded-text modality):
    * uncapped per-doc-deterministic band keys, so both maintenance
    * directions must reproduce the fresh rebuild over the
    * post-maintenance doc set byte-identically. Same canonical
    * serialization as the Spark side's `lshIndexRows`. */
  private def lshIndexSql(k: Int, numHashes: Int, rowsPerBand: Int,
      docWhere: String = ""): String =
    s"""WITH ${minhashBandedCtes(k, numHashes, rowsPerBand, docWhere)}
       |SELECT band, bkey,
       |  array_to_string(list(pid ORDER BY pid), ',') AS pids_str
       |FROM banded GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q32's oracle (and q242's, with the batch-incident filter): the
    * [[minhashPairCtes]] pair set as a standalone statement. */
  private def minhashBandPairsSql(k: Int, numHashes: Int, rowsPerBand: Int,
      threshold: Double, incidentFilter: String = ""): String =
    s"""WITH ${minhashPairCtes(k, numHashes, rowsPerBand, threshold)}
       |SELECT id_a, id_b, jac FROM mh_pairs
       |WHERE TRUE $incidentFilter
       |ORDER BY id_a, id_b""".stripMargin

  /** q241's oracle: CDC chunk boundaries (rolling-Horner window hash as
    * an explicit lag chain), per-chunk polyHash folds via list_reduce,
    * df-capped chunk-hash postings, overlap-thresholded pairs — replayed
    * from hex(payload) bytes. The lag chain and every constant are
    * GENERATED from the same (window, divisor, maxDf, threshold)
    * parameters the engine side passes (the minhashBandPairsSql
    * pattern), so a parameter tweak on the Scala side cannot silently
    * desync the oracle. */
  private def cdcDedupSql(window: Int, divisor: Int, maxDf: Int,
      threshold: Double): String = {
    // Horner over the w-byte window ending at byte i (1-based):
    // lag(v, w−1) … lag(v, 1), v — no intermediate mods (exact in
    // BIGINT for w ≤ 12, the CdcChunkUtil contract), one % 1e9+7 then
    // % divisor
    val terms = ((window - 1) to 1 by -1)
      .map(t => s"lag(v,$t) OVER w") :+ "v"
    val horner = terms.reduceLeft((acc, term) => s"($acc)*31 + $term")
    s"""WITH media AS (
       |  SELECT doc_id, encode(text) AS payload FROM documents),
       |hx AS (
       |  SELECT doc_id, hex(payload) AS h,
       |         octet_length(payload) AS n
       |  FROM media WHERE octet_length(payload) > 0),
       |bytes AS (
       |  SELECT doc_id, n, h, unnest(range(1, n + 1)) AS i FROM hx),
       |vals AS (
       |  SELECT doc_id, i,
       |    ('0x' || substring(h, CAST(2*i - 1 AS INT), 2))::BIGINT AS v
       |  FROM bytes),
       |wh AS (
       |  SELECT doc_id, i, v,
       |    CASE WHEN i >= $window THEN
       |      (($horner) % 1000000007) % $divisor
       |    END AS cutmod
       |  FROM vals WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
       |cb AS (
       |  SELECT doc_id, i, v,
       |    coalesce(sum(CASE WHEN cutmod = 0 THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY i
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |      0) AS cidx
       |  FROM wh),
       |chunks AS (
       |  SELECT doc_id, cidx, list(v ORDER BY i) AS bs
       |  FROM cb GROUP BY 1, 2),
       |hashes AS (
       |  SELECT doc_id,
       |    list_reduce(bs, (a, b) -> (a*31 + b) % 1000000007) AS ch
       |  FROM chunks),
       |cset AS (SELECT DISTINCT doc_id, ch FROM hashes),
       |keep AS (SELECT ch FROM cset GROUP BY ch
       |         HAVING count(*) <= $maxDf),
       |post AS (SELECT c.doc_id, c.ch FROM cset c JOIN keep USING (ch)),
       |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ch
       |          FROM post GROUP BY 1),
       |shared AS (
       |  SELECT x.doc_id AS id_a, y.doc_id AS id_b,
       |         CAST(count(*) AS BIGINT) AS n_shared
       |  FROM post x JOIN post y ON x.ch = y.ch AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b, n_shared,
       |  a.n_ch AS n_a, b.n_ch AS n_b,
       |  CAST(n_shared AS DOUBLE) / least(a.n_ch, b.n_ch) AS overlap
       |FROM shared JOIN sizes a ON a.doc_id = id_a
       |            JOIN sizes b ON b.doc_id = id_b
       |WHERE CAST(n_shared AS DOUBLE) / least(a.n_ch, b.n_ch)
       |  >= $threshold
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** DuckDB replica of the q180 dedup cascade: per-source survivor counts
    * through exact-normalized → identical-SimHash → MinHash-band greedy
    * elimination (mirrors [[Dedup.cascadeSurvival]] stage for stage). */
  private def cascadeSql(k: Int, numHashes: Int, rowsPerBand: Int): String = {
    val P = graft.ext.TextOps.HashPrime
    val sigExprs = Dedup.minhashCoeffs(numHashes).zipWithIndex.map {
      case ((a, b), i) =>
        s"list_min(list_transform(shs, h -> (h * $a + $b) % $P)) AS mh_$i"
    }.mkString(",\n  ")
    val numBands = numHashes / rowsPerBand
    val bandSelects = (0 until numBands).map { bnd =>
      val key = (0 until rowsPerBand)
        .map(r => s"mh_${bnd * rowsPerBand + r}")
        .reduce((x, y) => s"(($x) * 31 + $y) % $P")
      s"SELECT pid, $bnd AS band, $key AS bkey FROM sigs"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH s1 AS (
       |  SELECT doc_id, source, text,
       |    CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY
       |      trim(regexp_replace(regexp_replace(lower(text),
       |        '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')))
       |      THEN 1 ELSE 0 END AS keep1
       |  FROM documents),
       |s2 AS (
       |  SELECT doc_id, source, text,
       |    CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY $simhashSql)
       |      THEN 1 ELSE 0 END AS keep2
       |  FROM s1 WHERE keep1 = 1),
       |sh AS (SELECT doc_id AS pid, ${shinglesSql(toksSql, k)} AS shs
       |       FROM s2 WHERE keep2 = 1),
       |sigs AS (SELECT pid,
       |  $sigExprs
       |  FROM sh WHERE len(shs) > 0),
       |banded AS (
       |  $bandSelects),
       |bmin AS (SELECT band, bkey, min(pid) AS bmin
       |         FROM banded GROUP BY 1, 2),
       |pmin AS (SELECT pid, min(bmin) AS pm
       |         FROM banded JOIN bmin USING (band, bkey) GROUP BY pid),
       |s3 AS (
       |  SELECT s2.doc_id, s2.source
       |  FROM s2 LEFT JOIN pmin ON pmin.pid = s2.doc_id
       |  WHERE s2.keep2 = 1 AND (pm IS NULL OR pm >= s2.doc_id)),
       |base AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
       |         FROM documents GROUP BY 1),
       |c1 AS (SELECT source, CAST(count(*) AS BIGINT) AS n_exact
       |       FROM s1 WHERE keep1 = 1 GROUP BY 1),
       |c2 AS (SELECT source, CAST(count(*) AS BIGINT) AS n_simhash
       |       FROM s2 WHERE keep2 = 1 GROUP BY 1),
       |c3 AS (SELECT source, CAST(count(*) AS BIGINT) AS n_minhash
       |       FROM s3 GROUP BY 1)
       |SELECT base.source, n_docs,
       |  CAST(COALESCE(n_exact, 0) AS BIGINT) AS n_exact,
       |  CAST(COALESCE(n_simhash, 0) AS BIGINT) AS n_simhash,
       |  CAST(COALESCE(n_minhash, 0) AS BIGINT) AS n_minhash
       |FROM base
       |LEFT JOIN c1 USING (source)
       |LEFT JOIN c2 USING (source)
       |LEFT JOIN c3 USING (source)
       |ORDER BY source""".stripMargin
  }

  /** q60's oracle (and q245's, with the batch-incident filter):
    * deterministic multi-table hyperplane buckets, within-any-bucket
    * candidate join, exact cosine verify. */
  private def cosineLshPairsSql(threshold: Double, bits: Int,
      tables: Int, incidentFilter: String = ""): String =
    s"""WITH b AS (
       |  SELECT vec_id, embedding,
       |    ${multiBucketCols(bits, tables)}
       |  FROM embeddings)
       |SELECT id_a, id_b, sim FROM (
       |  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b,
       |    ${cosineSql("x.embedding", "y.embedding")} AS sim
       |  FROM b x JOIN b y
       |    ON x.vec_id < y.vec_id
       |    AND (${anyBucketMatch("x", "y", tables)}))
       |WHERE sim >= $threshold $incidentFilter
       |ORDER BY id_a, id_b""".stripMargin

  /** Multi-table bucket columns b0..b{tables-1} (table t uses plane
    * offset t·bits) — shared by the q60 and q74 oracles. */
  private def multiBucketCols(bits: Int, tables: Int): String =
    (0 until tables)
      .map(t => s"${lshBucketSql("embedding", bits, t * bits)} AS b$t")
      .mkString(",\n    ")

  private def anyBucketMatch(x: String, y: String, tables: Int): String =
    (0 until tables).map(t => s"$x.b$t = $y.b$t").mkString(" OR ")

  /** Fresh exploded-row embedding-LSH index rebuild as oracle SQL —
    * the q255/q256 contract ([[fpIndexSql]]'s sibling on the embedding
    * modality): per-vector-deterministic hyperplane buckets, so both
    * maintenance directions must reproduce the fresh rebuild over the
    * post-maintenance vector set exactly. Same canonical serialization
    * as the Spark side's `embIndexRows` (the component sum is the same
    * sequential left fold, so the doubles match bitwise before the
    * 6-dp round). */
  private def embIndexSql(bits: Int, tables: Int,
      vecWhere: String = ""): String = {
    val branches = (0 until tables)
      .map(t => s"SELECT $t AS t, b$t AS bk, vec_id, embedding FROM b")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH b AS (
       |  SELECT vec_id, embedding,
       |    ${multiBucketCols(bits, tables)}
       |  FROM embeddings$vecWhere),
       |e AS (
       |  $branches)
       |SELECT CAST(t AS INT) AS t, CAST(bk AS BIGINT) AS bk, vec_id,
       |  round(COALESCE(list_reduce(list_transform(embedding,
       |    x -> CAST(x AS DOUBLE)), (x, y) -> x + y), 0.0), 6)
       |    AS emb_sum
       |FROM e ORDER BY t, bk, vec_id""".stripMargin
  }

  /** DuckDB bigram-hash list (order-preserving, duplicates kept —
    * [[graft.functions.ShingleHash]] without the distinct wrap). */
  private def bigramsSql(toks: String): String =
    s"CASE WHEN len($toks) >= 2 THEN " +
      s"list_transform(generate_series(1, len($toks) - 1), " +
      s"i -> ${polyHashSql(s"array_to_string(list_slice($toks, i, i + 1), ' ')")}) " +
      s"ELSE [] END"

  /** DuckDB xlx(x) = x·ln(x) with xlx(0) = 0 — the q190 LLR term. */
  private def xlxSql(e: String): String =
    s"CASE WHEN ($e) > 0 THEN CAST(($e) AS DOUBLE) * " +
      s"ln(CAST(($e) AS DOUBLE)) ELSE 0.0 END"

  /** Sequential-fold squared Euclidean distance matching
    * SimSearch.kCenterCoreset's zip_with + aggregate arithmetic. */
  private def d2Sql(a: String, b: String): String =
    s"COALESCE(list_reduce(list_transform(list_zip($a, $b), " +
      s"p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * " +
      s"(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), " +
      s"(x, y) -> x + y), 0.0)"

  /** One FD-candidate audit row — SQL twin of PipelineOps.fdAudit for a
    * single (lhs → rhs) candidate (q197's oracle unions these). */
  private def fdSql(rel: String, tbl: String, lhs: String,
      rhs: String): String =
    s"""SELECT '$rel' AS rel, '$lhs' AS lhs, '$rhs' AS rhs,
       |  CAST(count(*) AS BIGINT) AS n_groups,
       |  CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_violations,
       |  (SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0) AS holds,
       |  CAST(max(nd) AS BIGINT) AS max_distinct
       |FROM (SELECT $lhs AS l, count(DISTINCT $rhs) AS nd
       |      FROM $tbl GROUP BY 1)""".stripMargin

  /** Mutual top-5 cosine kNN CTE chain over embeddings ending in
    * `mutual(id_a, id_b, sim, rank_ab, rank_ba)` — SQL twin of
    * ExtQueries.mutualKnnFrame, shared by the q194 and q198 oracles. */
  private def mutualKnnCtes: String =
    s"""mkd AS (
       |  SELECT a.vec_id AS src, b.vec_id AS dst,
       |    ${cosineSql("a.embedding", "b.embedding")} AS sim
       |  FROM embeddings a JOIN embeddings b
       |    ON a.vec_id <> b.vec_id),
       |mktop AS (
       |  SELECT * FROM (
       |    SELECT src, dst, sim,
       |      CAST(ROW_NUMBER() OVER (PARTITION BY src
       |        ORDER BY sim DESC, dst) AS INT) AS rnk
       |    FROM mkd)
       |  WHERE rnk <= 5),
       |mutual AS (
       |  SELECT f.src AS id_a, f.dst AS id_b, f.sim,
       |    f.rnk AS rank_ab, b.rnk AS rank_ba
       |  FROM mktop f JOIN mktop b ON b.src = f.dst AND b.dst = f.src
       |  WHERE f.src < f.dst)""".stripMargin

  /** One synchronous label-propagation round (st(r−1) → msg/best/st r)
    * — SQL twin of one GraphOps.labelPropagation iteration against the
    * `edges` + `base` CTEs of the q198 oracle. */
  private def lpaRoundSql(r: Int): String =
    s"""msg$r AS (
       |  SELECT e.dst AS id, s.label,
       |    SUM(CAST(e.w AS DECIMAL(28,9))) AS sc
       |  FROM edges e JOIN st${r - 1} s ON s.id = e.src
       |  WHERE s.label IS NOT NULL GROUP BY 1, 2),
       |best$r AS (
       |  SELECT id, label FROM (
       |    SELECT id, label, ROW_NUMBER() OVER (PARTITION BY id
       |      ORDER BY sc DESC, label) AS rn FROM msg$r)
       |  WHERE rn = 1),
       |st$r AS (
       |  SELECT b.id, COALESCE(b.seed_label, x.label) AS label
       |  FROM base b LEFT JOIN best$r x ON x.id = b.id)""".stripMargin

  /** Unrolled Gonzalez k-center CTE chain (c1..ck, s1..s(k-1)) over the
    * embeddings table — the SQL twin of SimSearch.kCenterCoreset —
    * closing with `cent(cid, cv)`, the seed codebook. Shared by the
    * q192 oracle (reads each ci's d2sel) and the q195/q196 oracles
    * (consume `cent` as coarse quantizer / Lloyd seeds). */
  private def kcenterCtes(k: Int): String = {
    val rounds = (2 to k).map { i =>
      val prev = s"s${i - 1}"
      val upd =
        if (i == k) "" // the k-th center closes the selection; no s_k
        else
          s""",
             |s$i AS (
             |  SELECT s.id, s.v,
             |    least(s.md, round(${d2Sql("s.v", "c.cv")}, 9)) AS md
             |  FROM $prev s, c$i c)""".stripMargin
      s"""c$i AS (
         |  SELECT id AS cid, v AS cv, md AS d2sel
         |  FROM $prev ORDER BY md DESC, id LIMIT 1)$upd""".stripMargin
    }.mkString(",\n")
    s"""c1 AS (
       |  SELECT vec_id AS cid, embedding AS cv FROM embeddings
       |  ORDER BY vec_id LIMIT 1),
       |s1 AS (
       |  SELECT e.vec_id AS id, e.embedding AS v,
       |    round(${d2Sql("e.embedding", "c.cv")}, 9) AS md
       |  FROM embeddings e, c1 c),
       |$rounds,
       |cent AS (
       |${(1 to k).map(i => s"  SELECT cid, cv FROM c$i")
          .mkString("\n  UNION ALL\n")})""".stripMargin
  }

  /** Per-subspace PQ CTE block — the q211/q212 oracles' replica of one
    * [[SimSearch.pqIndex]] subspace s over dims [off+1, off+len]:
    * Gonzalez k-center on the SLICED vectors (seed = min vec_id, same
    * 9-dp fold as kcenterCtes), closing in p{s}cent (code = selection
    * order − 1) and p{s}asg (nearest-centroid assignment, 9-dp d²,
    * min-code tie). MATERIALIZED throughout — the recurrence otherwise
    * inlines exponentially (the pc1Ctes lesson). */
  private def pqSubCtes(s: Int, off: Int, len: Int, k: Int): String = {
    val p = s"p$s"
    val ve = s"list_slice(e.embedding, ${off + 1}, ${off + len})"
    val rounds = (2 to k).map { i =>
      val prev = s"${p}s${i - 1}"
      val upd =
        if (i == k) ""
        else
          s""",
             |${p}s$i AS MATERIALIZED (
             |  SELECT s.id, s.v,
             |    least(s.md, round(${d2Sql("s.v", "c.cv")}, 9)) AS md
             |  FROM $prev s, ${p}c$i c)""".stripMargin
      s"""${p}c$i AS MATERIALIZED (
         |  SELECT id AS cid, v AS cv, md AS d2sel
         |  FROM $prev ORDER BY md DESC, id LIMIT 1)$upd""".stripMargin
    }.mkString(",\n")
    s"""${p}c1 AS MATERIALIZED (
       |  SELECT vec_id AS cid, $ve AS cv FROM embeddings e
       |  ORDER BY vec_id LIMIT 1),
       |${p}s1 AS MATERIALIZED (
       |  SELECT e.vec_id AS id, $ve AS v,
       |    round(${d2Sql(ve, "c.cv")}, 9) AS md
       |  FROM embeddings e, ${p}c1 c),
       |$rounds,
       |${p}cent AS (
       |${(1 to k).map(i => s"  SELECT ${i - 1} AS code, cv FROM ${p}c$i")
          .mkString("\n  UNION ALL\n")}),
       |${p}asg AS MATERIALIZED (
       |  SELECT id, code FROM (
       |    SELECT s.id, c.code,
       |      ROW_NUMBER() OVER (PARTITION BY s.id
       |        ORDER BY round(${d2Sql("s.v", "c.cv")}, 9), c.code)
       |        AS rn
       |    FROM ${p}s1 s, ${p}cent c)
       |  WHERE rn = 1)""".stripMargin
  }

  /** Power-iteration CTE chain — the q201/q202 oracles' replica of
    * [[SimSearch.pc1]]: q147's covariance CTE (6-dp, -0.0-canonical),
    * mirrored to a full matrix, index-ramp start v0 ∝ (1..d) (9 dp),
    * then `rounds` unrolled (w := C·v decimal-sum → IEEE normalize →
    * 9-dp re-round) steps, closing in `loadv` (0-based i, sign-flipped
    * loading), `lam` (raw Rayleigh λ) and `tr` (trace). */
  private def pc1Ctes(rounds: Int): String = {
    val iter = (1 to rounds).map { r =>
      s"""w$r AS MATERIALIZED (
         |  SELECT m.i, CAST(SUM(CAST(m.cov * v.x AS DECIMAL(38,15)))
         |    AS DOUBLE) AS w
         |  FROM mat m JOIN v${r - 1} v ON m.j = v.i GROUP BY 1),
         |n$r AS MATERIALIZED (
         |  SELECT sqrt(CAST(SUM(CAST(w*w AS DECIMAL(38,12)))
         |    AS DOUBLE)) AS nz FROM w$r),
         |v$r AS MATERIALIZED (
         |  SELECT i, round(w / nz, 9) AS x FROM w$r, n$r)"""
        .stripMargin
    }.mkString(",\n")
    s"""dims AS (SELECT unnest(generate_series(1, 64)) AS d),
       |pcpr AS (SELECT a.d AS i, b.d AS j FROM dims a
       |       JOIN dims b ON a.d <= b.d),
       |pccs AS MATERIALIZED (
       |  SELECT p.i, p.j,
       |    CAST(SUM(CAST(CAST(e.embedding[p.i] AS DOUBLE) *
       |      CAST(e.embedding[p.j] AS DOUBLE) AS DECIMAL(38,12)))
       |      AS DOUBLE) AS sxy,
       |    CAST(SUM(CAST(CAST(e.embedding[p.i] AS DOUBLE)
       |      AS DECIMAL(38,12))) AS DOUBLE) AS sx,
       |    CAST(SUM(CAST(CAST(e.embedding[p.j] AS DOUBLE)
       |      AS DECIMAL(38,12))) AS DOUBLE) AS sy,
       |    CAST(count(*) AS DOUBLE) AS n
       |  FROM embeddings e CROSS JOIN pcpr p GROUP BY 1, 2),
       |covq AS MATERIALIZED (
       |  SELECT i - 1 AS i, j - 1 AS j,
       |    round((sxy - sx*sy/n) / (n - 1), 6) + 0.0 AS cov
       |  FROM pccs),
       |mat AS MATERIALIZED (
       |  SELECT i, j, cov FROM covq
       |  UNION ALL
       |  SELECT j AS i, i AS j, cov FROM covq WHERE i <> j),
       |nn0 AS (SELECT sqrt(SUM(CAST(d*d AS DOUBLE))) AS nz FROM dims),
       |v0 AS MATERIALIZED (
       |  SELECT d - 1 AS i, round(d / nz, 9) AS x FROM dims, nn0),
       |$iter,
       |wf AS (
       |  SELECT m.i, CAST(SUM(CAST(m.cov * v.x AS DECIMAL(38,15)))
       |    AS DOUBLE) AS w
       |  FROM mat m JOIN v$rounds v ON m.j = v.i GROUP BY 1),
       |lam AS (
       |  SELECT CAST(SUM(CAST(v.x * w.w AS DECIMAL(38,12)))
       |    AS DOUBLE) AS l
       |  FROM v$rounds v JOIN wf w ON v.i = w.i),
       |tr AS (SELECT CAST(SUM(CAST(cov AS DECIMAL(38,12)))
       |    AS DOUBLE) AS t FROM covq WHERE i = j),
       |sgn AS (
       |  SELECT CASE WHEN x < 0 THEN -1.0 ELSE 1.0 END AS s
       |  FROM v$rounds WHERE x <> 0 ORDER BY i LIMIT 1),
       |loadv AS (
       |  SELECT v.i, v.x * s.s + 0.0 AS l FROM v$rounds v, sgn s)"""
      .stripMargin
  }

  /** Nearest-`cent`-centroid assignment CTE body (9-dp d², min-cid tie)
    * — SQL twin of SimSearch.assignCells against a codebook CTE named
    * `centName`. Yields rows (id, v, cell). */
  private def assignSql(centName: String): String =
    s"""SELECT id, v, cell FROM (
       |    SELECT e.vec_id AS id, e.embedding AS v, c.cid AS cell,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY round(${d2Sql("e.embedding", "c.cv")}, 9),
       |                 c.cid) AS rn
       |    FROM embeddings e, $centName c)
       |  WHERE rn = 1""".stripMargin

  /** Banded-MinHash CANDIDATE CTEs (msh → msigs → mbanded → mcand) — the
    * q191 oracle's replica of Dedup.blockingQuality's blocker (same
    * coefficient pairs and rolling band-key fold as the q32 oracle, but
    * stopping at the distinct candidate set: the audit measures the
    * blocker, not the verifier). Prefixed names coexist with
    * [[pairCtes]]' sh/post/... in one WITH clause. */
  private def blockCandCtes(k: Int, numHashes: Int, rowsPerBand: Int)
      : String = {
    val P = graft.ext.TextOps.HashPrime
    val sigExprs = Dedup.minhashCoeffs(numHashes).zipWithIndex.map {
      case ((a, b), i) =>
        s"list_min(list_transform(shs, h -> (h * $a + $b) % $P)) AS mh_$i"
    }.mkString(",\n  ")
    val numBands = numHashes / rowsPerBand
    val bandSelects = (0 until numBands).map { bnd =>
      val key = (0 until rowsPerBand)
        .map(r => s"mh_${bnd * rowsPerBand + r}")
        .reduce((x, y) => s"(($x) * 31 + $y) % $P")
      s"SELECT pid, $bnd AS band, $key AS bkey FROM msigs"
    }.mkString("\n  UNION ALL\n  ")
    s"""msh AS (
       |  SELECT doc_id AS pid, ${shinglesSql(toksSql, k)} AS shs
       |  FROM documents),
       |msigs AS (
       |  SELECT pid,
       |  $sigExprs
       |  FROM msh WHERE len(shs) > 0),
       |mbanded AS (
       |  $bandSelects),
       |mcand AS (
       |  SELECT DISTINCT x.pid AS id_a, y.pid AS id_b
       |  FROM mbanded x JOIN mbanded y
       |    ON x.band = y.band AND x.bkey = y.bkey AND x.pid < y.pid)"""
      .stripMargin
  }

  val all: Map[String, String] = Map(
    "q189_seasonal_index" ->
      """WITH b AS (
        |  SELECT event_type,
        |    dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS dow,
        |    CAST(count(*) AS BIGINT) AS n,
        |    SUM(CAST(value AS DECIMAL(38,6))) AS s
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(dow AS INT) AS dow, n,
        |  round(CAST(s AS DOUBLE) / n, 6) AS dow_mean,
        |  round((CAST(s AS DOUBLE) / n) /
        |    (CAST(SUM(s) OVER (PARTITION BY event_type) AS DOUBLE) /
        |     CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE)), 6)
        |    AS seasonal_idx
        |FROM b ORDER BY event_type, dow""".stripMargin,

    "q190_llr_collocations" -> {
      def t(e: String) = xlxSql(e)
      s"""WITH ft AS (
         |  SELECT list_filter($toksSql, w -> length(w) > 0) AS t
         |  FROM documents),
         |bg AS (
         |  SELECT t[i] AS w1, t[i + 1] AS w2
         |  FROM ft, LATERAL unnest(generate_series(1, len(t) - 1)) AS u(i)
         |  WHERE len(t) >= 2),
         |cnt AS (
         |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS k11
         |  FROM bg GROUP BY 1, 2),
         |l AS (SELECT w1, CAST(SUM(k11) AS BIGINT) AS ca
         |      FROM cnt GROUP BY 1),
         |r AS (SELECT w2, CAST(SUM(k11) AS BIGINT) AS cb
         |      FROM cnt GROUP BY 1),
         |tot AS (SELECT CAST(SUM(k11) AS BIGINT) AS nn FROM cnt)
         |SELECT cnt.w1, cnt.w2, k11 AS co, ca, cb,
         |  round(2.0 * (${t("k11")} + ${t("ca - k11")} + ${t("cb - k11")}
         |    + ${t("nn - ca - cb + k11")}
         |    - ${t("ca")} - ${t("nn - ca")}
         |    - ${t("cb")} - ${t("nn - cb")}
         |    + ${t("nn")}), 6) AS llr
         |FROM cnt JOIN l ON cnt.w1 = l.w1
         |         JOIN r ON cnt.w2 = r.w2
         |         CROSS JOIN tot
         |WHERE k11 >= 5
         |ORDER BY llr DESC, cnt.w1, cnt.w2 LIMIT 20""".stripMargin
    },

    "q191_blocking_quality" ->
      s"""WITH ${pairCtes(cap = 100, threshold = 0.1)},
         |${blockCandCtes(k = 3, numHashes = 12, rowsPerBand = 3)},
         |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cand FROM mcand),
         |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM pairs),
         |nh AS (SELECT CAST(count(*) AS BIGINT) AS n_hit
         |       FROM pairs p JOIN mcand c
         |         ON p.id_a = c.id_a AND p.id_b = c.id_b)
         |SELECT n_docs, n_cand, n_exact, n_hit,
         |  round(CASE WHEN n_exact > 0
         |    THEN CAST(n_hit AS DOUBLE) / n_exact ELSE 1.0 END, 6)
         |    AS pairs_completeness,
         |  round(1.0 - CAST(n_cand AS DOUBLE) /
         |    (CAST(n_docs AS DOUBLE) * (n_docs - 1) / 2), 6)
         |    AS reduction_ratio
         |FROM nd, nc, ne, nh""".stripMargin,

    "q197_fd_audit" ->
      s"""SELECT * FROM (
         |${fdSql("part", "part", "p_brand", "p_type")}
         |UNION ALL
         |${fdSql("part", "part", "p_name", "p_brand")}
         |UNION ALL
         |${fdSql("customer", "customer", "c_name", "c_nationkey")}
         |UNION ALL
         |${fdSql("nation", "nation", "n_name", "n_regionkey")}
         |UNION ALL
         |${fdSql("orders", "orders", "o_orderpriority", "o_orderstatus")}
         |UNION ALL
         |${fdSql("documents", "documents", "source", "lang")})
         |ORDER BY rel, lhs, rhs""".stripMargin,

    "q195_semantic_dedup" ->
      s"""WITH ${kcenterCtes(5)},
         |asg AS (
         |  ${assignSql("cent")}),
         |elim AS (
         |  SELECT DISTINCT b.id AS id
         |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.id < b.id
         |  WHERE ${cosineSql("a.v", "b.v")} >= 0.3)
         |SELECT a.id, CAST(a.cell AS BIGINT) AS cell,
         |  (e.id IS NULL) AS keep
         |FROM asg a LEFT JOIN elim e ON e.id = a.id
         |ORDER BY a.id""".stripMargin,

    "q196_lloyd_kmeans" ->
      s"""WITH ${kcenterCtes(5)},
         |a1 AS (
         |  ${assignSql("cent")}),
         |m1 AS (
         |  SELECT cell, dim1 - 1 AS dim,
         |    round(CAST(SUM(CAST(round(CAST(v[dim1] AS DOUBLE), 6)
         |        AS DECIMAL(28,6))) AS DOUBLE) / count(*), 6) AS m
         |  FROM (SELECT cell, v,
         |          unnest(generate_series(1, len(v))) AS dim1 FROM a1)
         |  GROUP BY 1, 2),
         |cent1 AS (SELECT cell AS cid, list(m ORDER BY dim) AS cv
         |          FROM m1 GROUP BY 1),
         |a2 AS (
         |  ${assignSql("cent1")}),
         |m2 AS (
         |  SELECT cell, dim1 - 1 AS dim,
         |    round(CAST(SUM(CAST(round(CAST(v[dim1] AS DOUBLE), 6)
         |        AS DECIMAL(28,6))) AS DOUBLE) / count(*), 6) AS m,
         |    count(*) AS n
         |  FROM (SELECT cell, v,
         |          unnest(generate_series(1, len(v))) AS dim1 FROM a2)
         |  GROUP BY 1, 2)
         |SELECT CAST(cell AS BIGINT) AS cell, CAST(dim AS INT) AS dim,
         |  m AS centroid, CAST(n AS BIGINT) AS n_members
         |FROM m2 ORDER BY cell, dim""".stripMargin,

    "q192_kcenter_coreset" ->
      s"""WITH ${kcenterCtes(5)}
         |SELECT * FROM (
         |  SELECT CAST(1 AS INT) AS sel, cid,
         |    CAST(0.0 AS DOUBLE) AS d2sel FROM c1
         |  UNION ALL SELECT CAST(2 AS INT), cid, d2sel FROM c2
         |  UNION ALL SELECT CAST(3 AS INT), cid, d2sel FROM c3
         |  UNION ALL SELECT CAST(4 AS INT), cid, d2sel FROM c4
         |  UNION ALL SELECT CAST(5 AS INT), cid, d2sel FROM c5)
         |ORDER BY sel""".stripMargin,

    "q188_personalized_pagerank" ->
      s"""WITH RECURSIVE
         |${pairCtes(cap = 100, threshold = 0.1)},
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |          UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
         |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges
         |        GROUP BY 1),
         |nsq AS (SELECT count(*) AS ns FROM deg WHERE src % 4 = 0),
         |pr(iter, id, rank) AS (
         |  SELECT 0, deg.src,
         |    CASE WHEN deg.src % 4 = 0
         |         THEN round(CAST(1.0 AS DOUBLE) / nsq.ns, 9)
         |         ELSE CAST(0.0 AS DOUBLE) END
         |  FROM deg, nsq
         |  UNION ALL
         |  SELECT pr.iter + 1, e.dst,
         |    round((CAST(1.0 AS DOUBLE) - 0.85)
         |        * (CASE WHEN e.dst % 4 = 0
         |           THEN round(CAST(1.0 AS DOUBLE)
         |                / (SELECT ns FROM nsq), 9)
         |           ELSE CAST(0.0 AS DOUBLE) END)
         |      + 0.85 * CAST(SUM(CAST(round(pr.rank / d2.deg, 12)
         |          AS DECIMAL(28,12))) AS DOUBLE), 9)
         |  FROM pr JOIN edges e ON pr.id = e.src
         |          JOIN deg d2 ON d2.src = pr.id
         |  WHERE pr.iter < 5
         |  GROUP BY e.dst, pr.iter)
         |SELECT id AS doc_id, rank FROM pr WHERE iter = 5
         |ORDER BY doc_id""".stripMargin,

    "q187_session_paths" ->
      """WITH s AS (
        |  SELECT user_id, event_type AS e1,
        |    lead(event_type, 1) OVER w AS e2,
        |    lead(event_type, 2) OVER w AS e3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id
        |               ORDER BY CAST(ts AS TIMESTAMP), event_id)),
        |tri AS (
        |  SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n
        |  FROM s WHERE e3 IS NOT NULL GROUP BY 1, 2, 3)
        |SELECT e1, e2, e3, n,
        |  round(CAST(n AS DOUBLE) /
        |    SUM(n) OVER (PARTITION BY e1, e2), 6) AS p_cond
        |FROM tri
        |ORDER BY n DESC, e1, e2, e3 LIMIT 20""".stripMargin,

    "q186_bootstrap_ci" -> {
      val cuts = graft.engine.Aggregates.PoissonCuts
      val wCase = cuts.zipWithIndex
        .map { case (c, k) => s"WHEN u < $c THEN $k" }
        .mkString("CASE ", " ", s" ELSE ${cuts.size} END")
      s"""WITH r AS (
         |  SELECT g, v, h0, t.rep
         |  FROM (SELECT o_orderstatus AS g, o_totalprice AS v,
         |          ${polyHashSql("CAST(o_orderkey AS VARCHAR)")} AS h0
         |        FROM orders), range(0, 50) t(rep)),
         |wts AS (
         |  SELECT g, rep, v, $wCase AS w
         |  FROM (SELECT *,
         |    ((((h0 + rep * 514229) % 1000000007) * 2654435761 + 12345)
         |       % 1000000007)
         |      / 1000000007.0 AS u
         |    FROM r)),
         |b AS (
         |  SELECT g, rep,
         |    CAST(SUM(CAST(w * v AS DECIMAL(38,6))) AS DOUBLE) / SUM(w)
         |      AS mb
         |  FROM wts GROUP BY 1, 2 HAVING SUM(w) > 0),
         |ci AS (
         |  SELECT g, quantile_cont(mb, 0.05 / 2) AS lo,
         |    quantile_cont(mb, 1 - 0.05 / 2) AS hi
         |  FROM b GROUP BY 1),
         |pt AS (
         |  SELECT o_orderstatus AS g, CAST(count(*) AS BIGINT) AS n,
         |    CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
         |      / count(*) AS mean
         |  FROM orders GROUP BY 1)
         |SELECT pt.g AS o_orderstatus, pt.n, round(pt.mean, 6) AS mean,
         |  round(ci.lo, 6) AS ci_lo, round(ci.hi, 6) AS ci_hi
         |FROM pt JOIN ci ON pt.g = ci.g
         |ORDER BY o_orderstatus""".stripMargin
    },

    "q183_rfm_segments" ->
      """WITH cust AS (
        |  SELECT o_custkey,
        |    epoch(CAST(max(o_orderdate) AS TIMESTAMP)) AS rec,
        |    count(*) AS freq,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
        |      AS money
        |  FROM orders GROUP BY 1),
        |p AS (SELECT
        |    quantile_cont(rec, 1.0/3) AS r33,
        |    quantile_cont(rec, 2.0/3) AS r66,
        |    quantile_cont(CAST(freq AS DOUBLE), 1.0/3) AS f33,
        |    quantile_cont(CAST(freq AS DOUBLE), 2.0/3) AS f66,
        |    quantile_cont(money, 1.0/3) AS m33,
        |    quantile_cont(money, 2.0/3) AS m66
        |  FROM cust)
        |SELECT
        |  CAST(CASE WHEN rec <= r33 THEN 1 WHEN rec <= r66 THEN 2
        |       ELSE 3 END AS INTEGER) AS r_score,
        |  CAST(CASE WHEN CAST(freq AS DOUBLE) <= f33 THEN 1
        |       WHEN CAST(freq AS DOUBLE) <= f66 THEN 2
        |       ELSE 3 END AS INTEGER) AS f_score,
        |  CAST(CASE WHEN money <= m33 THEN 1 WHEN money <= m66 THEN 2
        |       ELSE 3 END AS INTEGER) AS m_score,
        |  CAST(count(*) AS BIGINT) AS n_customers
        |FROM cust, p GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q184_rolling_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / count(*)
        |      AS m
        |  FROM events GROUP BY 1, 2),
        |roll AS (
        |  SELECT event_type, day, m,
        |    count(*) OVER w AS cnt,
        |    CAST(SUM(CAST(m AS DECIMAL(38,12))) OVER w AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(m * m AS DECIMAL(38,12))) OVER w AS DOUBLE)
        |      AS s2
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        |st AS (
        |  SELECT event_type, day, m, cnt,
        |    s1 / cnt AS mu, s2 / cnt - (s1 / cnt) * (s1 / cnt) AS vr
        |  FROM roll WHERE cnt >= 4)
        |SELECT event_type, day,
        |  round((m - mu) / sqrt(vr), 6) AS z
        |FROM st
        |WHERE vr > 0 AND abs((m - mu) / sqrt(vr)) > 1.5
        |ORDER BY event_type, day""".stripMargin,

    "q185_attribution" ->
      """WITH p AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id AS c_user, CAST(ts AS TIMESTAMP) AS click_ts,
        |    max(CAST(json_extract_string(props, '$.k') AS BIGINT) % 5)
        |      AS channel
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT COALESCE(channel, -1) AS channel,
        |  CAST(count(*) AS BIGINT) AS n_purchases,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.c_user AND p.ts >= c.click_ts
        |GROUP BY 1 ORDER BY channel""".stripMargin,

    "q180_dedup_cascade" ->
      cascadeSql(k = 3, numHashes = 12, rowsPerBand = 3),

    "q181_cluster_split" ->
      s"""WITH RECURSIVE
         |${pairCtes(cap = 100, threshold = 0.1)},
         |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach(s, d) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
         |cl AS (
         |  SELECT doc.doc_id, doc.source,
         |    CAST(least(doc.doc_id, COALESCE(m.mn, doc.doc_id)) AS BIGINT)
         |      AS cluster
         |  FROM documents doc
         |  LEFT JOIN (SELECT s, MIN(d) AS mn FROM reach GROUP BY s) m
         |    ON m.s = doc.doc_id),
         |h AS (
         |  SELECT source, cluster,
         |    ${polyHashSql("CAST(cluster AS VARCHAR)")} % 100 AS b
         |  FROM cl)
         |SELECT CASE WHEN b < 98 THEN 'train' WHEN b < 99 THEN 'val'
         |            ELSE 'test' END AS split,
         |  source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT cluster) AS BIGINT) AS n_clusters
         |FROM h GROUP BY 1, 2 ORDER BY split, source""".stripMargin,

    "q182_quota_sample" ->
      s"""WITH h AS (
         |  SELECT lang, doc_id,
         |    ${scrambledHashSql("CAST(doc_id AS VARCHAR)")} AS hh
         |  FROM documents),
         |r AS (
         |  SELECT lang, doc_id,
         |    CAST(row_number() OVER (PARTITION BY lang
         |      ORDER BY hh, doc_id) AS BIGINT) AS rk,
         |    count(*) OVER (PARTITION BY lang) AS n
         |  FROM h)
         |SELECT lang, doc_id, rk FROM r
         |WHERE rk <= greatest(10, CAST(floor(n * 0.02) AS BIGINT))
         |ORDER BY lang, rk""".stripMargin,

    "q175_spearman" ->
      """WITH r AS (
        |  SELECT l_returnflag AS g,
        |    rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
        |      + (COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity)
        |         - 1) / 2.0 AS rx,
        |    rank() OVER (PARTITION BY l_returnflag
        |                 ORDER BY l_extendedprice)
        |      + (COUNT(*) OVER (PARTITION BY l_returnflag,
        |                        l_extendedprice) - 1) / 2.0 AS ry
        |  FROM lineitem)
        |SELECT g AS l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  round((CAST(count(*) AS DOUBLE)
        |      * CAST(SUM(CAST(rx*ry AS DECIMAL(38,6))) AS DOUBLE)
        |    - CAST(SUM(CAST(rx AS DECIMAL(18,2))) AS DOUBLE)
        |      * CAST(SUM(CAST(ry AS DECIMAL(18,2))) AS DOUBLE))
        |   / (sqrt(CAST(count(*) AS DOUBLE)
        |        * CAST(SUM(CAST(rx*rx AS DECIMAL(38,6))) AS DOUBLE)
        |      - CAST(SUM(CAST(rx AS DECIMAL(18,2))) AS DOUBLE)
        |        * CAST(SUM(CAST(rx AS DECIMAL(18,2))) AS DOUBLE))
        |      * sqrt(CAST(count(*) AS DOUBLE)
        |        * CAST(SUM(CAST(ry*ry AS DECIMAL(38,6))) AS DOUBLE)
        |      - CAST(SUM(CAST(ry AS DECIMAL(18,2))) AS DOUBLE)
        |        * CAST(SUM(CAST(ry AS DECIMAL(18,2))) AS DOUBLE))), 6)
        |  AS rho
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "q176_ks_test" ->
      """WITH cells AS (
        |  SELECT o_orderpriority AS g, o_totalprice AS v,
        |    SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS ca,
        |    SUM(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS cb
        |  FROM orders GROUP BY 1, 2),
        |c AS (
        |  SELECT g,
        |    SUM(ca) OVER (PARTITION BY g) AS na,
        |    SUM(cb) OVER (PARTITION BY g) AS nb,
        |    abs(CAST(SUM(ca) OVER (PARTITION BY g ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS DOUBLE)
        |        / SUM(ca) OVER (PARTITION BY g)
        |      - CAST(SUM(cb) OVER (PARTITION BY g ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS DOUBLE)
        |        / SUM(cb) OVER (PARTITION BY g)) AS d
        |  FROM cells)
        |SELECT g AS o_orderpriority, CAST(MAX(na) AS BIGINT) AS n1,
        |  CAST(MAX(nb) AS BIGINT) AS n2, round(MAX(d), 6) AS ks_d
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    "q177_gini" ->
      """WITH r AS (
        |  SELECT o_orderpriority AS g, o_totalprice AS v,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice, o_orderkey) AS i
        |  FROM orders),
        |a AS (
        |  SELECT g, CAST(count(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(i * v AS DECIMAL(38,6))) AS DOUBLE) AS six
        |  FROM r GROUP BY 1)
        |SELECT g AS o_orderpriority, CAST(n AS BIGINT) AS n,
        |  round((2.0 * six - (n + 1) * sx) / (n * sx), 6) AS gini
        |FROM a GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,

    "q178_acf" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
        |      / count(*), 6) AS x
        |  FROM events GROUP BY 1, 2),
        |base AS (
        |  SELECT event_type,
        |    round(CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)
        |      / count(*), 6) AS mu
        |  FROM daily GROUP BY 1),
        |idx AS (
        |  SELECT d.event_type,
        |    CAST(x AS DECIMAL(12,6)) - CAST(mu AS DECIMAL(12,6)) AS dev,
        |    row_number() OVER (PARTITION BY d.event_type ORDER BY day)
        |      AS rn
        |  FROM daily d JOIN base USING (event_type)),
        |den AS (
        |  -- VARCHAR bridge: DuckDB's direct DECIMAL(38,12)->DOUBLE cast
        |  -- goes int128->double->/1e12 and misrounds once the scaled
        |  -- coefficient exceeds 2^53; the string path is correctly
        |  -- rounded, matching Spark's cast
        |  SELECT event_type,
        |    CAST(CAST(SUM(CAST(dev * dev AS DECIMAL(38,12))) AS VARCHAR)
        |      AS DOUBLE) AS den
        |  FROM idx GROUP BY 1),
        |num AS (
        |  SELECT a.event_type, l.lag,
        |    CAST(CAST(SUM(CAST(a.dev * b.dev AS DECIMAL(38,12)))
        |      AS VARCHAR) AS DOUBLE) AS num,
        |    count(*) AS np
        |  FROM idx a
        |  CROSS JOIN generate_series(1, 7) AS l(lag)
        |  JOIN idx b ON b.event_type = a.event_type
        |    AND b.rn = a.rn - l.lag
        |  GROUP BY 1, 2)
        |SELECT n.event_type, CAST(n.lag AS INT) AS lag,
        |  CAST(np AS BIGINT) AS n_pairs, num / den AS acf
        |FROM num n JOIN den USING (event_type)
        |ORDER BY event_type, lag""".stripMargin,

    "q179_kaplan_meier" ->
      """WITH fst AS (
        |  SELECT user_id, event_type AS cohort FROM (
        |    SELECT user_id, event_type,
        |      row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id) AS rn
        |    FROM events) WHERE rn = 1),
        |per AS (
        |  SELECT user_id,
        |    min(CAST(ts AS DATE)) AS d0,
        |    min(CASE WHEN event_type = 'purchase'
        |      THEN CAST(ts AS DATE) END) AS de,
        |    max(CAST(ts AS DATE)) AS dl
        |  FROM events GROUP BY 1),
        |dur AS (
        |  SELECT f.cohort,
        |    CASE WHEN de IS NOT NULL THEN date_diff('day', d0, de)
        |         ELSE date_diff('day', d0, dl) END AS t,
        |    de IS NOT NULL AS ev
        |  FROM per JOIN fst f USING (user_id)),
        |byt AS (
        |  SELECT cohort, t,
        |    SUM(CASE WHEN ev THEN 1 ELSE 0 END) AS d,
        |    SUM(CASE WHEN ev THEN 0 ELSE 1 END) AS c
        |  FROM dur GROUP BY 1, 2),
        |km AS (
        |  SELECT cohort, t, d, c,
        |    SUM(d + c) OVER (PARTITION BY cohort)
        |      - COALESCE(SUM(d + c) OVER (PARTITION BY cohort ORDER BY t
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS n_risk
        |  FROM byt)
        |SELECT cohort, CAST(t AS INT) AS t,
        |  CAST(n_risk AS BIGINT) AS n_risk, CAST(d AS BIGINT) AS d,
        |  CAST(c AS BIGINT) AS c,
        |  CASE WHEN MIN(n_risk - d) OVER (PARTITION BY cohort ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 0
        |    THEN 0.0
        |    ELSE round(exp(SUM(CASE WHEN n_risk > d
        |        THEN ln(CAST(n_risk - d AS DOUBLE) / n_risk) END)
        |      OVER (PARTITION BY cohort ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 9)
        |  END AS survival
        |FROM km ORDER BY cohort, t""".stripMargin,

    "q173_welch_t" ->
      """WITH a AS (
        |  SELECT o_orderpriority,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS DOUBLE) AS n1,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'F'
        |      THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
        |      AS DOUBLE) AS s1,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'F'
        |      THEN CAST(o_totalprice * o_totalprice AS DECIMAL(38,6)) END)
        |      AS DOUBLE) AS ss1,
        |    CAST(SUM(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END)
        |      AS DOUBLE) AS n2,
        |    CAST(SUM(CASE WHEN o_orderstatus <> 'F'
        |      THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
        |      AS DOUBLE) AS s2,
        |    CAST(SUM(CASE WHEN o_orderstatus <> 'F'
        |      THEN CAST(o_totalprice * o_totalprice AS DECIMAL(38,6)) END)
        |      AS DOUBLE) AS ss2
        |  FROM orders GROUP BY 1),
        |v AS (
        |  SELECT o_orderpriority, n1, n2,
        |    ((ss1 - s1*s1/n1) / (n1-1)) / n1 AS se1,
        |    ((ss2 - s2*s2/n2) / (n2-1)) / n2 AS se2,
        |    s1/n1 - s2/n2 AS md
        |  FROM a)
        |SELECT o_orderpriority, CAST(n1 AS BIGINT) AS n1,
        |  CAST(n2 AS BIGINT) AS n2,
        |  round(md / sqrt(se1 + se2), 6) AS t,
        |  round((se1+se2)*(se1+se2) /
        |    (se1*se1/(n1-1) + se2*se2/(n2-1)), 6) AS df
        |FROM v ORDER BY 1""".stripMargin,

    "q174_mann_whitney" ->
      """WITH r AS (
        |  SELECT l_returnflag AS g, l_quantity AS v,
        |    (l_orderkey % 2 = 0) AS a,
        |    rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
        |      + (COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity)
        |         - 1) / 2.0 AS ar
        |  FROM lineitem),
        |sums AS (
        |  SELECT g,
        |    CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CASE WHEN a THEN CAST(ar AS DECIMAL(38,6)) END)
        |      AS DOUBLE) AS r1
        |  FROM r GROUP BY 1),
        |ties AS (
        |  SELECT g,
        |    CAST(SUM(CAST(t*t*t - t AS DECIMAL(38,6))) AS DOUBLE) AS tsum
        |  FROM (SELECT g, v, CAST(COUNT(*) AS DOUBLE) AS t
        |        FROM r GROUP BY 1, 2)
        |  GROUP BY 1),
        |f AS (
        |  SELECT g, n1, n - n1 AS n2,
        |    r1 - n1 * (n1 + 1) / 2 AS u1,
        |    n1 * (n - n1) / 2 AS mu,
        |    n1 * (n - n1) / 12 * ((n + 1) - tsum / (n * (n - 1))) AS vr
        |  FROM sums JOIN ties USING (g))
        |SELECT g AS l_returnflag, CAST(n1 AS BIGINT) AS n1,
        |  CAST(n2 AS BIGINT) AS n2, round(u1, 6) AS u1,
        |  round((u1 - mu) / sqrt(vr), 6) AS z
        |FROM f ORDER BY 1""".stripMargin,

    "q172_crosssource_flow" ->
      s"""WITH
         |${pairCtes(cap = 100, threshold = 0.1)},
         |ss AS (
         |  SELECT least(a.source, b.source) AS source_x,
         |    greatest(a.source, b.source) AS source_y
         |  FROM pairs p
         |  JOIN documents a ON a.doc_id = p.id_a
         |  JOIN documents b ON b.doc_id = p.id_b
         |  WHERE a.source <> b.source)
         |SELECT source_x, source_y, CAST(count(*) AS BIGINT) AS n_pairs
         |FROM ss GROUP BY 1, 2
         |ORDER BY n_pairs DESC, 1, 2""".stripMargin,

    "q171_weighted_quantiles" ->
      """WITH c AS (
        |  SELECT l_returnflag, l_extendedprice,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER
        |      (PARTITION BY l_returnflag ORDER BY l_extendedprice
        |       RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS DOUBLE) AS cw,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER
        |      (PARTITION BY l_returnflag) AS DOUBLE) AS tw
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  MIN(CASE WHEN cw >= 0.25 * tw THEN l_extendedprice END)
        |    AS wp25,
        |  MIN(CASE WHEN cw >= 0.5 * tw THEN l_extendedprice END)
        |    AS wp50,
        |  MIN(CASE WHEN cw >= 0.9 * tw THEN l_extendedprice END)
        |    AS wp90
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    "q169_benford" ->
      """WITH dg AS (
        |  SELECT CAST(floor(o_totalprice /
        |    power(10.0, floor(log10(o_totalprice)))) AS INT) AS digit
        |  FROM orders),
        |counts AS (SELECT digit, count(*) AS n FROM dg GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS nn FROM counts),
        |scored AS (
        |  SELECT digit, n, nn,
        |    log10(1.0 + 1.0 / digit) AS p
        |  FROM counts, tot),
        |chi AS (
        |  SELECT round(CAST(SUM(CAST(
        |    ((n - nn*p) * (n - nn*p)) / (nn*p)
        |    AS DECIMAL(38,12))) AS DOUBLE), 6) AS chi2
        |  FROM scored)
        |SELECT digit, n, round(n / nn, 6) AS share,
        |  round(p, 6) AS benford_p, chi.chi2
        |FROM scored, chi ORDER BY digit""".stripMargin,

    "q170_gap_fill" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
        |      / count(*), 6) AS v
        |  FROM events GROUP BY 1, 2),
        |kept AS (SELECT * FROM daily WHERE dayofmonth(day) % 5 <> 0),
        |cal AS (
        |  SELECT event_type,
        |    CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |      CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM (SELECT event_type, min(day) AS d0, max(day) AS d1
        |        FROM kept GROUP BY 1)),
        |j AS (
        |  SELECT c.event_type, c.day, k.v FROM cal c
        |  LEFT JOIN kept k USING (event_type, day)),
        |w AS (
        |  SELECT event_type, day, v,
        |    last_value(v IGNORE NULLS) OVER
        |      (PARTITION BY event_type ORDER BY day
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER (PARTITION BY event_type ORDER BY day
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
        |    first_value(v IGNORE NULLS) OVER
        |      (PARTITION BY event_type ORDER BY day
        |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER (PARTITION BY event_type ORDER BY day
        |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
        |  FROM j)
        |SELECT event_type, day, v IS NULL AS was_gap,
        |  round(CASE WHEN v IS NOT NULL THEN v
        |    WHEN pv IS NULL THEN nv
        |    WHEN nv IS NULL THEN pv
        |    ELSE pv + (nv - pv) *
        |      CAST(datediff('day', pd, day) AS DOUBLE) /
        |      CAST(datediff('day', pd, nd) AS DOUBLE) END, 6) AS filled
        |FROM w ORDER BY event_type, day""".stripMargin,

    "q167_leadlag_corr" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |c AS (SELECT day, n AS x FROM daily WHERE event_type = 'click'),
        |p AS (SELECT day AS pday, n AS y FROM daily
        |      WHERE event_type = 'purchase'),
        |l AS (SELECT unnest(generate_series(0, 3)) AS lag),
        |j AS (
        |  SELECT l.lag, c.x, p.y
        |  FROM c CROSS JOIN l
        |  JOIN p ON p.pday = c.day + CAST(l.lag AS INT))
        |SELECT CAST(lag AS INT) AS lag,
        |  CAST(count(*) AS BIGINT) AS n_days,
        |  round((CAST(count(*) AS DOUBLE) * CAST(SUM(CAST(x*y AS DECIMAL(38,6))) AS DOUBLE)
        |    - CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) * CAST(SUM(CAST(y AS DECIMAL(18,2))) AS DOUBLE))
        |   / (sqrt(CAST(count(*) AS DOUBLE) * CAST(SUM(CAST(x*x AS DECIMAL(38,6))) AS DOUBLE)
        |        - CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) * CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE))
        |      * sqrt(CAST(count(*) AS DOUBLE) * CAST(SUM(CAST(y*y AS DECIMAL(38,6))) AS DOUBLE)
        |        - CAST(SUM(CAST(y AS DECIMAL(18,2))) AS DOUBLE) * CAST(SUM(CAST(y AS DECIMAL(18,2))) AS DOUBLE))), 6)
        |    AS xcorr
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    "q168_dedup_report" ->
      s"""WITH RECURSIVE
         |${pairCtes(cap = 100, threshold = 0.1)},
         |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach(s, d) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
         |cl AS MATERIALIZED (
         |  SELECT doc.doc_id,
         |    CAST(least(doc.doc_id, COALESCE(m.mn, doc.doc_id)) AS BIGINT)
         |      AS cluster
         |  FROM documents doc
         |  LEFT JOIN (SELECT s, MIN(d) AS mn FROM reach GROUP BY s) m
         |    ON m.s = doc.doc_id),
         |csz AS MATERIALIZED (
         |  SELECT cluster, count(*) AS csz FROM cl GROUP BY 1),
         |nd AS MATERIALIZED (
         |  SELECT cl.doc_id FROM cl JOIN csz USING (cluster)
         |  WHERE csz >= 2),
         |rn AS (
         |  SELECT doc_id, source,
         |    row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
         |  FROM documents)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_exact_dropped,
         |  CAST(SUM(CASE WHEN doc_id IN (SELECT doc_id FROM nd)
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_in_neardup_cluster
         |FROM rn GROUP BY 1 ORDER BY 1""".stripMargin,

    "q166_neyman_sample" ->
      s"""WITH st AS (
         |  SELECT event_type, CAST(count(*) AS DOUBLE) AS nh,
         |    sqrt((CAST(count(*) AS DOUBLE)
         |        * CAST(SUM(CAST(value*value AS DECIMAL(38,6)))
         |            AS DOUBLE)
         |      - CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
         |        * CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE))
         |      / (CAST(count(*) AS DOUBLE)
         |        * (CAST(count(*) AS DOUBLE) - 1.0))) AS sd
         |  FROM events GROUP BY 1),
         |tot AS (SELECT CAST(SUM(CAST(nh*sd AS DECIMAL(38,6)))
         |          AS DOUBLE) AS t FROM st),
         |al AS (
         |  SELECT event_type,
         |    CAST(greatest(1, floor(500 * (nh*sd) / t)) AS BIGINT)
         |      AS alloc
         |  FROM st, tot),
         |h AS (
         |  SELECT event_id, event_type,
         |    ${scrambledHashSql("CAST(event_id AS VARCHAR)")} AS hh
         |  FROM events),
         |r AS (
         |  SELECT event_id, event_type,
         |    CAST(row_number() OVER (PARTITION BY event_type
         |      ORDER BY hh, event_id) AS BIGINT) AS rank
         |  FROM h)
         |SELECT r.event_id, r.event_type, r.rank, al.alloc
         |FROM r JOIN al USING (event_type)
         |WHERE r.rank <= al.alloc
         |ORDER BY event_type, rank""".stripMargin,

    "q164_ewma" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
        |      / count(*), 6) AS x
        |  FROM events GROUP BY 1, 2),
        |tt AS (
        |  SELECT event_type, day, x,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS t
        |  FROM daily),
        |u AS (
        |  SELECT event_type, day, x, t,
        |    x * power(0.8, -t) AS u FROM tt),
        |su AS (
        |  SELECT event_type, day, x, t,
        |    CAST(SUM(CAST(CASE WHEN t > 1 THEN u * 0.2 ELSE u END
        |      AS DECIMAL(38,12))) OVER
        |      (PARTITION BY event_type ORDER BY day
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS DOUBLE) AS s
        |  FROM u)
        |SELECT event_type, day, x,
        |  round(power(0.8, t) * s, 6) AS ewma
        |FROM su ORDER BY event_type, day""".stripMargin,

    "q165_kcore" -> {
      // every CTE in the peel chain is MATERIALIZED: DuckDB inlines
      // plain CTEs, and e_{i+1} references e_i three times — unmarked,
      // the pair pipeline would re-expand 3^rounds times
      def rnd(i: Int): String =
        s"""d$i AS MATERIALIZED (SELECT v, count(*) AS n FROM (
           |    SELECT a AS v FROM e$i UNION ALL SELECT b FROM e$i)
           |  GROUP BY 1),
           |k$i AS MATERIALIZED (SELECT v FROM d$i WHERE n >= 2),
           |e${i + 1} AS MATERIALIZED (
           |  SELECT a, b FROM e$i
           |  WHERE a IN (SELECT v FROM k$i)
           |    AND b IN (SELECT v FROM k$i))""".stripMargin
      s"""WITH
         |${pairCtes(cap = 100, threshold = 0.1)},
         |e0 AS MATERIALIZED (
         |  SELECT DISTINCT least(id_a, id_b) AS a,
         |    greatest(id_a, id_b) AS b
         |  FROM pairs WHERE id_a <> id_b),
         |${(0 until 4).map(rnd).mkString(",\n")}
         |SELECT v AS id, CAST(count(*) AS BIGINT) AS deg FROM (
         |  SELECT a AS v FROM e4 UNION ALL SELECT b FROM e4)
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q162_rolling_actives" ->
      """WITH ud AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |mx AS (SELECT max(day) AS mx FROM ud),
        |c AS (
        |  SELECT CAST(unnest(generate_series(CAST(day AS TIMESTAMP),
        |      CAST(day AS TIMESTAMP) + INTERVAL 6 DAY, INTERVAL 1 DAY))
        |    AS DATE) AS day7, user_id
        |  FROM ud)
        |SELECT day7, CAST(count(DISTINCT user_id) AS BIGINT) AS mau7
        |FROM c, mx WHERE day7 <= mx.mx
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q163_conversion_lag" ->
      """WITH fc AS (
        |  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS c_ts
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |fb AS (
        |  SELECT e.user_id, fc.c_ts, min(CAST(e.ts AS TIMESTAMP)) AS p_ts
        |  FROM events e JOIN fc USING (user_id)
        |  WHERE e.event_type = 'purchase'
        |    AND CAST(e.ts AS TIMESTAMP) >= fc.c_ts
        |  GROUP BY 1, 2),
        |lags AS (
        |  SELECT CAST(epoch_us(p_ts) - epoch_us(c_ts) AS DOUBLE)
        |    / 1000000.0 AS lag_s FROM fb)
        |SELECT round(quantile_cont(lag_s, 0.25), 6) AS p25,
        |  round(quantile_cont(lag_s, 0.5), 6) AS p50,
        |  round(quantile_cont(lag_s, 0.9), 6) AS p90
        |FROM lags""".stripMargin,

    "q161_bucketed_join" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q159_trend_slope" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
        |      / count(*), 6) AS y,
        |    CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS DOUBLE) AS x
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(x*x AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(y*y AS DECIMAL(38,6))) AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(x*y AS DECIMAL(38,6))) AS DOUBLE) AS sxy
        |  FROM daily GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n_days,
        |  round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope,
        |  round((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx))*sx) / n, 6)
        |    AS intercept,
        |  round(((n*sxy - sx*sy)*(n*sxy - sx*sy)) /
        |        ((n*sxx - sx*sx)*(n*syy - sy*sy)), 6) AS r2
        |FROM s ORDER BY event_type""".stripMargin,

    "q160_novelty_curve" ->
      """WITH fd AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS day
        |  FROM events GROUP BY 1),
        |nn AS (SELECT day, count(*) AS n_new FROM fd GROUP BY 1)
        |SELECT day, n_new,
        |  CAST(SUM(n_new) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cum_users
        |FROM nn ORDER BY day""".stripMargin,

    "q158_temporal_join" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS prev_t
        |  FROM events),
        |ch AS (
        |  SELECT user_id, ts, event_id, event_type FROM o
        |  WHERE prev_t IS NULL OR prev_t <> event_type),
        |v AS (
        |  SELECT user_id AS h_user,
        |    row_number() OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS version,
        |    event_type AS state, ts AS valid_from
        |  FROM ch),
        |f AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events WHERE event_type = 'purchase')
        |SELECT f.event_id, f.user_id, v.version, v.state, v.valid_from
        |FROM f ASOF LEFT JOIN v
        |  ON f.user_id = v.h_user
        |  AND f.ts >= CAST(v.valid_from AS TIMESTAMP)
        |ORDER BY event_id""".stripMargin,

    "q157_windowed_distinct" ->
      """SELECT time_bucket(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP))
        |    AS w_start,
        |  event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q155_psi_drift" ->
      """WITH evh AS (
        |  SELECT event_id, event_type, value,
        |    CAST(ts AS DATE) < DATE '2024-01-16' AS is_base
        |  FROM events WHERE value IS NOT NULL),
        |cuts AS (
        |  SELECT event_type,
        |    unnest(generate_series(0, 8)) AS ci,
        |    unnest(quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,
        |                                 0.6,0.7,0.8,0.9])) AS c
        |  FROM evh WHERE is_base GROUP BY event_type),
        |binned AS (
        |  SELECT e.event_id, e.event_type, e.is_base,
        |    SUM(CASE WHEN e.value > c.c THEN 1 ELSE 0 END) AS bin
        |  FROM evh e JOIN cuts c USING (event_type)
        |  GROUP BY 1, 2, 3),
        |counts AS (
        |  SELECT event_type, bin,
        |    SUM(CASE WHEN is_base THEN 1 ELSE 0 END) AS nb,
        |    SUM(CASE WHEN NOT is_base THEN 1 ELSE 0 END) AS nc
        |  FROM binned GROUP BY 1, 2),
        |tot AS (SELECT event_type, SUM(nb) AS tb, SUM(nc) AS tc
        |        FROM counts GROUP BY 1),
        |terms AS (
        |  SELECT c.event_type, c.nb, c.nc,
        |    (c.nb + 0.5) / (t.tb + 5.0) AS p,
        |    (c.nc + 0.5) / (t.tc + 5.0) AS q
        |  FROM counts c JOIN tot t USING (event_type))
        |SELECT event_type,
        |  round(CAST(SUM(CAST((q - p) * ln(q / p) AS DECIMAL(38,12)))
        |    AS DOUBLE), 6) AS psi,
        |  CAST(SUM(nb) AS BIGINT) AS n_base,
        |  CAST(SUM(nc) AS BIGINT) AS n_cur
        |FROM terms GROUP BY 1 ORDER BY 1""".stripMargin,

    "q156_mutual_information" ->
      """WITH obs AS (
        |  SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
        |r AS (SELECT lang, count(*) AS rt FROM documents GROUP BY 1),
        |c AS (SELECT source, count(*) AS ct FROM documents GROUP BY 1),
        |n AS (SELECT count(*) AS nt FROM documents)
        |SELECT
        |  round(CAST(SUM(CAST(
        |    (CAST(o AS DOUBLE) / nt) *
        |    ln(CAST(o AS DOUBLE) * nt /
        |       (CAST(rt AS DOUBLE) * ct)) AS DECIMAL(38,12)))
        |    AS DOUBLE), 6) AS mi_nats,
        |  max(nt) AS n
        |FROM obs JOIN r USING (lang) JOIN c USING (source)
        |CROSS JOIN n""".stripMargin,

    "q154_rrf_hybrid" ->
      s"""WITH $bm25Ctes,
         |lextop AS (
         |  SELECT doc_id, r_lex FROM (
         |    SELECT doc_id, CAST(row_number() OVER
         |      (ORDER BY bm25 DESC, doc_id) AS INT) AS r_lex
         |    FROM lexall)
         |  WHERE r_lex <= 50),
         |qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |vecall AS (
         |  SELECT e.vec_id AS doc_id,
         |    ${cosineSql("e.embedding", "qv.qe")} AS cos
         |  FROM embeddings e, qv),
         |vectop AS (
         |  SELECT doc_id, r_vec FROM (
         |    SELECT doc_id, CAST(row_number() OVER
         |      (ORDER BY cos DESC, doc_id) AS INT) AS r_vec
         |    FROM vecall)
         |  WHERE r_vec <= 50),
         |f AS (
         |  SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
         |    l.r_lex, v.r_vec,
         |    round(COALESCE(CAST(1.0 AS DOUBLE) / (60 + l.r_lex), 0.0) +
         |          COALESCE(CAST(1.0 AS DOUBLE) / (60 + v.r_vec), 0.0), 9)
         |      AS rrf
         |  FROM lextop l FULL OUTER JOIN vectop v ON l.doc_id = v.doc_id)
         |SELECT doc_id, r_lex, r_vec, rrf FROM f
         |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,

    "q153_cusum_drift" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    round(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
        |      / count(*), 6) AS day_mean
        |  FROM events GROUP BY 1, 2),
        |base AS (
        |  SELECT event_type,
        |    round(CAST(SUM(CAST(day_mean AS DECIMAL(38,6))) AS DOUBLE)
        |      / count(*), 6) AS mu,
        |    sqrt((CAST(count(*) AS DOUBLE)
        |        * CAST(SUM(CAST(day_mean*day_mean AS DECIMAL(38,6)))
        |            AS DOUBLE)
        |      - CAST(SUM(CAST(day_mean AS DECIMAL(18,2))) AS DOUBLE)
        |        * CAST(SUM(CAST(day_mean AS DECIMAL(18,2))) AS DOUBLE))
        |      / (CAST(count(*) AS DOUBLE)
        |        * (CAST(count(*) AS DOUBLE) - 1.0))) AS sd
        |  FROM daily GROUP BY 1),
        |ws AS (
        |  SELECT d.event_type, d.day, d.day_mean, b.sd,
        |    CAST(SUM(CAST(d.day_mean - b.mu AS DECIMAL(38,6))) OVER
        |      (PARTITION BY d.event_type ORDER BY d.day
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS DOUBLE) AS s
        |  FROM daily d JOIN base b USING (event_type)),
        |c AS (
        |  SELECT event_type, day, day_mean, sd,
        |    round(s - least(MIN(s) OVER
        |      (PARTITION BY event_type ORDER BY day
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0), 6)
        |      AS cusum
        |  FROM ws)
        |SELECT event_type, day, day_mean, cusum,
        |  cusum > 2.0 * sd AS alarm
        |FROM c ORDER BY event_type, day""".stripMargin,

    "q152_hll_intersection" ->
      """WITH a AS (SELECT DISTINCT user_id FROM events
        |           WHERE event_type = 'click'),
        |b AS (SELECT DISTINCT user_id FROM events
        |      WHERE event_type = 'purchase')
        |SELECT
        |  (SELECT count(*) FROM a) AS exact_a,
        |  (SELECT count(*) FROM b) AS exact_b,
        |  (SELECT count(*) FROM
        |    (SELECT user_id FROM a UNION SELECT user_id FROM b))
        |    AS exact_union,
        |  (SELECT count(*) FROM a
        |   WHERE user_id IN (SELECT user_id FROM b)) AS exact_inter,
        |  TRUE AS within_band""".stripMargin,

    "q193_association_rules" ->
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey AS bk, p.p_brand AS it
        |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
        |sup1 AS (SELECT it, count(*) AS s1 FROM b GROUP BY 1),
        |n AS (SELECT count(DISTINCT bk) AS nb FROM b),
        |pr AS (
        |  SELECT a.it AS item_a, c.it AS item_b, count(*) AS support
        |  FROM b a JOIN b c ON a.bk = c.bk AND a.it < c.it
        |  GROUP BY 1, 2),
        |full_pr AS (
        |  SELECT item_a, item_b, support, sa.s1 AS sa, sb.s1 AS sb,
        |    round(CAST(support AS DOUBLE) * nb /
        |          (sa.s1 * CAST(sb.s1 AS DOUBLE)), 6) AS lift
        |  FROM pr JOIN sup1 sa ON sa.it = item_a
        |          JOIN sup1 sb ON sb.it = item_b
        |          CROSS JOIN n
        |  WHERE support >= 5),
        |rules AS (
        |  SELECT item_a AS antecedent, item_b AS consequent,
        |    CAST(support AS BIGINT) AS support,
        |    round(CAST(support AS DOUBLE) / sa, 6) AS confidence, lift
        |  FROM full_pr
        |  UNION ALL
        |  SELECT item_b, item_a, CAST(support AS BIGINT),
        |    round(CAST(support AS DOUBLE) / sb, 6), lift
        |  FROM full_pr)
        |SELECT * FROM rules WHERE confidence >= 0.13
        |ORDER BY antecedent, consequent""".stripMargin,

    "q151_pair_support" ->
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey AS bk, p.p_brand AS it
        |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
        |sup1 AS (SELECT it, count(*) AS s1 FROM b GROUP BY 1),
        |n AS (SELECT count(DISTINCT bk) AS nb FROM b),
        |pr AS (
        |  SELECT a.it AS item_a, c.it AS item_b, count(*) AS support
        |  FROM b a JOIN b c ON a.bk = c.bk AND a.it < c.it
        |  GROUP BY 1, 2)
        |SELECT item_a, item_b, support,
        |  round(CAST(support AS DOUBLE) * nb /
        |        (sa.s1 * CAST(sb.s1 AS DOUBLE)), 6) AS lift
        |FROM pr JOIN sup1 sa ON sa.it = item_a
        |        JOIN sup1 sb ON sb.it = item_b
        |        CROSS JOIN n
        |WHERE support >= 50 ORDER BY item_a, item_b""".stripMargin,

    "q149_entity_resolution" ->
      """WITH RECURSIVE
        |sn AS (SELECT p_partkey AS id, p_name AS k,
        |         string_split(p_name, ' ')[1] AS blk FROM part),
        |rr AS (SELECT *, row_number() OVER
        |         (PARTITION BY blk ORDER BY k, id) AS rn FROM sn),
        |prs AS (
        |  SELECT a.id AS id_a, b.id AS id_b
        |  FROM rr a JOIN rr b
        |    ON a.blk = b.blk AND b.rn - a.rn BETWEEN 1 AND 2
        |  WHERE levenshtein(a.k, b.k) BETWEEN 1 AND 5),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM prs
        |          UNION SELECT id_b, id_a FROM prs),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r2.src, e.dst FROM reach r2
        |  JOIN edges e ON r2.dst = e.src)
        |SELECT p.p_partkey,
        |  CAST(least(p.p_partkey, COALESCE(m.mn, p.p_partkey)) AS BIGINT)
        |    AS cluster
        |FROM part p
        |LEFT JOIN (SELECT src, MIN(dst) AS mn FROM reach GROUP BY src) m
        |  ON m.src = p.p_partkey
        |ORDER BY p.p_partkey""".stripMargin,

    "q150_quantile_norm" ->
      """WITH grid AS (
        |  SELECT unnest(generate_series(0, 100)) AS idx,
        |    unnest(quantile_cont(n_chars,
        |      list_transform(generate_series(0, 100), k -> k / 100.0)))
        |      AS gv
        |  FROM documents),
        |pr AS (
        |  SELECT doc_id, source, n_chars,
        |    percent_rank() OVER
        |      (PARTITION BY source ORDER BY n_chars, doc_id) AS pr
        |  FROM documents)
        |SELECT p.doc_id, p.source, p.n_chars, round(g.gv, 6) AS normalized
        |FROM pr p JOIN grid g ON g.idx = CAST(floor(p.pr * 100) AS INT)
        |ORDER BY p.doc_id""".stripMargin,

    "q148_triangle_census" ->
      s"""WITH
         |${pairCtes(cap = 100, threshold = 0.1)},
         |e AS (SELECT DISTINCT least(id_a, id_b) AS a,
         |        greatest(id_a, id_b) AS b
         |      FROM pairs WHERE id_a <> id_b),
         |deg AS (SELECT v, count(*) AS d FROM (
         |    SELECT a AS v FROM e UNION ALL SELECT b FROM e)
         |  GROUP BY 1),
         |tri AS (
         |  SELECT count(*) AS t
         |  FROM e e1 JOIN e e2 ON e2.a = e1.b
         |       JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
         |w AS (SELECT CAST(SUM((d*(d-1))//2) AS BIGINT) AS w FROM deg)
         |SELECT (SELECT count(*) FROM e) AS n_edges, w.w AS n_wedges,
         |  CAST(tri.t AS BIGINT) AS n_triangles,
         |  round(CASE WHEN w.w > 0
         |    THEN 3.0 * tri.t / w.w ELSE 0.0 END, 6) AS clustering
         |FROM tri, w""".stripMargin,

    "q147_dim_covariance" ->
      """WITH dims AS (SELECT unnest(generate_series(1, 64)) AS d),
        |pr AS (SELECT a.d AS i, b.d AS j FROM dims a
        |       JOIN dims b ON a.d <= b.d),
        |s AS (
        |  SELECT p.i, p.j,
        |    CAST(SUM(CAST(CAST(e.embedding[p.i] AS DOUBLE) *
        |      CAST(e.embedding[p.j] AS DOUBLE) AS DECIMAL(38,12)))
        |      AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(CAST(e.embedding[p.i] AS DOUBLE)
        |      AS DECIMAL(38,12))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(CAST(e.embedding[p.j] AS DOUBLE)
        |      AS DECIMAL(38,12))) AS DOUBLE) AS sy,
        |    CAST(count(*) AS DOUBLE) AS n
        |  FROM embeddings e CROSS JOIN pr p GROUP BY 1, 2)
        |SELECT i - 1 AS i, j - 1 AS j,
        |  -- + 0.0 canonicalizes IEEE -0.0 (round can produce it here but
        |  -- not in Spark, whose round() normalizes the sign)
        |  round((sxy - sx*sy/n) / (n - 1), 6) + 0.0 AS cov
        |FROM s ORDER BY 1, 2""".stripMargin,

    "q144_scd2_history" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS prev_t
        |  FROM events),
        |ch AS (
        |  SELECT user_id, ts, event_id, event_type FROM o
        |  WHERE prev_t IS NULL OR prev_t <> event_type)
        |SELECT user_id,
        |  row_number() OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS version,
        |  event_type, ts AS valid_from,
        |  lead(ts) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |  lead(ts) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |    AS is_current
        |FROM ch ORDER BY user_id, version""".stripMargin,

    "q145_chi_square" ->
      """WITH obs AS (
        |  SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
        |r AS (SELECT lang, count(*) AS rt FROM documents GROUP BY 1),
        |c AS (SELECT source, count(*) AS ct FROM documents GROUP BY 1),
        |n AS (SELECT count(*) AS nt FROM documents),
        |grid AS (
        |  SELECT r.lang, c.source, r.rt, c.ct,
        |    COALESCE(obs.o, 0) AS o, n.nt
        |  FROM r CROSS JOIN c CROSS JOIN n
        |  LEFT JOIN obs ON obs.lang = r.lang AND obs.source = c.source)
        |SELECT
        |  round(CAST(SUM(CAST(
        |    (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE)*ct/nt) *
        |    (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE)*ct/nt) /
        |    (CAST(rt AS DOUBLE)*ct/nt) AS DECIMAL(38,12)))
        |    AS DOUBLE), 6) AS chi2,
        |  (count(DISTINCT lang) - 1) * (count(DISTINCT source) - 1)
        |    AS dof,
        |  max(nt) AS n
        |FROM grid""".stripMargin,

    "q146_mad_outliers" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1),
        |dev AS (
        |  SELECT e.event_type, e.value, m.med,
        |    abs(e.value - m.med) AS ad
        |  FROM events e JOIN med m USING (event_type)),
        |mad AS (
        |  SELECT event_type, quantile_cont(ad, 0.5) AS mad
        |  FROM dev GROUP BY 1)
        |SELECT d.event_type, round(max(d.med), 6) AS med,
        |  round(max(m.mad), 6) AS mad, count(*) AS n,
        |  CAST(SUM(CASE WHEN m.mad > 0 AND
        |        abs(0.6745*(d.value - d.med)/m.mad) > 3.5
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM dev d JOIN mad m USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q143_pmi_pairs" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(list_distinct($toksSql)) AS tok
         |  FROM documents),
         |dfs AS (SELECT tok, count(*) AS dft FROM toks GROUP BY 1),
         |voc AS (SELECT tok, dft FROM dfs WHERE dft >= 20
         |        ORDER BY dft DESC, tok LIMIT 64),
         |vt AS (SELECT t.doc_id, t.tok, v.dft
         |       FROM toks t JOIN voc v USING (tok)),
         |pairs AS (
         |  SELECT a.tok AS tok_a, b.tok AS tok_b,
         |    max(a.dft) AS df_a, max(b.dft) AS df_b, count(*) AS co
         |  FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.tok < b.tok
         |  GROUP BY 1, 2),
         |n AS (SELECT count(*) AS nd FROM documents)
         |SELECT tok_a, tok_b, co,
         |  round(ln(CAST(co AS DOUBLE) * nd /
         |           (CAST(df_a AS DOUBLE) * df_b)), 6) AS pmi
         |FROM pairs, n WHERE co >= 5
         |ORDER BY tok_a, tok_b""".stripMargin,

    "q142_sorted_neighborhood" ->
      """WITH s AS (
        |  SELECT p_partkey AS id, p_name AS k,
        |    string_split(p_name, ' ')[1] AS blk FROM part),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY blk ORDER BY k, id)
        |    AS rn FROM s)
        |SELECT a.id AS id_a, b.id AS id_b, levenshtein(a.k, b.k) AS dist
        |FROM r a JOIN r b
        |  ON a.blk = b.blk AND b.rn - a.rn BETWEEN 1 AND 2
        |WHERE levenshtein(a.k, b.k) BETWEEN 1 AND 5
        |ORDER BY id_a, id_b""".stripMargin,

    "q141_pareto_frontier" ->
      s"""WITH m AS (
         |  SELECT doc_id, len(toks) AS x,
         |    CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS y
         |  FROM (SELECT doc_id, $toksSql AS toks FROM documents))
         |SELECT a.doc_id, a.x AS n_toks, round(a.y, 6) AS diversity
         |FROM m a
         |WHERE NOT EXISTS (SELECT 1 FROM m b
         |  WHERE b.x >= a.x AND b.y >= a.y AND (b.x > a.x OR b.y > a.y))
         |ORDER BY a.doc_id""".stripMargin,

    "q140_group_ols" ->
      """WITH s AS (
        |  SELECT l_returnflag,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice*l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(l_quantity*l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope,
        |  round((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx))*sx) / n, 6)
        |    AS intercept,
        |  round(((n*sxy - sx*sy)*(n*sxy - sx*sy)) /
        |        ((n*sxx - sx*sx)*(n*syy - sy*sy)), 6) AS r2
        |FROM s ORDER BY l_returnflag""".stripMargin,

    "q139_repeated_spans" ->
      s"""WITH t AS (
         |  SELECT doc_id, $toksSql AS toks FROM documents),
         |pos0 AS (
         |  SELECT doc_id, toks,
         |    unnest(generate_series(1, len(toks) - 7)) AS s
         |  FROM t WHERE len(toks) >= 8),
         |occ AS (
         |  SELECT doc_id, s,
         |    ${polyHashSql("array_to_string(list_slice(toks, s, s + 7), ' ')")} AS gh
         |  FROM pos0),
         |rep AS (
         |  SELECT gh FROM (
         |    SELECT gh, count(DISTINCT doc_id) AS nd FROM occ GROUP BY 1)
         |  WHERE nd >= 2),
         |cov AS (
         |  SELECT doc_id, count(DISTINCT pos) AS covered FROM (
         |    SELECT o.doc_id, unnest(generate_series(o.s, o.s + 7)) AS pos
         |    FROM occ o JOIN rep USING (gh))
         |  GROUP BY 1)
         |SELECT t.doc_id, len(t.toks) AS n_toks,
         |  COALESCE(cov.covered, 0) AS covered,
         |  round(CAST(COALESCE(cov.covered, 0) AS DOUBLE) / len(t.toks), 6)
         |    AS dup_frac
         |FROM t LEFT JOIN cov USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "q138_containment_pairs" ->
      s"""WITH
         |${candCtes(cap = 100)},
         |bd AS (
         |  SELECT id_a AS contained_id, id_b AS container_id,
         |         n_shared, a.n_sh AS n_c
         |  FROM shared JOIN sizes a ON a.doc_id = id_a
         |  UNION ALL
         |  SELECT id_b, id_a, n_shared, b.n_sh
         |  FROM shared JOIN sizes b ON b.doc_id = id_b)
         |SELECT contained_id, container_id,
         |  CAST(n_shared AS DOUBLE) / n_c AS containment
         |FROM bd WHERE CAST(n_shared AS DOUBLE) / n_c >= 0.6
         |ORDER BY 1, 2""".stripMargin,

    "q137_incremental_distinct" ->
      """SELECT CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE)
        |    AS week,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
        |  TRUE AS within_10pct
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q133_fuzzy_join" ->
      """SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
        |  CAST(levenshtein(a.s_name, b.s_name) AS INT) AS dist
        |FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
        |WHERE levenshtein(a.s_name, b.s_name) <= 1
        |ORDER BY 1, 2""".stripMargin,

    "q134_concurrency" ->
      """WITH spans AS (
        |  SELECT user_id,
        |    min(epoch_us(CAST(ts AS TIMESTAMP))) AS s_us,
        |    max(epoch_us(CAST(ts AS TIMESTAMP))) AS e_us
        |  FROM events GROUP BY 1),
        |b AS (
        |  SELECT us, SUM(delta) AS delta FROM (
        |    SELECT s_us AS us, 1 AS delta FROM spans
        |    UNION ALL SELECT e_us, -1 FROM spans) x
        |  GROUP BY 1)
        |SELECT us, CAST(SUM(delta) OVER (ORDER BY us
        |  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS concurrent
        |FROM b ORDER BY us""".stripMargin,

    "q135_transition_matrix" ->
      """WITH nxt AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
        |      AS to_type
        |  FROM events),
        |c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |      FROM nxt WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS ntot
        |      FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, c.n,
        |  CAST(c.n AS DOUBLE) / CAST(t.ntot AS DOUBLE) AS p
        |FROM c JOIN t USING (from_type) ORDER BY 1, 2""".stripMargin,

    "q136_source_drift" ->
      s"""WITH tok AS (
         |  SELECT source AS src, tok FROM (
         |    SELECT source, unnest($toksSql) AS tok FROM documents) x
         |  WHERE length(tok) > 0),
         |corpus AS (SELECT tok, CAST(count(*) AS BIGINT) AS c
         |           FROM tok GROUP BY 1),
         |ctot AS (SELECT CAST(SUM(c) AS BIGINT) AS ctot,
         |                CAST(count(*) AS BIGINT) AS v FROM corpus),
         |per_src AS (SELECT src, tok, CAST(count(*) AS BIGINT) AS cs
         |            FROM tok GROUP BY 1, 2),
         |stot AS (SELECT src, CAST(SUM(cs) AS BIGINT) AS stot
         |         FROM per_src GROUP BY 1),
         |terms AS (
         |  SELECT s.src, s.stot,
         |    round(
         |      (CAST(COALESCE(p.cs, 0) + 1 AS DOUBLE) / (s.stot + ctot.v))
         |      * ln((CAST(COALESCE(p.cs, 0) + 1 AS DOUBLE)
         |              / (s.stot + ctot.v))
         |           / (CAST(corpus.c + 1 AS DOUBLE)
         |              / (ctot.ctot + ctot.v))), 9) AS term
         |  FROM corpus CROSS JOIN stot s CROSS JOIN ctot
         |  LEFT JOIN per_src p ON p.src = s.src AND p.tok = corpus.tok)
         |SELECT src AS source, stot AS n_tok,
         |  round(CAST(SUM(CAST(term AS DECIMAL(28,9))) AS DOUBLE), 6)
         |    AS kl_nats
         |FROM terms GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    "q130_bigram_nll" ->
      s"""WITH tok AS (
         |  SELECT doc_id, list_filter($toksSql, w -> length(w) > 0)
         |    AS toks
         |  FROM documents),
         |pr AS (
         |  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
         |  FROM (SELECT doc_id, toks,
         |          unnest(generate_series(1, len(toks) - 1)) AS i
         |        FROM tok WHERE len(toks) >= 2)),
         |big AS (SELECT w1, w2, count(*) AS c12 FROM pr GROUP BY 1, 2),
         |lft AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM big
         |        GROUP BY 1),
         |voc AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS v
         |        FROM (SELECT unnest(toks) AS t FROM tok)),
         |model AS (
         |  SELECT w1, w2, CAST(c12 + 1 AS DOUBLE) / (c1 + v) AS p
         |  FROM big JOIN lft USING (w1), voc)
         |SELECT p2.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  round(CAST(SUM(CAST(round(-ln(p), 9) AS DECIMAL(28,9)))
         |    AS DOUBLE) / count(*), 6) AS nll_per_bigram
         |FROM pr p2 JOIN model USING (w1, w2)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q131_embedding_clusters" ->
      s"""WITH RECURSIVE
         |pairs AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM embeddings a JOIN embeddings b
         |    ON a.label = b.label AND a.vec_id < b.vec_id
         |  WHERE ${cosineSql("a.embedding", "b.embedding")} >= 0.35),
         |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach(s, d) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s)
         |SELECT em.vec_id,
         |  CAST(least(em.vec_id, COALESCE(m.mn, em.vec_id)) AS BIGINT)
         |    AS cluster
         |FROM embeddings em
         |LEFT JOIN (SELECT s, MIN(d) AS mn FROM reach GROUP BY s) m
         |  ON m.s = em.vec_id
         |ORDER BY em.vec_id""".stripMargin,

    "q132_quantized_ann" ->
      """SELECT vec_id AS q_id, CAST(5 AS BIGINT) AS k,
        |  TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 3 ORDER BY 1""".stripMargin,

    "q129_countmin_freq" ->
      """SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_exact,
        |  TRUE AS never_under, TRUE AS within_band
        |FROM lineitem GROUP BY 1
        |ORDER BY n_exact DESC, l_suppkey LIMIT 20""".stripMargin,

    "q127_priority_sample" ->
      s"""WITH b AS (
         |  SELECT source, doc_id, CAST(n_chars AS DOUBLE) AS w,
         |    CAST(n_chars AS DOUBLE) /
         |      (CAST(${scrambledHashSql("CAST(doc_id AS VARCHAR)")} + 1
         |        AS DOUBLE) / 1000000007.0) AS priority
         |  FROM documents),
         |r AS (
         |  SELECT source, doc_id, w, priority,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY priority DESC, doc_id) AS BIGINT) AS rn
         |  FROM b),
         |t AS (SELECT source, priority AS tau FROM r WHERE rn = 6)
         |SELECT r.source, r.doc_id, r.rn,
         |  r.priority,
         |  greatest(r.w, COALESCE(t.tau, 0.0)) AS w_est
         |FROM r LEFT JOIN t USING (source)
         |WHERE r.rn <= 5
         |ORDER BY r.source, r.rn""".stripMargin,

    "q128_unigram_nll" ->
      s"""WITH tok AS (
         |  SELECT doc_id, tok FROM (
         |    SELECT doc_id, unnest($toksSql) AS tok FROM documents)
         |  WHERE length(tok) > 0),
         |cnt AS (SELECT tok, count(*) AS c FROM tok GROUP BY 1),
         |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS ctot,
         |               CAST(count(*) AS BIGINT) AS v FROM cnt),
         |model AS (
         |  SELECT tok, CAST(c + 1 AS DOUBLE) / (ctot + v) AS p
         |  FROM cnt, tot)
         |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tok,
         |  round(CAST(SUM(CAST(round(-ln(p), 9) AS DECIMAL(28,9)))
         |    AS DOUBLE) / count(*), 6) AS nll_per_tok
         |FROM tok t JOIN model USING (tok)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q126_pagerank_directed" ->
      s"""WITH
         |${pairCtes(cap = 100, threshold = 0.1)},
         |de0 AS (SELECT DISTINCT id_a AS src, id_b AS dst FROM pairs),
         |nodes AS (SELECT src AS id FROM de0 UNION SELECT dst FROM de0),
         |odeg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM de0
         |         GROUP BY 1),
         |de AS (SELECT d0.src, d0.dst, o.deg FROM de0 d0
         |       JOIN odeg o ON o.src = d0.src),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
         |pr0 AS (SELECT id, round(CAST(1.0 AS DOUBLE) / nn.n, 9) AS rank
         |        FROM nodes, nn),
         |${directedPrRounds(5)}
         |SELECT id AS doc_id, rank FROM pr5 ORDER BY doc_id""".stripMargin,

    "q125_pagerank" ->
      s"""WITH RECURSIVE
         |${pairCtes(cap = 100, threshold = 0.1)},
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |          UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
         |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges
         |        GROUP BY 1),
         |nn AS (SELECT count(*) AS n FROM deg),
         |pr(iter, id, rank) AS (
         |  SELECT 0, deg.src, round(CAST(1.0 AS DOUBLE) / nn.n, 9)
         |  FROM deg, nn
         |  UNION ALL
         |  SELECT pr.iter + 1, e.dst,
         |    round((CAST(1.0 AS DOUBLE) - 0.85) / (SELECT n FROM nn)
         |      + 0.85 * CAST(SUM(CAST(round(pr.rank / d2.deg, 12)
         |          AS DECIMAL(28,12))) AS DOUBLE), 9)
         |  FROM pr JOIN edges e ON pr.id = e.src
         |          JOIN deg d2 ON d2.src = pr.id
         |  WHERE pr.iter < 5
         |  GROUP BY e.dst, pr.iter)
         |SELECT id AS doc_id, rank FROM pr WHERE iter = 5
         |ORDER BY doc_id""".stripMargin,

    "q124_incremental_rollup" ->
      """SELECT event_type,
        |  count(*) AS n_events,
        |  round(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6)
        |    AS sum_v,
        |  round(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
        |    / count(*), 6) AS avg_v,
        |  min(value) AS min_v,
        |  max(value) AS max_v
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q123_expectations" ->
      """WITH r AS (
        |  SELECT 'li_quantity_range' AS "check",
        |    CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
        |        THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'li_discount_range',
        |    CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
        |        THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'li_shipdate_notnull',
        |    CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'ord_orderkey_unique',
        |    CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'ord_custkey_fk', CAST(count(*) AS BIGINT)
        |  FROM orders o WHERE NOT EXISTS
        |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |  UNION ALL
        |  SELECT 'li_orderkey_fk', CAST(count(*) AS BIGINT)
        |  FROM lineitem l WHERE NOT EXISTS
        |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |SELECT "check", n_violations, n_violations = 0 AS pass
        |FROM r ORDER BY "check"""".stripMargin,

    "q42_stratified_sample" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_total,
        |  TRUE AS within_6sigma
        |FROM lineitem WHERE l_returnflag IN ('A', 'N', 'R')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q43_approx_median" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS med_exact,
        |  TRUE AS within_band
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q49_ann_ivf" ->
      """SELECT vec_id AS q_id, CAST(5 AS BIGINT) AS k,
        |  TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 3 ORDER BY 1""".stripMargin,

    "q56_hll_distinct" ->
      """WITH t AS (
        |  SELECT event_type,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
        |  FROM events GROUP BY 1
        |  UNION ALL
        |  SELECT '__all__',
        |    CAST(count(DISTINCT user_id) AS BIGINT)
        |  FROM events)
        |SELECT event_type, exact_distinct, TRUE AS within_10pct
        |FROM t ORDER BY event_type""".stripMargin,

    "q121_vocab_encode" ->
      s"""WITH tok AS (
         |  SELECT tok FROM (SELECT unnest($toksSql) AS tok FROM documents)
         |  WHERE length(tok) > 0),
         |vocab AS (
         |  SELECT tok,
         |    CAST(row_number() OVER (ORDER BY n DESC, tok) AS INT)
         |      AS token_id
         |  FROM (SELECT tok, count(*) AS n FROM tok GROUP BY 1
         |        ORDER BY n DESC, tok LIMIT 256)),
         |pt AS (
         |  SELECT doc_id, dim1 - 1 AS pos, ftoks[dim1] AS tok
         |  FROM (
         |    SELECT doc_id, ftoks,
         |      unnest(generate_series(1, len(ftoks))) AS dim1
         |    FROM (SELECT doc_id,
         |            list_filter($toksSql, w -> length(w) > 0) AS ftoks
         |          FROM documents WHERE doc_id % 50 = 0)))
         |SELECT pt.doc_id, CAST(pt.pos AS INT) AS pos,
         |  COALESCE(v.token_id, -1) AS token_id
         |FROM pt LEFT JOIN vocab v USING (tok)
         |ORDER BY doc_id, pos""".stripMargin,

    "q122_zorder_key" ->
      """WITH t AS (
        |  SELECT l_orderkey, l_linenumber,
        |    l_partkey % 1024 AS zx, l_suppkey % 1024 AS zy
        |  FROM lineitem WHERE l_orderkey % 97 = 0)
        |SELECT l_orderkey, l_linenumber, zx, zy,
        |  CAST(COALESCE(list_reduce(list_transform(generate_series(0, 9),
        |    i -> ((zx >> i) & 1) * power(2, 2*i)
        |       + ((zy >> i) & 1) * power(2, 2*i + 1)),
        |    (a, b) -> a + b), 0) AS BIGINT) AS z
        |FROM t ORDER BY z, l_orderkey, l_linenumber""".stripMargin,

    "q117_sparse_dot_topk" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    unnest(list_filter($toksSql,
         |      w -> length(w) > 0 AND w NOT IN $stopList)) AS tok
         |  FROM documents),
         |tf AS (
         |  SELECT doc_id, ${polyHashSql("tok")} % 4096 AS term_hash,
         |         CAST(count(*) AS BIGINT) AS tf
         |  FROM toks GROUP BY 1, 2),
         |dfq AS (SELECT term_hash, CAST(count(*) AS BIGINT) AS df
         |        FROM tf GROUP BY 1),
         |m AS (SELECT count(*) AS m FROM documents),
         |wgt AS (
         |  SELECT doc_id, term_hash,
         |    round(tf * ln((m + 1.0) / (df + 1)), 6) AS w
         |  FROM tf JOIN dfq USING (term_hash) CROSS JOIN m
         |  WHERE df <= 50)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  round(CAST(SUM(CAST(round(a.w * b.w, 9) AS DECIMAL(28,9)))
         |    AS DOUBLE), 6) AS dot
         |FROM wgt a JOIN wgt b
         |  ON a.term_hash = b.term_hash AND a.doc_id < b.doc_id
         |GROUP BY 1, 2
         |ORDER BY dot DESC, id_a, id_b LIMIT 20""".stripMargin,

    "q118_skew_profile" ->
      """WITH c AS (SELECT l_suppkey, count(*) AS n FROM lineitem
        |           GROUP BY 1),
        |m AS (SELECT CAST(SUM(n) AS DOUBLE) / count(*) AS mean_n FROM c)
        |SELECT l_suppkey, n, round(n / m.mean_n, 6) AS skew
        |FROM c, m ORDER BY n DESC, l_suppkey LIMIT 15""".stripMargin,

    "q119_funnel" ->
      """WITH t1 AS (
        |  SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END)
        |    AS t1
        |  FROM events GROUP BY 1 HAVING t1 IS NOT NULL),
        |t2 AS (
        |  SELECT e.user_id,
        |    min(CASE WHEN e.event_type = 'click' AND e.ts >= t1.t1
        |        THEN e.ts END) AS t2
        |  FROM events e JOIN t1 USING (user_id)
        |  GROUP BY 1 HAVING t2 IS NOT NULL),
        |t3 AS (
        |  SELECT e.user_id,
        |    min(CASE WHEN e.event_type = 'purchase' AND e.ts >= t2.t2
        |        THEN e.ts END) AS t3
        |  FROM events e JOIN t2 USING (user_id)
        |  GROUP BY 1 HAVING t3 IS NOT NULL)
        |SELECT (SELECT count(*) FROM t1) AS n_stage1,
        |  (SELECT count(*) FROM t2) AS n_stage2,
        |  (SELECT count(*) FROM t3) AS n_stage3""".stripMargin,

    "q120_retention" ->
      """WITH cohort AS (
        |  SELECT user_id,
        |    CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
        |  FROM events GROUP BY 1),
        |active AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
        |  FROM events)
        |SELECT cohort.cohort_week,
        |  CAST(date_diff('day', cohort.cohort_week, active.wk) / 7 AS INT)
        |    AS week_offset,
        |  count(*) AS n_users
        |FROM active JOIN cohort USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q112_histogram" ->
      """SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bin,
        |  count(*) AS n,
        |  CAST(CAST(floor(l_extendedprice / 5000.0) AS BIGINT) * 5000.0
        |    AS DOUBLE) AS lo_edge
        |FROM lineitem WHERE l_extendedprice IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q113_winsorized_mean" ->
      """WITH f AS (
        |  SELECT l_returnflag,
        |    quantile_cont(l_extendedprice, 0.05) AS lo,
        |    quantile_cont(l_extendedprice, 0.95) AS hi
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag,
        |  round(CAST(SUM(CAST(round(
        |      greatest(f.lo, least(f.hi, l.l_extendedprice)), 6)
        |    AS DECIMAL(28,6))) AS DOUBLE) / count(*), 6) AS wins_mean,
        |  count(*) AS n
        |FROM lineitem l JOIN f USING (l_returnflag)
        |WHERE l.l_extendedprice IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q114_quality_deciles" ->
      """WITH t AS (
        |  SELECT source, n_chars,
        |    CAST(ntile(10) OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS INT) AS decile
        |  FROM documents)
        |SELECT source, decile, count(*) AS n_docs,
        |  CAST(min(n_chars) AS BIGINT) AS min_score,
        |  CAST(max(n_chars) AS BIGINT) AS max_score
        |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q115_stopword_discovery" ->
      s"""WITH dt AS (
         |  SELECT DISTINCT doc_id, tok FROM (
         |    SELECT doc_id, unnest($toksSql) AS tok FROM documents)
         |  WHERE length(tok) > 0),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         |dfreq AS (SELECT tok, count(*) AS df FROM dt GROUP BY 1)
         |SELECT tok, df,
         |  round(CAST(df AS DOUBLE) / n.n_docs, 6) AS df_frac
         |FROM dfreq, n
         |WHERE round(CAST(df AS DOUBLE) / n.n_docs, 6) >= 0.4
         |ORDER BY df DESC, tok""".stripMargin,

    "q116_normalized_dedup" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_total,
        |  CAST(count(DISTINCT text) AS BIGINT) AS n_raw_distinct,
        |  CAST(count(DISTINCT trim(regexp_replace(regexp_replace(
        |      lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')))
        |    AS BIGINT) AS n_norm_distinct
        |FROM documents""".stripMargin,

    "q108_cluster_reps" ->
      s"""WITH RECURSIVE
         |${pairCtes(cap = 100, threshold = 0.1)},
         |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach(s, d) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
         |clus AS (
         |  SELECT doc.doc_id,
         |    CAST(least(doc.doc_id, COALESCE(m.mn, doc.doc_id)) AS BIGINT)
         |      AS cluster,
         |    doc.n_chars
         |  FROM documents doc
         |  LEFT JOIN (SELECT s, MIN(d) AS mn FROM reach GROUP BY s) m
         |    ON m.s = doc.doc_id),
         |sel AS (
         |  SELECT cluster, doc_id, n_chars,
         |    max(n_chars) OVER (PARTITION BY cluster) AS mx
         |  FROM clus)
         |SELECT cluster,
         |  CAST(min(CASE WHEN n_chars = mx THEN doc_id END) AS BIGINT)
         |    AS rep_id,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(max(n_chars) AS BIGINT) AS max_score
         |FROM sel GROUP BY 1 ORDER BY 1""".stripMargin,

    "q109_source_overlap" ->
      s"""WITH f AS (
         |  SELECT DISTINCT source, $simhashSql AS fp FROM documents)
         |SELECT a.source AS source_a, b.source AS source_b,
         |  count(*) AS n_shared
         |FROM f a JOIN f b ON a.fp = b.fp AND a.source < b.source
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q110_budget_select" ->
      s"""WITH t AS (
         |  SELECT source, doc_id, n_chars,
         |    CAST(len($toksSql) AS INT) AS n_tok
         |  FROM documents),
         |c AS (
         |  SELECT source, n_tok,
         |    SUM(n_tok) OVER (PARTITION BY source
         |      ORDER BY n_chars DESC, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM t)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_selected,
         |  CAST(SUM(n_tok) AS BIGINT) AS tokens_used
         |FROM c WHERE cum <= 10000 GROUP BY 1 ORDER BY 1""".stripMargin,

    "q111_token_entropy" ->
      s"""WITH tok AS (
         |  SELECT doc_id, tok FROM (
         |    SELECT doc_id, unnest($toksSql) AS tok FROM documents)
         |  WHERE length(tok) > 0),
         |cnt AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
         |tot AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM cnt
         |        GROUP BY 1)
         |SELECT cnt.doc_id, max(tot.n) AS n_tok,
         |  round(CAST(SUM(CAST(round((c / n) * ln(n / c), 9)
         |    AS DECIMAL(28,9))) AS DOUBLE), 6) AS entropy
         |FROM cnt JOIN tot USING (doc_id)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q101_prefix_jaccard" ->
      s"""WITH t AS (
         |  SELECT doc_id, $toksSql AS toks FROM documents),
         |d AS (
         |  SELECT doc_id, ${shinglesSql("toks", 4)} AS gs FROM t),
         |d2 AS (SELECT doc_id, gs, len(gs) AS m FROM d WHERE len(gs) > 0),
         |tok AS (SELECT doc_id, unnest(gs) AS g FROM d2),
         |ov AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
         |  FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b,
         |  round(CAST(inter AS DOUBLE) / (ma.m + mb.m - inter), 6) AS jac
         |FROM ov
         |JOIN d2 ma ON ov.id_a = ma.doc_id
         |JOIN d2 mb ON ov.id_b = mb.doc_id
         |WHERE CAST(inter AS DOUBLE) / (ma.m + mb.m - inter) >= 0.8
         |ORDER BY 1, 2""".stripMargin,

    "q102_salted_join" ->
      s"""SELECT p.p_brand,
         |  round(${sumExact6Sql("l.l_extendedprice")}, 2) AS revenue,
         |  count(*) AS n_lines
         |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q103_vocab_coverage" ->
      s"""WITH tok AS (
         |  SELECT tok FROM (SELECT unnest($toksSql) AS tok FROM documents)
         |  WHERE length(tok) > 0),
         |freq AS (SELECT tok, count(*) AS n FROM tok GROUP BY 1),
         |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM freq),
         |top AS (SELECT tok, n FROM freq ORDER BY n DESC, tok LIMIT 30)
         |SELECT CAST(row_number() OVER (ORDER BY n DESC, tok) AS INT)
         |    AS rank,
         |  tok, n,
         |  round(CAST(SUM(n) OVER (ORDER BY n DESC, tok
         |      ROWS UNBOUNDED PRECEDING) AS DOUBLE) / tot.n_total, 6)
         |    AS cum_share
         |FROM top, tot ORDER BY n DESC, tok""".stripMargin,

    "q104_bigram_topk" ->
      s"""WITH t AS (
         |  SELECT list_filter($toksSql, w -> length(w) > 0) AS toks
         |  FROM documents),
         |b AS (
         |  SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
         |    i -> toks[i] || ' ' || toks[i + 1])) AS bigram
         |  FROM t WHERE len(toks) >= 2)
         |SELECT bigram, count(*) AS n FROM b
         |GROUP BY 1 ORDER BY n DESC, bigram LIMIT 20""".stripMargin,

    "q105_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN lag(us) OVER w IS NULL
        |           OR us - lag(us) OVER w > 1800 * 1000000 THEN 1
        |         ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |sess AS (
        |  SELECT user_id, us,
        |    CAST(SUM(new_s) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |  FROM flagged)
        |SELECT user_id, session_seq,
        |  count(*) AS n_events,
        |  CAST(max(us) - min(us) AS BIGINT) AS dur_us
        |FROM sess GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q106_embedding_centroids" ->
      """WITH e AS (
        |  SELECT label, dim1 - 1 AS dim,
        |    round(CAST(embedding[dim1] AS DOUBLE), 6) AS v
        |  FROM (SELECT label, embedding,
        |          unnest(generate_series(1, len(embedding))) AS dim1
        |        FROM embeddings))
        |SELECT label, CAST(dim AS INT) AS dim,
        |  round(CAST(SUM(CAST(v AS DECIMAL(28,6))) AS DOUBLE) / count(*), 6)
        |    AS centroid
        |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q107_iqr_outliers" ->
      """WITH f AS (
        |  SELECT l_returnflag,
        |    quantile_cont(l_extendedprice, 0.25) AS q1,
        |    quantile_cont(l_extendedprice, 0.75) AS q3
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag,
        |  round(f.q1, 6) AS q1, round(f.q3, 6) AS q3,
        |  count(*) AS n,
        |  CAST(SUM(CASE WHEN l.l_extendedprice < f.q1 - (f.q3 - f.q1) * 1.5
        |             OR l.l_extendedprice > f.q3 + (f.q3 - f.q1) * 1.5
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM lineitem l JOIN f USING (l_returnflag)
        |GROUP BY 1, f.q1, f.q3 ORDER BY 1""".stripMargin,

    "q99_zscore_scaling" ->
      """WITH st AS (
        |  SELECT l_returnflag,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |      / count(*) AS mu,
        |    sqrt((CAST(count(*) AS DOUBLE)
        |        * CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(38,6)))
        |            AS DOUBLE)
        |      - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |        * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE))
        |      / (CAST(count(*) AS DOUBLE)
        |        * (CAST(count(*) AS DOUBLE) - 1.0))) AS sigma
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
        |  round((l.l_quantity - st.mu) / st.sigma, 6) AS z
        |FROM lineitem l JOIN st USING (l_returnflag)
        |WHERE l.l_orderkey % 100 = 0
        |ORDER BY l_orderkey, l_linenumber, l_returnflag""".stripMargin,

    "q100_bm25_topk" ->
      s"""WITH $bm25Ctes
         |SELECT doc_id, bm25 FROM lexall
         |ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin,

    "q98_group_topk_operator" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice FROM orders
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice DESC, o_orderkey) <= 3
        |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey"""
        .stripMargin,

    "q97_upsert_refresh" ->
      """WITH merged AS (
        |  SELECT doc_id, source, n_chars FROM documents
        |  WHERE doc_id % 10 <> 0
        |  UNION ALL
        |  SELECT doc_id, source, -n_chars AS n_chars FROM documents
        |  WHERE doc_id % 10 = 0)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(SUM(CASE WHEN n_chars < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_updated
        |FROM merged GROUP BY source ORDER BY source""".stripMargin,

    "q96_chunk_tokens" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    list_filter($toksSql, w -> length(w) > 0) AS toks
         |  FROM documents),
         |s AS (
         |  SELECT doc_id, toks,
         |    unnest(range(0, greatest(len(toks) - 16, 1), 48)) AS st
         |  FROM t WHERE len(toks) > 0)
         |SELECT doc_id, CAST(st / 48 AS BIGINT) AS chunk_id,
         |  CAST(len(list_slice(toks, st + 1, st + 64)) AS BIGINT) AS n_tok,
         |  array_to_string(list_slice(toks, st + 1, st + 64), ' ')
         |    AS chunk_text
         |FROM s ORDER BY doc_id, chunk_id""".stripMargin,

    "q94_stream_enrich" ->
      """SELECT e.event_type,
        |  COALESCE(c.c_mktsegment, 'unmatched') AS segment,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2 ORDER BY event_type, segment""".stripMargin,

    "q95_stream_stream_join" ->
      """WITH e AS (SELECT user_id, ts FROM events
        |           WHERE event_type = 'error'),
        |v AS (SELECT user_id, ts FROM events WHERE event_type = 'view')
        |SELECT e.user_id, CAST(count(*) AS BIGINT) AS n_views
        |FROM e JOIN v ON e.user_id = v.user_id
        |  AND v.ts >= e.ts AND v.ts <= e.ts + INTERVAL 30 MINUTE
        |GROUP BY e.user_id ORDER BY e.user_id""".stripMargin,

    "q90_heavy_hitters" ->
      s"""WITH toks AS (
         |  SELECT tok FROM (SELECT unnest($toksSql) AS tok FROM documents)
         |  WHERE length(tok) > 0),
         |t AS (SELECT count(*) AS n FROM toks)
         |SELECT tok, CAST(count(*) AS BIGINT) AS cnt
         |FROM toks, t GROUP BY tok, t.n
         |HAVING count(*) * 40 >= t.n
         |ORDER BY cnt DESC, tok""".stripMargin,

    "q91_orc_roundtrip" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "q92_partitioned_sink" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE source = 'src3'
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "q93_hash_split" ->
      s"""WITH h AS (
         |  SELECT source,
         |    ${polyHashSql("CAST(doc_id AS VARCHAR)")} % 100 AS b
         |  FROM documents)
         |SELECT CASE WHEN b < 98 THEN 'train' WHEN b < 99 THEN 'val'
         |            ELSE 'test' END AS split,
         |  source, CAST(count(*) AS BIGINT) AS n
         |FROM h GROUP BY 1, 2 ORDER BY split, source""".stripMargin,

    "q89_deterministic_sample" ->
      s"""WITH h AS (
         |  SELECT doc_id, source,
         |    ${scrambledHashSql("CAST(doc_id AS VARCHAR)")} AS hh
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, source,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY hh, doc_id) AS BIGINT) AS rank
         |  FROM h)
         |SELECT doc_id, source, rank FROM r WHERE rank <= 5
         |ORDER BY source, rank""".stripMargin,

    "q88_curation_pipeline" ->
      s"""WITH RECURSIVE
         |${pairCtes(cap = 100, threshold = 0.1)},
         |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach(s, d) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
         |canon AS (
         |  SELECT doc.* FROM documents doc
         |  LEFT JOIN (SELECT s, MIN(d) AS mn FROM reach GROUP BY s) m
         |    ON m.s = doc.doc_id
         |  WHERE least(doc.doc_id, COALESCE(m.mn, doc.doc_id))
         |    = doc.doc_id),
         |qt AS (SELECT doc_id, $toksSql AS toks FROM canon),
         |qs AS (
         |  SELECT doc_id, len(toks) AS n_words,
         |    CAST(list_reduce(list_transform(toks,
         |        w -> CAST(len(w) AS BIGINT)), (a, b) -> a + b) AS DOUBLE)
         |      / len(toks) AS mean_wlen,
         |    CAST(len(list_filter(toks,
         |        w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
         |      / len(toks) AS frac_alpha,
         |    len(list_filter(toks, w -> w IN $stopList)) AS n_stop
         |  FROM qt)
         |SELECT c.source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(len(regexp_split_to_array(trim(c.text), '\\s+')))
         |    AS BIGINT) AS n_tok
         |FROM canon c JOIN qs USING (doc_id)
         |WHERE qs.n_words BETWEEN 10 AND 100000
         |  AND qs.mean_wlen BETWEEN 3.0 AND 10.0
         |  AND qs.frac_alpha > 0.8 AND qs.n_stop >= 2
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q87_jsonl_scan" ->
      s"""SELECT doc_id, lang,
         |  CAST(len($toksSql) AS BIGINT) AS n_tok, n_chars
         |FROM read_json('$fixturesDir/docs_sample.jsonl',
         |  format = 'newline_delimited',
         |  columns = {doc_id: 'BIGINT', text: 'VARCHAR', lang: 'VARCHAR',
         |             source: 'VARCHAR', n_chars: 'BIGINT'})
         |ORDER BY doc_id""".stripMargin,

    "q85_repetition_stats" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |b AS (
         |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tok,
         |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
         |    unnest(${bigramsSql("toks")}) AS bg
         |  FROM t WHERE len(toks) >= 2),
         |c AS (
         |  SELECT doc_id, n_tok, n_distinct, bg,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM b GROUP BY 1, 2, 3, 4)
         |SELECT doc_id, n_tok, n_distinct,
         |  round(1.0 - CAST(n_distinct AS DOUBLE) / n_tok, 6) AS dup_frac,
         |  round(CAST(max(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6)
         |    AS top_bigram_frac
         |FROM c GROUP BY 1, 2, 3 ORDER BY doc_id""".stripMargin,

    "q86_pii_scrub" -> {
      val email = PipelineOps.EmailRe
      val phone = PipelineOps.PhoneRe
      val ipv4 = PipelineOps.Ipv4Re
      s"""WITH t AS (
         |  SELECT doc_id, text || ' contact u' || CAST(doc_id AS VARCHAR)
         |    || '@ex' || CAST(doc_id % 7 AS VARCHAR) || '.org or +1-555-'
         |    || lpad(CAST(doc_id AS VARCHAR), 4, '0')
         |    || ' ip 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1'
         |    AS text
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, text,
         |    regexp_replace(text, '$email', '<EMAIL>', 'g') AS t1
         |  FROM t),
         |r2 AS (
         |  SELECT *, regexp_replace(t1, '$phone', '<PHONE>', 'g') AS t2
         |  FROM r)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$email')) AS BIGINT)
         |    AS n_emails,
         |  CAST(len(regexp_extract_all(t1, '$phone')) AS BIGINT)
         |    AS n_phones,
         |  CAST(len(regexp_extract_all(t2, '$ipv4')) AS BIGINT) AS n_ips,
         |  CAST(length(regexp_replace(t2, '$ipv4', '<IP>', 'g'))
         |    AS BIGINT) AS redacted_len,
         |  CAST(len(regexp_extract_all(text, '$email'))
         |    + len(regexp_extract_all(t1, '$phone'))
         |    + len(regexp_extract_all(t2, '$ipv4')) > 0 AS BIGINT)
         |    AS has_pii
         |FROM r2 ORDER BY doc_id""".stripMargin
    },

    "q80_quality_rules" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |m AS (
         |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_words,
         |    CAST(list_reduce(list_transform(toks,
         |        w -> CAST(len(w) AS BIGINT)), (a, b) -> a + b) AS DOUBLE)
         |      / len(toks) AS mean_wlen,
         |    CAST(len(list_filter(toks,
         |        w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
         |      / len(toks) AS frac_alpha,
         |    CAST(len(list_filter(toks, w -> w IN $stopList)) AS BIGINT)
         |      AS n_stop
         |  FROM t),
         |f AS (
         |  SELECT *,
         |    CAST(n_words BETWEEN 10 AND 100000 AS BIGINT) AS f_len,
         |    CAST(mean_wlen BETWEEN 3.0 AND 10.0 AS BIGINT) AS f_wlen,
         |    CAST(frac_alpha > 0.8 AS BIGINT) AS f_alpha,
         |    CAST(n_stop >= 2 AS BIGINT) AS f_stop
         |  FROM m)
         |SELECT doc_id, n_words, round(mean_wlen, 4) AS mean_wlen,
         |  round(frac_alpha, 4) AS frac_alpha, n_stop,
         |  f_len, f_wlen, f_alpha, f_stop,
         |  f_len * f_wlen * f_alpha * f_stop AS pass
         |FROM f ORDER BY doc_id""".stripMargin,

    "q81_pack_sequences" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, CAST(len($toksSql) AS BIGINT) AS n_tok
         |  FROM documents),
         |o AS (
         |  SELECT doc_id, lang, n_tok,
         |    CAST(SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id)
         |      AS BIGINT) AS end_off
         |  FROM t)
         |SELECT doc_id, lang, n_tok,
         |  end_off - n_tok AS start_off, end_off,
         |  CAST(floor((end_off - n_tok) / 512.0) AS BIGINT) AS first_chunk,
         |  CAST(floor((end_off - 1) / 512.0)
         |    - floor((end_off - n_tok) / 512.0) + 1 AS BIGINT) AS n_chunks,
         |  CAST(floor((end_off - 1) / 512.0)
         |    > floor((end_off - n_tok) / 512.0) AS BIGINT) AS crosses
         |FROM o ORDER BY lang, doc_id""".stripMargin,

    "q82_mixture_weights" ->
      s"""WITH per AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(CAST(len($toksSql) AS BIGINT)) AS BIGINT) AS n_tok
         |  FROM documents GROUP BY 1),
         |s AS (
         |  SELECT *,
         |    CAST(n_tok AS DOUBLE) / CAST(SUM(n_tok) OVER () AS DOUBLE)
         |      AS p,
         |    round(sqrt(CAST(n_tok AS DOUBLE)
         |      / CAST(SUM(n_tok) OVER () AS DOUBLE)), 6) AS w6
         |  FROM per),
         |n AS (
         |  SELECT *, CAST(SUM(CAST(w6 AS DECIMAL(38,6))) OVER () AS DOUBLE)
         |    AS sum_w
         |  FROM s)
         |SELECT source, n_docs, n_tok, round(p, 6) AS p_tok, w6 AS w_temp,
         |  round(w6 / sum_w, 6) AS share,
         |  CAST(floor(round(w6 / sum_w, 6) * 1000000) AS BIGINT)
         |    AS planned_docs
         |FROM n ORDER BY source""".stripMargin,

    "q83_band_join" ->
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(count(DISTINCT p_partkey) AS BIGINT) AS n_parts,
        |  round(CAST(SUM(CAST(l_extendedprice / l_quantity - p_retailprice
        |    AS DECIMAL(38,6))) AS DOUBLE), 4) AS sum_diff
        |FROM lineitem JOIN part
        |  ON l_extendedprice / l_quantity
        |     BETWEEN p_retailprice - 0.05 AND p_retailprice + 0.05
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q84_decontam" ->
      s"""WITH g AS (
         |  SELECT doc_id, unnest(${shinglesSql(toksSql, 8)}) AS g
         |  FROM documents),
         |bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 50 = 0),
         |corpus AS (SELECT doc_id, g FROM g WHERE doc_id % 50 <> 0)
         |SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |  CAST(count(b.g) AS BIGINT) AS n_hit,
         |  round(CAST(count(b.g) AS DOUBLE) / count(*), 6) AS contam
         |FROM corpus c LEFT JOIN bench b ON c.g = b.g
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q76_csv_scan" ->
      s"""SELECT CAST(ID AS BIGINT) AS id,
         |  CASE WHEN "Primary Type" IN ('NULL', '') THEN NULL
         |       ELSE "Primary Type" END AS primary_type,
         |  CAST(Arrest = 'true' AS INT) AS arrest_i,
         |  TRY_CAST(CASE WHEN District IN ('NULL', '') THEN NULL
         |           ELSE District END AS INT) AS district,
         |  TRY_CAST(CASE WHEN Latitude IN ('NULL', '') THEN NULL
         |           ELSE Latitude END AS DOUBLE) AS latitude,
         |  try_strptime(Date, '%m/%d/%Y %I:%M:%S %p') AS ts,
         |  CAST(hour(try_strptime(Date, '%m/%d/%Y %I:%M:%S %p')) AS INT)
         |    AS hr
         |FROM read_csv('$fixturesDir/crime_sample.csv',
         |  header = true, all_varchar = true)
         |WHERE ID <> 'ID'
         |ORDER BY id""".stripMargin,
    "q75_weighted_median" ->
      """WITH cw AS (
        |  SELECT l_returnflag, l_quantity,
        |    SUM(1.0 + l_discount) OVER (PARTITION BY l_returnflag
        |      ORDER BY l_quantity) AS cum_w,
        |    SUM(1.0 + l_discount) OVER (PARTITION BY l_returnflag) AS tot_w
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  MIN(l_quantity) FILTER (WHERE cum_w >= tot_w / 2.0) AS wmed
        |FROM cw GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "q73_quantize_int8" ->
      """WITH qz AS (
        |  SELECT vec_id,
        |    list_max(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE)))) AS m,
        |    embedding
        |  FROM embeddings),
        |codes AS (
        |  SELECT vec_id, CAST(m AS FLOAT) AS scale,
        |    list_transform(embedding,
        |      x -> CASE WHEN m > 0
        |           THEN CAST(round(CAST(x AS DOUBLE) * 127.0 / m) AS INT)
        |           ELSE 0 END) AS q
        |  FROM qz)
        |SELECT vec_id, scale,
        |  CAST(list_reduce(list_transform(q, x -> CAST(x AS BIGINT)),
        |    (a, b) -> a + b) AS BIGINT) AS sum_q,
        |  CAST(list_min(q) AS INT) AS min_q,
        |  CAST(list_max(q) AS INT) AS max_q
        |FROM codes ORDER BY vec_id""".stripMargin,

    "q71_tpch_q3" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         |  ${sumExact6Sql("l_extendedprice*(1-l_discount)")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q72_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         / count(*) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    "q66_intersect_all" ->
      """SELECT 'both' AS leg, l_partkey, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT l_partkey FROM lineitem WHERE l_discount > 0.08
        |  INTERSECT ALL
        |  SELECT l_partkey FROM lineitem WHERE l_quantity > 40)
        |GROUP BY 2
        |UNION ALL
        |SELECT 'only_a', l_partkey, CAST(count(*) AS BIGINT) FROM (
        |  SELECT l_partkey FROM lineitem WHERE l_discount > 0.08
        |  EXCEPT ALL
        |  SELECT l_partkey FROM lineitem WHERE l_quantity > 40)
        |GROUP BY 2
        |ORDER BY leg, l_partkey""".stripMargin,

    "q67_array_lambdas" ->
      s"""SELECT doc_id,
         |  CAST(len(list_filter($toksSql, t -> length(t) > 4)) AS INT)
         |    AS n_long,
         |  CAST(CASE WHEN len(list_filter($toksSql, t -> t = 'spark')) > 0
         |       THEN 1 ELSE 0 END AS INT) AS has_spark,
         |  CAST(CASE WHEN len(list_filter($toksSql, t -> length(t) = 0)) = 0
         |       THEN 1 ELSE 0 END AS INT) AS all_nonempty,
         |  COALESCE(list_reduce(list_transform($toksSql,
         |    t -> CAST(length(t) AS BIGINT)), (a, b) -> a + b), 0)
         |    AS total_chars
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q68_pivot_sum" ->
      """SELECT l_returnflag,
        |  COALESCE(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
        |    FILTER (WHERE l_linestatus = 'F') AS DOUBLE), 0.0) AS qty_F,
        |  COALESCE(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
        |    FILTER (WHERE l_linestatus = 'O') AS DOUBLE), 0.0) AS qty_O
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "q69_unpivot" ->
      """SELECT p_partkey, measure, val FROM (
        |  SELECT p_partkey, 'size' AS measure,
        |         CAST(p_size AS DOUBLE) AS val FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'retail', p_retailprice FROM part)
        |ORDER BY p_partkey, measure""".stripMargin,

    "q70_range_frame" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
        |    OVER (PARTITION BY l_suppkey ORDER BY l_quantity
        |          RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING)
        |    AS DOUBLE) AS near_qty_sum
        |FROM lineitem WHERE l_suppkey <= 5
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    "q61_grouping_id" ->
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
        |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag ASC NULLS FIRST,
        |         l_linestatus ASC NULLS FIRST""".stripMargin,

    "q62_rank_windows" ->
      s"""SELECT l_suppkey, revenue,
         |  CAST(rank() OVER w AS INT) AS rnk,
         |  CAST(dense_rank() OVER w AS INT) AS drnk,
         |  round(percent_rank() OVER w, 9) AS prnk,
         |  CAST(ntile(4) OVER w AS INT) AS quartile
         |FROM (SELECT l_suppkey,
         |        ${sumExact6Sql("l_extendedprice*(1-l_discount)")} AS revenue
         |      FROM lineitem GROUP BY l_suppkey)
         |WINDOW w AS (ORDER BY revenue DESC, l_suppkey)
         |ORDER BY l_suppkey""".stripMargin,

    "q63_sorted_collect" ->
      """SELECT l_suppkey,
        |  array_to_string(list_sort(list(DISTINCT l_returnflag)), ',')
        |    AS flags,
        |  array_to_string(list_slice(list_sort(list(l_linenumber)), 1, 20),
        |    ',') AS linenos_head
        |FROM lineitem WHERE l_suppkey <= 3
        |GROUP BY 1 ORDER BY l_suppkey""".stripMargin,

    "q64_json_map" ->
      """SELECT event_id,
        |  CAST(len(json_keys(props)) AS INT) AS n_keys,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_val
        |FROM events ORDER BY event_id""".stripMargin,

    "q65_date_arithmetic" ->
      """SELECT o_orderkey,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')
        |       AS INT) AS days_to_ref,
        |  CAST(o_orderdate AS DATE) + 30 AS due_date,
        |  round((2002 - year(o_orderdate)) * 12 + (1 - month(o_orderdate))
        |    + CASE WHEN day(o_orderdate) = 1 THEN 0.0
        |           ELSE (1 - day(o_orderdate)) / 31.0 END, 6)
        |    AS months_to_ref,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q60_cosine_neardup_lsh" ->
      cosineLshPairsSql(threshold = 0.25, bits = 16, tables = 4),

    // q60's full recompute over corpus∪batch, filtered to
    // batch-incident pairs — the engine side computes it from the
    // persisted embedding LSH index without touching corpus-corpus
    // pairs, so hash equality proves the incremental decomposition
    "q245_incremental_embed" ->
      cosineLshPairsSql(threshold = 0.25, bits = 16, tables = 4,
        incidentFilter = "AND (id_a % 5 = 3 OR id_b % 5 = 3)"),

    "q32_minhash_lsh_pairs" ->
      minhashBandPairsSql(k = 3, numHashes = 12, rowsPerBand = 3,
        threshold = 0.05),

    "q34_ann_lsh" ->
      s"""WITH b AS (
         |  SELECT vec_id, embedding, ${lshBucketSql("embedding", 4)}
         |    AS bucket
         |  FROM embeddings)
         |${annTopKSql(
            "SELECT q.q_id, q.q_emb, c.vec_id, c.embedding " +
              "FROM b c JOIN (SELECT vec_id AS q_id, embedding AS q_emb, " +
              "bucket FROM b WHERE vec_id < 3) q " +
              "ON c.bucket = q.bucket AND c.vec_id <> q.q_id", 5)}"""
        .stripMargin,

    "q74_ann_lsh_multi" ->
      s"""WITH cb AS (
         |  SELECT vec_id, embedding,
         |    ${multiBucketCols(bits = 4, tables = 4)}
         |  FROM embeddings),
         |qb AS (SELECT vec_id AS q_id, embedding AS q_emb, b0, b1, b2, b3
         |       FROM cb WHERE vec_id < 3)
         |${annTopKSql(
            "SELECT DISTINCT q.q_id, q.q_emb, c.vec_id, c.embedding " +
              "FROM cb c JOIN qb q ON (" +
              anyBucketMatch("c", "q", 4) + ") AND c.vec_id <> q.q_id", 5)}"""
        .stripMargin,

    // q58 CONTRACT oracle (q42/q49 pattern): the exact-dup pair count is
    // recomputed independently (group docs by the sorted DISTINCT
    // 3-shingle list, star-pair within groups: Σ(n−1)); the two zero
    // rows pin the in-engine soundness / exact-dup-recall checks — a
    // single bogus or missed MLlib pair flips a count and fails the
    // typed hash.
    "q58_minhash_ml" ->
      s"""WITH sh AS (
         |  SELECT doc_id,
         |    list_sort(list_distinct(
         |      CASE WHEN len($toksSql) >= 3 THEN
         |        list_transform(generate_series(1, len($toksSql) - 2),
         |          i -> array_to_string(
         |                 list_slice($toksSql, i, i + 2), ' '))
         |      ELSE [] END)) AS shs
         |  FROM documents),
         |g AS (SELECT shs, count(*) AS n FROM sh
         |      WHERE len(shs) > 0 GROUP BY shs)
         |SELECT * FROM (
         |  SELECT 'exact_dup_pairs' AS "check",
         |    CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) AS n,
         |    COALESCE(SUM(n - 1), 0) > 0 AS pass
         |  FROM g
         |  UNION ALL
         |  SELECT 'exact_dup_recall_misses', CAST(0 AS BIGINT), TRUE
         |  UNION ALL
         |  SELECT 'soundness_violations', CAST(0 AS BIGINT), TRUE)
         |ORDER BY "check"""".stripMargin,

    "q59_frame_sample" ->
      """SELECT doc_id,
        |  CAST(i AS INT) AS frame_idx,
        |  CAST(least(64, octet_length(encode(text)) - i * 64) AS INT)
        |    AS frame_bytes
        |FROM documents,
        |  LATERAL unnest(generate_series(0,
        |    CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT) - 1))
        |    AS t(i)
        |WHERE i % 2 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin,

    "q51_cube" ->
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""
        .stripMargin,

    "q52_string_ops" ->
      """SELECT p_partkey,
        |  lower(p_brand) AS brand_lc,
        |  upper(p_type) AS type_uc,
        |  CAST(length(p_name) AS INT) AS name_len,
        |  regexp_extract(p_name, '^[a-z]+', 0) AS first_word,
        |  substring(p_name, 1, 3) AS name_pfx,
        |  concat_ws('|', p_brand, p_type) AS brand_type
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q53_lag_gap" ->
      """SELECT event_id, user_id,
        |  epoch_us(CAST(ts AS TIMESTAMP))
        |    - lag(epoch_us(CAST(ts AS TIMESTAMP)), 1)
        |      OVER (PARTITION BY user_id
        |            ORDER BY CAST(ts AS TIMESTAMP), event_id) AS gap_us
        |FROM events ORDER BY event_id""".stripMargin,

    "q54_multimodal_features" ->
      """WITH hx AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio'
        |         ELSE 'video' END AS media_type,
        |    CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |    hex(encode(text)) AS h
        |  FROM documents)
        |SELECT doc_id, media_type, n_bytes, CAST(b.range AS INT) AS bin,
        |  CAST(len(list_filter(generate_series(1, length(h) // 2),
        |    i -> strpos('0123456789ABCDEF', substring(h, i * 2 - 1, 1)) - 1
        |         = b.range)) AS BIGINT) AS n_in_bin
        |FROM hx, range(0, 16) b
        |ORDER BY doc_id, bin""".stripMargin,

    "q57_tfidf" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    unnest(list_filter($toksSql,
         |      w -> length(w) > 0 AND w NOT IN $stopList)) AS tok
         |  FROM documents),
         |tf AS (
         |  SELECT doc_id, ${polyHashSql("tok")} % 4096 AS term_hash,
         |         CAST(count(*) AS BIGINT) AS tf
         |  FROM toks GROUP BY 1, 2),
         |dfq AS (SELECT term_hash, CAST(count(*) AS BIGINT) AS df
         |        FROM tf GROUP BY 1),
         |m AS (SELECT count(*) AS m FROM documents)
         |SELECT doc_id, term_hash, tf,
         |  round(tf * ln((m + 1.0) / (df + 1)), 6) AS w
         |FROM tf JOIN dfq USING (term_hash) CROSS JOIN m
         |ORDER BY doc_id, term_hash""".stripMargin,

    // the q244 per-doc df_b=1 algebra (qualifying (b, cp) pairs) joined
    // to the corpus-pair reach clustering: assignment = least(own id,
    // min matched corpus cluster), own id when clean — exactly the
    // per-doc upsertClusters row
    "q249_stream_assign" -> {
      val k = 3
      val cap = 100
      val threshold = 0.1
      s"""WITH RECURSIVE
         |${pairCtes(cap = cap, threshold = threshold,
            from = "(SELECT * FROM documents WHERE doc_id % 5 <> 3)",
            pre = "c_")},
         |edges AS (SELECT id_a AS s, id_b AS d FROM c_pairs
         |          UNION SELECT id_b, id_a FROM c_pairs),
         |reach(s, d) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
         |ccl AS (
         |  SELECT doc.doc_id AS cp,
         |    CAST(least(doc.doc_id, COALESCE(m.mn, doc.doc_id))
         |      AS BIGINT) AS ccluster
         |  FROM documents doc
         |  LEFT JOIN (SELECT s, MIN(d) AS mn FROM reach GROUP BY s) m
         |    ON m.s = doc.doc_id
         |  WHERE doc.doc_id % 5 <> 3),
         |fsh AS (
         |  SELECT doc_id, ${shinglesSql(toksSql, k)} AS shs
         |  FROM documents),
         |cpost AS (
         |  SELECT doc_id AS cp, unnest(shs) AS s
         |  FROM fsh WHERE doc_id % 5 <> 3),
         |dfc AS (SELECT s, CAST(count(*) AS BIGINT) AS df_c
         |        FROM cpost GROUP BY 1),
         |nbase AS (
         |  SELECT cp, CAST(count(*) AS BIGINT) AS n_base
         |  FROM cpost JOIN dfc USING (s) WHERE df_c <= $cap GROUP BY 1),
         |bpost AS (
         |  SELECT doc_id AS b, unnest(shs) AS s
         |  FROM fsh WHERE doc_id % 5 = 3),
         |na AS (
         |  SELECT b, CAST(count(*) AS BIGINT) AS n_a
         |  FROM bpost LEFT JOIN dfc USING (s)
         |  WHERE coalesce(df_c, 0) <= ${cap - 1} GROUP BY 1),
         |bshared AS (
         |  SELECT b, cp,
         |    CAST(sum(CASE WHEN df_c <= ${cap - 1} THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_shared,
         |    CAST(sum(CASE WHEN df_c = $cap THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_corr
         |  FROM bpost JOIN dfc USING (s) JOIN cpost USING (s)
         |  GROUP BY 1, 2),
         |qual AS (
         |  SELECT b, cp FROM (
         |    SELECT b, cp,
         |      CAST(n_shared AS DOUBLE)
         |        / (n_a + (n_base - n_corr) - n_shared) AS jac
         |    FROM bshared JOIN na USING (b) JOIN nbase USING (cp)
         |    WHERE n_shared >= 1)
         |  WHERE jac >= $threshold),
         |mncl AS (SELECT b, MIN(ccluster) AS cl
         |         FROM qual JOIN ccl USING (cp) GROUP BY b)
         |SELECT d2.doc_id,
         |  CAST(least(d2.doc_id, COALESCE(mncl.cl, d2.doc_id))
         |    AS BIGINT) AS cluster
         |FROM documents d2 LEFT JOIN mncl ON mncl.b = d2.doc_id
         |WHERE d2.doc_id % 5 = 3
         |ORDER BY d2.doc_id""".stripMargin
    },

    // the whole lifecycle replayed flat: persisted pair table =
    // corpus-universe pairs (c_ chain) UNION batch-incident pairs under
    // the union-universe df-cap (u_ chain, the q238 algebra) — NOT a
    // fresh union-universe recompute of corpus-corpus pairs, which is
    // exactly the pair-table-as-truth tombstone semantics q246 pins;
    // clustering runs over the retained edges; the final index is the
    // union rebuild (q240 equality) put through the q247 retraction
    // rule, and per-doc live-posting counts come from its <=cap lists
    "q248_lifecycle" ->
      s"""WITH RECURSIVE
         |${pairCtes(cap = 100, threshold = 0.1,
            from = "(SELECT * FROM documents WHERE doc_id % 5 <> 3)",
            pre = "c_")},
         |${pairCtes(cap = 100, threshold = 0.1, pre = "u_")},
         |persisted AS (
         |  SELECT id_a, id_b FROM c_pairs
         |  UNION
         |  SELECT id_a, id_b FROM u_pairs
         |  WHERE id_a % 5 = 3 OR id_b % 5 = 3),
         |live AS (SELECT id_a, id_b FROM persisted
         |         WHERE id_a % 7 <> 2 AND id_b % 7 <> 2),
         |edges AS (SELECT id_a AS s, id_b AS d FROM live
         |          UNION SELECT id_b, id_a FROM live),
         |reach(s, d) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
         |fidx AS (
         |  SELECT h, CAST(count(*) AS BIGINT) AS df_c,
         |    CASE WHEN count(*) <= 100
         |      THEN list(doc_id ORDER BY doc_id)
         |    END AS pids
         |  FROM u_post0 GROUP BY h),
         |fdd AS (
         |  SELECT h, CAST(count(*) AS BIGINT) AS df_d
         |  FROM u_post0 WHERE doc_id % 7 = 2 GROUP BY h),
         |flive AS (
         |  SELECT unnest(list_filter(pids, x -> x % 7 <> 2)) AS doc_id
         |  FROM fidx LEFT JOIN fdd USING (h)
         |  WHERE pids IS NOT NULL
         |    AND fidx.df_c - coalesce(fdd.df_d, 0) >= 1),
         |nlive AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_live_sh
         |          FROM flive GROUP BY 1)
         |SELECT doc.doc_id, doc.source,
         |  CAST(least(doc.doc_id, COALESCE(m.mn, doc.doc_id)) AS BIGINT)
         |    AS cluster,
         |  CAST(COALESCE(n.n_live_sh, 0) AS BIGINT) AS n_live_sh
         |FROM documents doc
         |LEFT JOIN (SELECT s, MIN(d) AS mn FROM reach GROUP BY s) m
         |  ON m.s = doc.doc_id
         |LEFT JOIN nlive n ON n.doc_id = doc.doc_id
         |WHERE doc.doc_id % 7 <> 2
         |ORDER BY doc.doc_id""".stripMargin,

    // retained-pair reach clustering: the q55 oracle with deleted
    // endpoints dropped from the edge set and deleted docs from the
    // output — the engine side touches only affected components
    "q246_cluster_retract" ->
      s"""WITH RECURSIVE
         |${pairCtes(cap = 100, threshold = 0.1)},
         |live AS (SELECT id_a, id_b FROM pairs
         |         WHERE id_a % 7 <> 2 AND id_b % 7 <> 2),
         |edges AS (SELECT id_a AS s, id_b AS d FROM live
         |          UNION SELECT id_b, id_a FROM live),
         |reach(s, d) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s)
         |SELECT doc.doc_id,
         |  CAST(least(doc.doc_id, COALESCE(m.mn, doc.doc_id)) AS BIGINT)
         |    AS cluster
         |FROM documents doc
         |LEFT JOIN (SELECT s, MIN(d) AS mn FROM reach GROUP BY s) m
         |  ON m.s = doc.doc_id
         |WHERE doc.doc_id % 7 <> 2
         |ORDER BY doc.doc_id""".stripMargin,

    "q55_dup_clusters" ->
      s"""WITH RECURSIVE
         |${pairCtes(cap = 100, threshold = 0.1)},
         |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach(s, d) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s)
         |SELECT doc.doc_id,
         |  CAST(least(doc.doc_id, COALESCE(m.mn, doc.doc_id)) AS BIGINT)
         |    AS cluster
         |FROM documents doc
         |LEFT JOIN (SELECT s, MIN(d) AS mn FROM reach GROUP BY s) m
         |  ON m.s = doc.doc_id
         |ORDER BY doc.doc_id""".stripMargin,

    "q50_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id AS c_user, CAST(ts AS TIMESTAMP) AS click_ts,
        |             CAST(count(*) AS BIGINT) AS n_clicks
        |      FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id, c.click_ts, c.n_clicks
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.c_user AND p.ts >= c.click_ts
        |ORDER BY p.event_id""".stripMargin,

    "q44_running_sum_window" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
        |    OVER (PARTITION BY l_suppkey
        |          ORDER BY l_shipdate, l_orderkey, l_linenumber
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS running_qty
        |FROM lineitem WHERE l_suppkey <= 5
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    "q45_sql_frontend" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q25_correlation" ->
      """SELECT l_returnflag,
        | round((CAST(count(*) AS DOUBLE) * CAST(SUM(CAST(l_quantity*l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
        |   - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE))
        |  / (sqrt(CAST(count(*) AS DOUBLE) * CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(38,6))) AS DOUBLE)
        |       - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE))
        |     * sqrt(CAST(count(*) AS DOUBLE) * CAST(SUM(CAST(l_extendedprice*l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
        |       - CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE))), 6)
        | AS corr_qty_price
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "q26_token_counts" ->
      s"""SELECT doc_id,
         |  CAST(len($toksSql) AS INT) AS n_tok,
         |  CAST(COALESCE(list_reduce(list_transform(
         |         regexp_split_to_array(trim(text), '[^A-Za-z0-9]+'),
         |         w -> CAST(ceil(length(w)/4.0) AS BIGINT)), (a,b) -> a+b), 0)
         |    + length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
         |    AS BIGINT) AS n_bpeish
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q27_quality_scores" ->
      s"""SELECT doc_id,
         |  CAST(length(text) AS INT) AS q_chars,
         |  CAST(len($toksSql) AS INT) AS q_tokens,
         |  CAST(len(list_filter($toksSql, w -> w IN $stopList)) AS INT) AS q_stop,
         |  CAST(length(text) AS DOUBLE) / len($toksSql) AS avg_token_len,
         |  CAST(len(list_filter($toksSql, w -> w IN $stopList)) AS DOUBLE)
         |    / len($toksSql) AS stop_ratio
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q28_langid_confusion" ->
      s"""SELECT lang, $langCase AS lang_pred, CAST(count(*) AS BIGINT) AS n
         |FROM documents GROUP BY 1, 2 ORDER BY lang, lang_pred""".stripMargin,

    "q29_fingerprints" ->
      s"""SELECT doc_id,
         |  COALESCE(list_reduce(list_transform($toksSql,
         |    w -> ${polyHashSql("w")}), (a, h) -> (a*31 + h) % 1000000007), 0) AS fp,
         |  $simhashSql AS simhash
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q78_token_topk" ->
      s"""SELECT tok, CAST(count(*) AS BIGINT) AS n
         |FROM (SELECT unnest($toksSql) AS tok FROM documents)
         |WHERE length(tok) > 0
         |GROUP BY tok ORDER BY n DESC, tok LIMIT 50""".stripMargin,

    "q79_bloom_semi_join" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE l_partkey IN
        |  (SELECT p_partkey FROM part WHERE p_size >= 45)
        |GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "q77_simhash_neardup" ->
      s"""WITH fp AS (
         |  SELECT doc_id AS pid, $simhashSql AS fp FROM documents
         |  WHERE doc_id < 200),
         |banded AS (
         |  SELECT pid, fp, t.range AS sl,
         |         (fp >> (CAST(t.range AS INT) * 6)) & 63 AS sv
         |  FROM fp, range(0, 5) t),
         |cand AS (
         |  SELECT DISTINCT x.pid AS id_a, y.pid AS id_b,
         |         x.fp AS fa, y.fp AS fb
         |  FROM banded x JOIN banded y
         |    ON x.sl = y.sl AND x.sv = y.sv AND x.pid < y.pid)
         |SELECT id_a, id_b, hamming FROM (
         |  SELECT id_a, id_b,
         |         CAST(bit_count(xor(fa, fb)) AS INT) AS hamming
         |  FROM cand)
         |WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin,

    "q30_exact_dedup_stats" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_total,
        |       CAST(count(DISTINCT text) AS BIGINT) AS n_distinct
        |FROM documents""".stripMargin,

    "q31_jaccard_pairs" ->
      s"""WITH ${pairCtes(cap = 100, threshold = 0.1)}
         |SELECT id_a, id_b, jac FROM pairs
         |ORDER BY id_a, id_b""".stripMargin,

    "q33_ann_bruteforce" ->
      s"""SELECT * FROM (
         |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |    ${cosineSql("q.embedding", "c.embedding")} AS sim,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${cosineSql("q.embedding", "c.embedding")} DESC,
         |               c.vec_id) AS INT) AS rnk
         |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
         |  WHERE q.vec_id < 3)
         |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,

    "q194_mutual_knn" ->
      s"""WITH $mutualKnnCtes
         |SELECT id_a, id_b, sim, rank_ab, rank_ba FROM mutual
         |ORDER BY id_a, id_b""".stripMargin,

    "q207_negative_sample" -> {
      val bkA = s"${scrambledHashSql("CAST(vec_id AS VARCHAR)")} % 8"
      val pairH = scrambledHashSql(
        "CAST(a.a_id AS VARCHAR) || '#' || CAST(n.n_id AS VARCHAR)")
      s"""WITH ca AS (
         |  SELECT vec_id AS a_id, label AS a_label, $bkA AS bk
         |  FROM embeddings),
         |cn AS (
         |  SELECT vec_id AS n_id, label AS n_label, $bkA AS bk
         |  FROM embeddings),
         |pool AS (
         |  SELECT a.a_id, n.n_id, n.n_label, $pairH AS r
         |  FROM ca a JOIN cn n USING (bk)
         |  WHERE a.a_label <> n.n_label)
         |SELECT a_id, rank, n_id, n_label FROM (
         |  SELECT a_id, n_id, n_label,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY a_id
         |      ORDER BY r, n_id) AS INT) AS rank
         |  FROM pool)
         |WHERE rank <= 4 ORDER BY a_id, rank""".stripMargin
    },

    "q208_table_digest" -> {
      val rowStr = Seq("doc_id", "text", "lang", "source", "n_chars")
        .map(c => s"COALESCE(CAST($c AS VARCHAR), 'NULL')")
        .mkString("concat_ws('|', ", ", ", ")")
      s"""SELECT CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(${scrambledHashSql(rowStr)}) % 1000000007
         |    AS BIGINT) AS digest
         |FROM documents""".stripMargin
    },

    "q209_cube_profile" ->
      """SELECT lang, source, CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(n_chars AS DECIMAL(38,0))) AS BIGINT) AS total,
        |  CAST(GROUPING(lang, source) AS BIGINT) AS gid
        |FROM documents GROUP BY CUBE(lang, source)
        |ORDER BY gid, lang NULLS FIRST, source NULLS FIRST"""
        .stripMargin,

    "q220_vocab_overlap" ->
      s"""WITH vt AS (
         |  SELECT DISTINCT source AS g, tok FROM (
         |    SELECT source, unnest($toksSql) AS tok FROM documents)
         |  WHERE length(tok) > 0),
         |sz AS (SELECT g, CAST(count(*) AS BIGINT) AS nv
         |       FROM vt GROUP BY 1),
         |pr AS (
         |  SELECT a.g AS ga, b.g AS gb, count(*) AS n_shared
         |  FROM vt a JOIN vt b ON a.tok = b.tok AND a.g < b.g
         |  GROUP BY 1, 2)
         |SELECT sa.g AS ga, sb.g AS gb, sa.nv AS nva, sb.nv AS nvb,
         |  CAST(COALESCE(pr.n_shared, 0) AS BIGINT) AS n_shared,
         |  round(CAST(COALESCE(pr.n_shared, 0) AS DOUBLE) /
         |    (sa.nv + sb.nv - COALESCE(pr.n_shared, 0)), 6) AS jaccard
         |FROM sz sa JOIN sz sb ON sa.g < sb.g
         |LEFT JOIN pr ON pr.ga = sa.g AND pr.gb = sb.g
         |ORDER BY 1, 2""".stripMargin,

    "q242_incremental_lsh" ->
      minhashBandPairsSql(k = 3, numHashes = 12, rowsPerBand = 3,
        threshold = 0.05,
        incidentFilter = "AND (id_a % 5 = 3 OR id_b % 5 = 3)"),

    // per-doc (df_b = 1) incremental cap algebra replayed relationally:
    // a shingle survives a doc's comparison iff df_c + 1 <= cap; the
    // corpus doc's size is its capped baseline minus the arriving doc's
    // cap-crossers (df_c = cap). Constants interpolated from the same
    // values the engine call passes (k via shinglesSql, cap, threshold).
    "q244_streaming_flags" -> {
      val k = 3
      val cap = 100
      val threshold = 0.1
      s"""WITH sh AS (
         |  SELECT doc_id, ${shinglesSql(toksSql, k)} AS shs
         |  FROM documents),
         |cpost AS (
         |  SELECT doc_id AS cp, unnest(shs) AS s
         |  FROM sh WHERE doc_id % 5 <> 3),
         |dfc AS (SELECT s, CAST(count(*) AS BIGINT) AS df_c
         |        FROM cpost GROUP BY 1),
         |nbase AS (
         |  SELECT cp, CAST(count(*) AS BIGINT) AS n_base
         |  FROM cpost JOIN dfc USING (s) WHERE df_c <= $cap GROUP BY 1),
         |bpost AS (
         |  SELECT doc_id AS b, unnest(shs) AS s
         |  FROM sh WHERE doc_id % 5 = 3),
         |na AS (
         |  SELECT b, CAST(count(*) AS BIGINT) AS n_a
         |  FROM bpost LEFT JOIN dfc USING (s)
         |  WHERE coalesce(df_c, 0) <= ${cap - 1} GROUP BY 1),
         |shared AS (
         |  SELECT b, cp,
         |    CAST(sum(CASE WHEN df_c <= ${cap - 1} THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_shared,
         |    CAST(sum(CASE WHEN df_c = $cap THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_corr
         |  FROM bpost JOIN dfc USING (s) JOIN cpost USING (s)
         |  GROUP BY 1, 2)
         |SELECT least(b, cp) AS id_a, greatest(b, cp) AS id_b, jac
         |FROM (
         |  SELECT b, cp,
         |    CAST(n_shared AS DOUBLE)
         |      / (n_a + (n_base - n_corr) - n_shared) AS jac
         |  FROM shared JOIN na USING (b) JOIN nbase USING (cp)
         |  WHERE n_shared >= 1)
         |WHERE jac >= $threshold
         |ORDER BY id_a, id_b""".stripMargin
    },

    // fresh connected components over the FULL-corpus LSH pair set —
    // the q55 reach clustering chained onto the q32 pair CTEs; the
    // engine side computes it incrementally (corpus state + batch
    // delta), so hash equality here proves upsert == full recompute
    "q243_cluster_upsert" ->
      s"""WITH RECURSIVE
         |${minhashPairCtes(k = 3, numHashes = 12, rowsPerBand = 3,
            threshold = 0.05)},
         |edges AS (SELECT id_a AS s, id_b AS d FROM mh_pairs
         |          UNION SELECT id_b, id_a FROM mh_pairs),
         |reach(s, d) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s)
         |SELECT doc.doc_id,
         |  CAST(least(doc.doc_id, COALESCE(m.mn, doc.doc_id)) AS BIGINT)
         |    AS cluster
         |FROM documents doc
         |LEFT JOIN (SELECT s, MIN(d) AS mn FROM reach GROUP BY s) m
         |  ON m.s = doc.doc_id
         |ORDER BY doc.doc_id""".stripMargin,

    "q241_cdc_dedup" ->
      cdcDedupSql(window = 8, divisor = 64, maxDf = 100, threshold = 0.5),

    // the retraction rule replayed over the full-corpus index: dfs
    // decrement by each shingle's deleted-member count, <=cap lists
    // drop deleted ids, zero-df rows vanish — and a HOT row's list
    // stays NULL even if its df cools under the cap (the conservative
    // tombstone asymmetry, pinned here: the CASE keys off the
    // ORIGINAL df's list presence, not the decremented df)
    "q247_index_retract" ->
      s"""WITH sh AS (
         |  SELECT doc_id, ${shinglesSql(toksSql, 3)} AS shs
         |  FROM documents),
         |post0 AS (SELECT doc_id, unnest(shs) AS h FROM sh),
         |idx AS (
         |  SELECT h AS s, CAST(count(*) AS BIGINT) AS df_c,
         |    CASE WHEN count(*) <= 100
         |      THEN list(doc_id ORDER BY doc_id)
         |    END AS pids
         |  FROM post0 GROUP BY h),
         |dd AS (
         |  SELECT h AS s, CAST(count(*) AS BIGINT) AS df_d
         |  FROM post0 WHERE doc_id % 7 = 2 GROUP BY h)
         |SELECT s AS sh,
         |  CAST(idx.df_c - coalesce(dd.df_d, 0) AS BIGINT) AS df_c,
         |  CASE WHEN pids IS NOT NULL THEN
         |    array_to_string(list_filter(pids, p -> p % 7 <> 2), ',')
         |  END AS pids_str
         |FROM idx LEFT JOIN dd USING (s)
         |WHERE idx.df_c - coalesce(dd.df_d, 0) >= 1
         |ORDER BY sh""".stripMargin,

    "q240_index_upsert" ->
      s"""WITH sh AS (
         |  SELECT doc_id, ${shinglesSql(toksSql, 3)} AS shs
         |  FROM documents),
         |post0 AS (SELECT doc_id, unnest(shs) AS h FROM sh),
         |idx AS (
         |  SELECT h AS sh, CAST(count(*) AS BIGINT) AS df_c,
         |    CASE WHEN count(*) <= 100
         |      THEN array_to_string(list(doc_id ORDER BY doc_id), ',')
         |    END AS pids_str
         |  FROM post0 GROUP BY h)
         |SELECT sh, df_c, pids_str FROM idx ORDER BY sh""".stripMargin,

    "q239_fuzzy_join2" ->
      """SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
        |  CAST(levenshtein(a.s_name, b.s_name) AS INT) AS dist
        |FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
        |WHERE levenshtein(a.s_name, b.s_name) <= 2
        |ORDER BY 1, 2""".stripMargin,

    "q238_incremental_dedup" ->
      s"""WITH ${pairCtes(cap = 100, threshold = 0.1)}
         |SELECT id_a, id_b, jac FROM pairs
         |WHERE id_a % 5 = 3 OR id_b % 5 = 3
         |ORDER BY id_a, id_b""".stripMargin,

    "q237_payload_neardup" -> blockhashPairsSql(),

    // same blockhash pipeline restricted to batch-incident pairs —
    // fingerprints are per-doc-deterministic, so the full recompute
    // filtered to batch incidence IS the incremental contract (the
    // q242 pattern on the multimodal modality)
    "q250_incremental_payload" ->
      blockhashPairsSql(" AND (id_a % 5 = 3 OR id_b % 5 = 3)"),

    // banded indexes are uncapped with per-payload-deterministic keys,
    // so both maintenance directions must equal the FRESH rebuild over
    // the post-maintenance doc set byte-identically: upsert -> all
    // docs, retract -> the retained corpus
    "q251_fp_upsert" -> fpIndexSql(),
    "q252_fp_retract" ->
      fpIndexSql(" WHERE doc_id % 5 <> 3 AND doc_id % 7 <> 2"),

    // the same fresh-rebuild contract on the banded-TEXT modality
    // (q242's band index, k=3 / 12 hashes / 3 rows per band)
    "q253_lsh_upsert" -> lshIndexSql(3, 12, 3),
    "q254_lsh_retract" ->
      lshIndexSql(3, 12, 3,
        " WHERE doc_id % 5 <> 3 AND doc_id % 7 <> 2"),

    // the takedown FEED: the deleted corpus docs' slice-key postings,
    // derived from state alone (the batch twin of the streaming
    // retraction; the id list spans corpus and batch ids, but only
    // persisted-state rows have deltas to derive)
    "q258_stream_takedown" ->
      s"""WITH ${blockhashFpCtes(" WHERE doc_id % 5 <> 3" +
            " AND doc_id % 7 = 2")},
         |banded AS (
         |  SELECT pid, CAST(t.range AS INT) AS sl,
         |         (fp >> (CAST(t.range AS INT) * 8)) & 255 AS sv
         |  FROM fp, range(0, 4) t)
         |SELECT sl, sv, pid FROM banded
         |ORDER BY sl, sv, pid""".stripMargin,

    // the upsert FEED: the arriving batch's slice-key postings,
    // computed inline from its payloads (no state read — the honest
    // ingest input; the batch twin of the streaming upsert, q258's
    // opposite maintenance direction)
    "q261_stream_upsert_feed" ->
      s"""WITH ${blockhashFpCtes(" WHERE doc_id % 5 = 3")},
         |banded AS (
         |  SELECT pid, CAST(t.range AS INT) AS sl,
         |         (fp >> (CAST(t.range AS INT) * 8)) & 255 AS sv
         |  FROM fp, range(0, 4) t)
         |SELECT sl, sv, pid FROM banded
         |ORDER BY sl, sv, pid""".stripMargin,

    // the EMBEDDING lifecycle replayed flat (the q257 shape in vector
    // space): the folded pair table IS the full union recompute
    // (per-vector-deterministic buckets), retained-edge reach
    // clustering gives the final clusters, and the final index is the
    // full-universe bucketing restricted to retained ids, digested per
    // vector as its distinct bucket-peer count
    "q259_emb_lifecycle" -> {
      val eBranches = (0 until 4)
        .map(t => s"SELECT $t AS t, b$t AS bk, vec_id FROM b " +
          "WHERE vec_id % 7 <> 2")
        .mkString("\n  UNION ALL\n  ")
      s"""WITH RECURSIVE
         |b AS (
         |  SELECT vec_id, embedding,
         |    ${multiBucketCols(bits = 16, tables = 4)}
         |  FROM embeddings),
         |prs AS (
         |  SELECT id_a, id_b FROM (
         |    SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b,
         |      ${cosineSql("x.embedding", "y.embedding")} AS sim
         |    FROM b x JOIN b y
         |      ON x.vec_id < y.vec_id
         |      AND (${anyBucketMatch("x", "y", 4)}))
         |  WHERE sim >= 0.6),
         |live AS (SELECT id_a, id_b FROM prs
         |         WHERE id_a % 7 <> 2 AND id_b % 7 <> 2),
         |edges AS (SELECT id_a AS s, id_b AS d FROM live
         |          UNION SELECT id_b, id_a FROM live),
         |reach(s, d) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
         |eb AS (
         |  $eBranches),
         |np AS (
         |  SELECT a AS vec_id, CAST(count(*) AS BIGINT) AS n_peers
         |  FROM (
         |    SELECT DISTINCT x.vec_id AS a, y.vec_id AS bb
         |    FROM eb x JOIN eb y
         |      ON x.t = y.t AND x.bk = y.bk
         |      AND x.vec_id <> y.vec_id)
         |  GROUP BY 1)
         |SELECT em.vec_id, em.label,
         |  CAST(least(em.vec_id, COALESCE(m.mn, em.vec_id)) AS BIGINT)
         |    AS cluster,
         |  CAST(COALESCE(np.n_peers, 0) AS BIGINT) AS n_peers
         |FROM embeddings em
         |LEFT JOIN (SELECT s, MIN(d) AS mn FROM reach GROUP BY s) m
         |  ON m.s = em.vec_id
         |LEFT JOIN np ON np.vec_id = em.vec_id
         |WHERE em.vec_id % 7 <> 2
         |ORDER BY em.vec_id""".stripMargin
    },

    // the PAYLOAD lifecycle replayed flat — the last of the four
    // modalities' chained compositions; same contract (union pairs =
    // full recompute; final index = full-universe banding restricted
    // to retained pids)
    "q260_fp_lifecycle" ->
      s"""WITH RECURSIVE ${blockhashFpCtes()},
         |banded AS (
         |  SELECT pid, fp, CAST(t.range AS INT) AS sl,
         |         (fp >> (CAST(t.range AS INT) * 8)) & 255 AS sv
         |  FROM fp, range(0, 4) t),
         |prs AS (
         |  SELECT id_a, id_b FROM (
         |    SELECT DISTINCT x.pid AS id_a, y.pid AS id_b,
         |      CAST(bit_count(xor(x.fp, y.fp)) AS INT) AS h
         |    FROM banded x JOIN banded y
         |      ON x.sl = y.sl AND x.sv = y.sv AND x.pid < y.pid)
         |  WHERE h <= 3),
         |live AS (SELECT id_a, id_b FROM prs
         |         WHERE id_a % 7 <> 2 AND id_b % 7 <> 2),
         |edges AS (SELECT id_a AS s, id_b AS d FROM live
         |          UNION SELECT id_b, id_a FROM live),
         |reach(s, d) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
         |rband AS (SELECT pid, sl, sv FROM banded WHERE pid % 7 <> 2),
         |np AS (
         |  SELECT a AS pid, CAST(count(*) AS BIGINT) AS n_peers
         |  FROM (
         |    SELECT DISTINCT x.pid AS a, y.pid AS bb
         |    FROM rband x JOIN rband y
         |      ON x.sl = y.sl AND x.sv = y.sv AND x.pid <> y.pid)
         |  GROUP BY 1)
         |SELECT d.doc_id AS pid,
         |  CASE WHEN d.doc_id % 3 = 0 THEN 'image'
         |       WHEN d.doc_id % 3 = 1 THEN 'audio'
         |       ELSE 'video' END AS media_type,
         |  CAST(least(d.doc_id, COALESCE(m.mn, d.doc_id)) AS BIGINT)
         |    AS cluster,
         |  CAST(COALESCE(np.n_peers, 0) AS BIGINT) AS n_peers
         |FROM documents d
         |LEFT JOIN (SELECT s, MIN(d) AS mn FROM reach GROUP BY s) m
         |  ON m.s = d.doc_id
         |LEFT JOIN np ON np.pid = d.doc_id
         |WHERE d.doc_id % 7 <> 2
         |ORDER BY pid""".stripMargin,

    // exploded-row EMBEDDING index (q245's state): per-vector
    // deterministic hyperplane buckets, so both maintenance directions
    // must equal the fresh rebuild over the post-maintenance vector
    // set — upsert -> all vectors, retract -> the retained corpus
    "q255_emb_upsert" -> embIndexSql(16, 4),
    "q256_emb_retract" ->
      embIndexSql(16, 4, " WHERE vec_id % 5 <> 3 AND vec_id % 7 <> 2"),

    // the whole LSH-path lifecycle replayed flat: the persisted pair
    // table after the fold IS the full union recompute on this path
    // (per-doc-deterministic band keys — no tombstone asymmetry, the
    // q248 contrast); retained-edge reach clustering gives the final
    // clusters, and the final band index is the full-universe banding
    // restricted to retained pids (uncapped ⇒ equals the fresh
    // retained rebuild), digested per doc as its distinct band-peer
    // count
    "q257_lsh_lifecycle" ->
      s"""WITH RECURSIVE
         |${minhashPairCtes(k = 3, numHashes = 12, rowsPerBand = 3,
            threshold = 0.05)},
         |live AS (SELECT id_a, id_b FROM mh_pairs
         |         WHERE id_a % 7 <> 2 AND id_b % 7 <> 2),
         |edges AS (SELECT id_a AS s, id_b AS d FROM live
         |          UNION SELECT id_b, id_a FROM live),
         |reach(s, d) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
         |rband AS (SELECT pid, band, bkey FROM banded
         |          WHERE pid % 7 <> 2),
         |np AS (
         |  SELECT a AS doc_id, CAST(count(*) AS BIGINT) AS n_peers
         |  FROM (
         |    SELECT DISTINCT x.pid AS a, y.pid AS b
         |    FROM rband x JOIN rband y
         |      ON x.band = y.band AND x.bkey = y.bkey
         |      AND x.pid <> y.pid)
         |  GROUP BY 1)
         |SELECT doc.doc_id, doc.source,
         |  CAST(least(doc.doc_id, COALESCE(m.mn, doc.doc_id)) AS BIGINT)
         |    AS cluster,
         |  CAST(COALESCE(np.n_peers, 0) AS BIGINT) AS n_peers
         |FROM documents doc
         |LEFT JOIN (SELECT s, MIN(d) AS mn FROM reach GROUP BY s) m
         |  ON m.s = doc.doc_id
         |LEFT JOIN np ON np.doc_id = doc.doc_id
         |WHERE doc.doc_id % 7 <> 2
         |ORDER BY doc.doc_id""".stripMargin,

    "q236_sql_pipe" ->
      """SELECT event_type, user_id % 10 AS cohort,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS total_cents
        |FROM events WHERE value IS NOT NULL
        |GROUP BY 1, 2 HAVING count(*) > 5
        |ORDER BY 1, 2""".stripMargin,

    "q235_stateful_totals" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS total_cents
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q234_xml_roundtrip" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "q233_variant_extract" ->
      """SELECT event_type,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(MIN(CAST(props->>'$.k' AS INT)) AS INT) AS min_k,
        |  CAST(MAX(CAST(props->>'$.k' AS INT)) AS INT) AS max_k,
        |  CAST(COUNT(DISTINCT CAST(props->>'$.k' AS INT)) AS BIGINT)
        |    AS n_k,
        |  'OBJECT<k: BIGINT>' AS variant_schema
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q231_bpe_merges" -> {
      val finals = (0 until BpeRounds).map(r =>
        s"""  SELECT $r AS round, a AS sym_a, b AS sym_b,
           |    a || b AS merged, CAST(cnt AS BIGINT) AS pair_count
           |  FROM t$r""".stripMargin).mkString("\n  UNION ALL\n")
      s"""WITH ${bpeCtePrefix(BpeRounds)}
         |SELECT * FROM (
         |$finals
         |) ORDER BY round""".stripMargin
    },

    "q232_bpe_compression" ->
      s"""WITH ${bpeCtePrefix(BpeRounds)},
         |segs AS (
         |  SELECT word, len(string_split(s, ' ')) AS n_bpe
         |  FROM s$BpeRounds),
         |pg AS (
         |  SELECT source, tok AS word, count(*) AS n
         |  FROM (SELECT source, unnest($toksSql) AS tok FROM documents)
         |  WHERE len(tok) > 0 GROUP BY 1, 2)
         |SELECT pg.source,
         |  CAST(SUM(n) AS BIGINT) AS n_tokens,
         |  CAST(SUM(n * len(word)) AS BIGINT) AS n_chars,
         |  CAST(SUM(n * n_bpe) AS BIGINT) AS n_bpe_tokens,
         |  round(CAST(SUM(n * len(word)) AS DOUBLE) / SUM(n * n_bpe), 6)
         |    AS chars_per_bpe_token
         |FROM pg JOIN segs USING (word)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q230_cms_planned_join" -> {
      def bu(tbl: String, key: String) = (0 until 5).map(i =>
        s"""  SELECT $i AS i,
           |    ${scrambledHashSql(
               s"CAST($key AS VARCHAR) || '#$i'")} % 8192 AS b
           |  FROM $tbl""".stripMargin)
        .mkString("\n  UNION ALL\n")
      s"""WITH bua AS (
         |${bu("events", "user_id")}),
         |cta AS (SELECT i, b, count(*) AS c FROM bua GROUP BY 1, 2),
         |bub AS (
         |${bu("orders", "o_custkey")}),
         |ctb AS (SELECT i, b, count(*) AS c FROM bub GROUP BY 1, 2),
         |rs AS (
         |  SELECT a.i, SUM(CAST(a.c * b.c AS DECIMAL(38,0))) AS s
         |  FROM cta a JOIN ctb b ON a.i = b.i AND a.b = b.b
         |  GROUP BY 1),
         |es AS (
         |  SELECT CAST(MIN(COALESCE(rs.s, 0)) AS BIGINT) AS join_est
         |  FROM (SELECT unnest(generate_series(0, 4)) AS i) g
         |  LEFT JOIN rs ON rs.i = g.i),
         |j AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_joined,
         |    round(${sumExact6Sql("o_totalprice")}, 2) AS revenue
         |  FROM events e JOIN orders o ON e.user_id = o.o_custkey)
         |SELECT es.join_est,
         |  CASE WHEN es.join_est <= 500000 THEN 'broadcast'
         |    ELSE 'shuffle' END AS strategy,
         |  j.n_joined, j.revenue
         |FROM es, j""".stripMargin
    },

    "q229_cms_cross_join_size" -> {
      def bu(tbl: String, key: String) = (0 until 5).map(i =>
        s"""  SELECT $i AS i,
           |    ${scrambledHashSql(
               s"CAST($key AS VARCHAR) || '#$i'")} % 8192 AS b
           |  FROM $tbl""".stripMargin)
        .mkString("\n  UNION ALL\n")
      s"""WITH bua AS (
         |${bu("events", "user_id")}),
         |cta AS (SELECT i, b, count(*) AS c FROM bua GROUP BY 1, 2),
         |bub AS (
         |${bu("orders", "o_custkey")}),
         |ctb AS (SELECT i, b, count(*) AS c FROM bub GROUP BY 1, 2),
         |rs AS (
         |  SELECT a.i, SUM(CAST(a.c * b.c AS DECIMAL(38,0))) AS s
         |  FROM cta a JOIN ctb b ON a.i = b.i AND a.b = b.b
         |  GROUP BY 1),
         |es AS (
         |  SELECT CAST(MIN(COALESCE(rs.s, 0)) AS BIGINT) AS join_est
         |  FROM (SELECT unnest(generate_series(0, 4)) AS i) g
         |  LEFT JOIN rs ON rs.i = g.i),
         |fa AS (SELECT user_id AS k, count(*) AS f
         |       FROM events GROUP BY 1),
         |fb AS (SELECT o_custkey AS k, count(*) AS f
         |       FROM orders GROUP BY 1),
         |ex AS (
         |  SELECT CAST(COALESCE(SUM(CAST(fa.f * fb.f
         |    AS DECIMAL(38,0))), 0) AS BIGINT) AS join_exact
         |  FROM fa JOIN fb USING (k)),
         |nn AS (
         |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM events) AS n_a,
         |    (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_b)
         |SELECT nn.n_a, nn.n_b, ex.join_exact, es.join_est,
         |  CASE WHEN ex.join_exact > 0 THEN
         |    round(CAST(es.join_est AS DOUBLE) / ex.join_exact, 6)
         |  END AS ratio,
         |  es.join_est >= ex.join_exact AS never_under
         |FROM nn, ex, es""".stripMargin
    },

    "q228_export_manifest" ->
      s"""WITH t AS (
         |  SELECT doc_id, source, CAST(len($toksSql) AS BIGINT) AS n_tok
         |  FROM documents),
         |o AS (
         |  SELECT doc_id, source, n_tok,
         |    CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id)
         |      AS BIGINT) AS end_off
         |  FROM t),
         |pk AS (
         |  SELECT doc_id, source, n_tok,
         |    CAST(floor((end_off - n_tok) / 4096.0) AS BIGINT)
         |      AS shard,
         |    CAST(floor((end_off - 1) / 4096.0)
         |      > floor((end_off - n_tok) / 4096.0) AS BIGINT)
         |      AS crosses
         |  FROM o)
         |SELECT pk.source, shard,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
         |  CAST(SUM(crosses) AS BIGINT) AS n_boundary_docs,
         |  CAST(SUM(${scrambledHashSql(
            "concat_ws('|', CAST(pk.doc_id AS VARCHAR), d.text, " +
              "pk.source, CAST(n_tok AS VARCHAR))")})
         |    % 1000000007 AS BIGINT) AS digest
         |FROM pk JOIN documents d ON pk.doc_id = d.doc_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q227_dup_accumulation" -> {
      val norm = "trim(regexp_replace(regexp_replace(lower(text), " +
        "'[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
      val wnd = "(ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING " +
        "AND CURRENT ROW)"
      s"""WITH ky AS (
        |  SELECT doc_id AS id, $norm AS k FROM documents),
        |gd AS (SELECT k, MIN(id) AS gid FROM ky GROUP BY 1),
        |dp AS (
        |  SELECT ky.id,
        |    CASE WHEN ky.id > gd.gid THEN 1 ELSE 0 END AS dup
        |  FROM ky JOIN gd USING (k)),
        |ed AS (SELECT MIN(id) AS mn, MAX(id) AS mx FROM dp),
        |bi AS (
        |  SELECT dup,
        |    CAST(((id - e.mn) * 10) // (e.mx - e.mn + 1) AS INT)
        |      AS decile
        |  FROM dp, ed e),
        |gb AS (
        |  SELECT decile, count(*) AS nb, SUM(dup) AS db
        |  FROM bi GROUP BY 1)
        |SELECT decile,
        |  CAST(SUM(nb) OVER $wnd AS BIGINT) AS n_docs,
        |  CAST(SUM(db) OVER $wnd AS BIGINT) AS n_dups,
        |  round(CAST(SUM(db) OVER $wnd AS DOUBLE)
        |    / SUM(nb) OVER $wnd, 6) AS cum_dup_rate,
        |  round(CAST(db AS DOUBLE) / nb, 6) AS marginal_dup_rate
        |FROM gb ORDER BY 1""".stripMargin
    },

    "q225_norm_audit" ->
      s"""WITH nr AS (
         |  SELECT round(sqrt(${dotSql("embedding", "embedding")}), 9)
         |    AS nrm
         |  FROM embeddings),
         |med AS (SELECT quantile_cont(nrm, 0.5) AS m FROM nr),
         |dev AS (SELECT nrm, m, abs(nrm - m) AS ad FROM nr, med),
         |md AS (SELECT quantile_cont(ad, 0.5) AS md FROM dev)
         |SELECT 'all' AS g, round(max(d.m), 6) AS med,
         |  round(max(x.md), 6) AS mad, count(*) AS n,
         |  CAST(SUM(CASE WHEN x.md > 0 AND
         |        abs(0.6745*(d.nrm - d.m)/x.md) > 3.5
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
         |FROM dev d, md x""".stripMargin,

    "q226_payload_dedup" ->
      """WITH g AS (
        |  SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
        |              WHEN doc_id % 3 = 1 THEN 'audio'
        |              ELSE 'video' END AS media_type,
        |    encode(text) AS payload, count(*) AS c
        |  FROM documents GROUP BY 1, 2)
        |SELECT media_type,
        |  CAST(SUM(c) AS BIGINT) AS n_payloads,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  CAST(SUM(c) - count(*) AS BIGINT) AS n_dup_rows,
        |  CAST(MAX(c) AS BIGINT) AS max_copies
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    "q223_loo_impact" ->
      """WITH pa AS (
        |  SELECT source, count(*) AS n,
        |    SUM(CAST(n_chars AS DECIMAL(38,6))) AS s
        |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
        |tt AS (SELECT SUM(n) AS tn, SUM(s) AS ts FROM pa)
        |SELECT pa.source, CAST(pa.n AS BIGINT) AS n,
        |  round(CAST(pa.s AS DOUBLE) / pa.n, 6) AS mean_group,
        |  round(CAST(tt.ts AS DOUBLE) / tt.tn, 6) AS mean_all,
        |  CASE WHEN tt.tn > pa.n THEN
        |    round((CAST(tt.ts AS DOUBLE) - CAST(pa.s AS DOUBLE))
        |      / (tt.tn - pa.n), 6) END AS mean_loo,
        |  CASE WHEN tt.tn > pa.n THEN
        |    round((CAST(tt.ts AS DOUBLE) - CAST(pa.s AS DOUBLE))
        |        / (tt.tn - pa.n)
        |      - CAST(tt.ts AS DOUBLE) / tt.tn, 6) END AS delta
        |FROM pa, tt ORDER BY 1""".stripMargin,

    "q224_lift_curve" -> {
      val binCase = (1 to 9).map(k =>
        s"CASE WHEN v > e.qs[$k] THEN 1 ELSE 0 END")
        .mkString("(", "\n        |     + ", ") AS b")
      s"""WITH RECURSIVE
        |${pairCtes(cap = 100, threshold = 0.1)},
        |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
        |          UNION SELECT id_b, id_a FROM pairs),
        |reach(s, d) AS (
        |  SELECT s, d FROM edges
        |  UNION
        |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
        |clus AS (
        |  SELECT doc.doc_id AS id,
        |    CAST(least(doc.doc_id, COALESCE(m.mn, doc.doc_id))
        |      AS BIGINT) AS cluster
        |  FROM documents doc
        |  LEFT JOIN (SELECT s, MIN(d) AS mn FROM reach GROUP BY s) m
        |    ON m.s = doc.doc_id),
        |csz AS (SELECT cluster, count(*) AS cs FROM clus GROUP BY 1),
        |lb AS (
        |  SELECT CASE WHEN z.cs > 1 THEN 1 ELSE 0 END AS y,
        |    CAST(d.n_chars AS DOUBLE) AS v
        |  FROM clus c JOIN csz z USING (cluster)
        |  JOIN documents d ON d.doc_id = c.id
        |  WHERE d.n_chars IS NOT NULL),
        |ed AS (
        |  SELECT quantile_cont(v,
        |    [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs
        |  FROM lb),
        |bi AS (
        |  SELECT y,
        |    $binCase
        |  FROM lb, ed e),
        |tt AS (SELECT count(*) AS tn, SUM(y) AS tp FROM bi)
        |SELECT b AS decile, CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(y) AS BIGINT) AS n_pos,
        |  round(CAST(SUM(y) AS DOUBLE) / count(*), 6) AS rate,
        |  CASE WHEN tt.tp > 0 THEN
        |    round((CAST(SUM(y) AS DOUBLE) / count(*))
        |      / (CAST(tt.tp AS DOUBLE) / tt.tn), 6) END AS lift
        |FROM bi, tt GROUP BY b, tt.tn, tt.tp ORDER BY 1""".stripMargin
    },

    "q222_truncation_audit" -> {
      val qs = "list_slice(q.embedding, 1, 16)"
      val cs = "list_slice(c.embedding, 1, 16)"
      s"""WITH pp AS (
         |  SELECT round(${cosineSql("q.embedding", "c.embedding")}, 9)
         |      AS cf,
         |    round(${cosineSql(qs, cs)}, 9) AS ct
         |  FROM embeddings q JOIN embeddings c
         |    ON c.vec_id <> q.vec_id
         |  WHERE q.vec_id < 5),
         |jj AS (
         |  SELECT CAST(cf * 1e9 AS DECIMAL(19,0)) AS ix,
         |    CAST(ct * 1e9 AS DECIMAL(19,0)) AS iy
         |  FROM pp WHERE cf IS NOT NULL AND ct IS NOT NULL)
         |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         |  round((CAST(count(*) AS DOUBLE)
         |      * CAST(SUM(ix * iy) AS DOUBLE)
         |    - CAST(SUM(ix) AS DOUBLE) * CAST(SUM(iy) AS DOUBLE))
         |  / (sqrt(CAST(count(*) AS DOUBLE)
         |        * CAST(SUM(ix * ix) AS DOUBLE)
         |      - CAST(SUM(ix) AS DOUBLE) * CAST(SUM(ix) AS DOUBLE))
         |    * sqrt(CAST(count(*) AS DOUBLE)
         |        * CAST(SUM(iy * iy) AS DOUBLE)
         |      - CAST(SUM(iy) AS DOUBLE) * CAST(SUM(iy) AS DOUBLE))),
         |    6) AS corr,
         |  round(CAST(SUM(abs(ix - iy)) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) / 1e9, 6) AS mae
         |FROM jj""".stripMargin
    },

    "q221_pq_distortion" -> {
      val qd = (0 until 4).map { s =>
        val qe = s"list_slice(q.embedding, ${s * 16 + 1}, ${s * 16 + 16})"
        s"""  SELECT q.vec_id AS q_id, $s AS sub, c.code,
           |    round(${d2Sql(qe, "c.cv")}, 9) AS qd2
           |  FROM embeddings q, p${s}cent c WHERE q.vec_id < 5"""
          .stripMargin
      }.mkString("\n  UNION ALL\n")
      val cl = (0 until 4)
        .map(s => s"  SELECT id, $s AS sub, code FROM p${s}asg")
        .mkString("\n  UNION ALL\n")
      s"""WITH ${(0 until 4).map(s => pqSubCtes(s, s * 16, 16, 8))
            .mkString(",\n")},
         |qd AS (
         |$qd),
         |cl AS (
         |$cl),
         |sc AS (
         |  SELECT d.q_id, c.id,
         |    CAST(SUM(CAST(d.qd2 AS DECIMAL(28,9))) AS DOUBLE)
         |      AS adist
         |  FROM cl c JOIN qd d ON d.sub = c.sub AND d.code = c.code
         |  WHERE c.id <> d.q_id GROUP BY 1, 2),
         |exq AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |    round(${d2Sql("q.embedding", "c.embedding")}, 9) AS d2
         |  FROM embeddings q JOIN embeddings c
         |    ON c.vec_id <> q.vec_id
         |  WHERE q.vec_id < 5),
         |jj AS (
         |  SELECT CAST(s.adist * 1e9 AS DECIMAL(19,0)) AS ix,
         |    CAST(e.d2 * 1e9 AS DECIMAL(19,0)) AS iy
         |  FROM sc s JOIN exq e ON e.q_id = s.q_id AND e.n_id = s.id
         |  WHERE e.d2 > 0)
         |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         |  round((CAST(count(*) AS DOUBLE)
         |      * CAST(SUM(ix * iy) AS DOUBLE)
         |    - CAST(SUM(ix) AS DOUBLE) * CAST(SUM(iy) AS DOUBLE))
         |  / (sqrt(CAST(count(*) AS DOUBLE)
         |        * CAST(SUM(ix * ix) AS DOUBLE)
         |      - CAST(SUM(ix) AS DOUBLE) * CAST(SUM(ix) AS DOUBLE))
         |    * sqrt(CAST(count(*) AS DOUBLE)
         |        * CAST(SUM(iy * iy) AS DOUBLE)
         |      - CAST(SUM(iy) AS DOUBLE) * CAST(SUM(iy) AS DOUBLE))),
         |    6) AS corr,
         |  round(CAST(SUM(CAST(round(CAST(ix AS DOUBLE)
         |      / CAST(iy AS DOUBLE), 12) AS DECIMAL(38,12)))
         |    AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS mean_ratio
         |FROM jj""".stripMargin
    },

    "q219_cms_join_size" -> {
      val bu = (0 until 5).map(i =>
        s"""  SELECT $i AS i,
           |    ${scrambledHashSql(
               s"CAST(l_suppkey AS VARCHAR) || '#$i'")} % 8192 AS b
           |  FROM lineitem""".stripMargin)
        .mkString("\n  UNION ALL\n")
      s"""WITH bu AS (
         |$bu),
         |ct AS (SELECT i, b, count(*) AS c FROM bu GROUP BY 1, 2),
         |es AS (
         |  SELECT CAST(MIN(s) AS BIGINT) AS f2_est FROM (
         |    SELECT i, SUM(CAST(c*c AS DECIMAL(38,0))) AS s
         |    FROM ct GROUP BY 1)),
         |ex AS (
         |  SELECT CAST(SUM(f) AS BIGINT) AS n,
         |    CAST(count(*) AS BIGINT) AS n_keys,
         |    CAST(SUM(CAST(f*f AS DECIMAL(38,0))) AS BIGINT)
         |      AS f2_exact
         |  FROM (SELECT l_suppkey, count(*) AS f FROM lineitem
         |        GROUP BY 1))
         |SELECT ex.n, ex.n_keys, ex.f2_exact, es.f2_est,
         |  round(CAST(es.f2_est AS DOUBLE) / ex.f2_exact, 6) AS ratio,
         |  es.f2_est >= ex.f2_exact AS never_under
         |FROM ex, es""".stripMargin
    },

    "q217_coverage_gaps" ->
      """WITH dys AS (
        |  SELECT DISTINCT event_type AS key,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
        |  FROM events),
        |g AS (
        |  SELECT key, day,
        |    date_diff('day',
        |      lag(day) OVER (PARTITION BY key ORDER BY day), day) - 1
        |      AS gap
        |  FROM dys)
        |SELECT key AS event_type,
        |  CAST(count(*) AS BIGINT) AS n_active_days,
        |  CAST(date_diff('day', min(day), max(day)) + 1 AS INT)
        |    AS span_days,
        |  CAST(SUM(CASE WHEN gap > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_gaps,
        |  CAST(COALESCE(MAX(CASE WHEN gap > 0 THEN gap END), 0) AS INT)
        |    AS max_gap_days
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    "q218_golden_record" -> {
      s"""WITH RECURSIVE
         |${pairCtes(cap = 100, threshold = 0.1)},
         |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach(s, d) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
         |clus AS (
         |  SELECT doc.doc_id AS id,
         |    CAST(least(doc.doc_id, COALESCE(m.mn, doc.doc_id))
         |      AS BIGINT) AS cluster
         |  FROM documents doc
         |  LEFT JOIN (SELECT s, MIN(d) AS mn FROM reach GROUP BY s) m
         |    ON m.s = doc.doc_id),
         |dd AS (
         |  SELECT doc.doc_id AS id, c.cluster, doc.text, doc.lang,
         |    doc.source, doc.n_chars
         |  FROM documents doc JOIN clus c ON c.id = doc.doc_id),
         |multi AS (
         |  SELECT cluster, count(*) AS n_members,
         |    max(n_chars) AS max_chars
         |  FROM dd GROUP BY 1 HAVING count(*) >= 2),
         |rep AS (
         |  SELECT cluster, id AS rep_id FROM (
         |    SELECT cluster, id, ROW_NUMBER() OVER (PARTITION BY
         |      cluster ORDER BY length(text) DESC, id) AS rn
         |    FROM dd)
         |  WHERE rn = 1),
         |lm AS (
         |  SELECT cluster, lang AS lang_mode FROM (
         |    SELECT cluster, lang, ROW_NUMBER() OVER (PARTITION BY
         |      cluster ORDER BY count(*) DESC, lang) AS rn
         |    FROM dd GROUP BY 1, 2)
         |  WHERE rn = 1),
         |sm AS (
         |  SELECT cluster, source AS source_mode FROM (
         |    SELECT cluster, source, ROW_NUMBER() OVER (PARTITION BY
         |      cluster ORDER BY count(*) DESC, source) AS rn
         |    FROM dd GROUP BY 1, 2)
         |  WHERE rn = 1)
         |SELECT m.cluster, CAST(m.n_members AS BIGINT) AS n_members,
         |  r.rep_id, lm.lang_mode, sm.source_mode, m.max_chars
         |FROM multi m JOIN rep r USING (cluster)
         |JOIN lm USING (cluster) JOIN sm USING (cluster)
         |ORDER BY 1""".stripMargin
    },

    "q215_simpson_audit" ->
      """WITH g AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    SUM(CAST(CAST(l_quantity AS DOUBLE) AS DECIMAL(28,6)))
        |      AS sx,
        |    SUM(CAST(CAST(l_extendedprice AS DOUBLE)
        |      AS DECIMAL(28,6))) AS sy,
        |    SUM(CAST(CAST(l_quantity AS DOUBLE) *
        |      CAST(l_extendedprice AS DOUBLE) AS DECIMAL(38,6)))
        |      AS sxy,
        |    SUM(CAST(CAST(l_quantity AS DOUBLE) *
        |      CAST(l_quantity AS DOUBLE) AS DECIMAL(38,6))) AS sxx
        |  FROM lineitem GROUP BY 1),
        |p AS (
        |  SELECT SUM(n) AS pn, SUM(sx) AS psx, SUM(sy) AS psy,
        |    SUM(sxy) AS psxy, SUM(sxx) AS psxx
        |  FROM g),
        |sl AS (
        |  SELECT g.l_returnflag, g.n,
        |    (CAST(g.n AS DOUBLE) * CAST(g.sxy AS DOUBLE)
        |      - CAST(g.sx AS DOUBLE) * CAST(g.sy AS DOUBLE))
        |    / (CAST(g.n AS DOUBLE) * CAST(g.sxx AS DOUBLE)
        |      - CAST(g.sx AS DOUBLE) * CAST(g.sx AS DOUBLE)) AS bg,
        |    (CAST(p.pn AS DOUBLE) * CAST(p.psxy AS DOUBLE)
        |      - CAST(p.psx AS DOUBLE) * CAST(p.psy AS DOUBLE))
        |    / (CAST(p.pn AS DOUBLE) * CAST(p.psxx AS DOUBLE)
        |      - CAST(p.psx AS DOUBLE) * CAST(p.psx AS DOUBLE)) AS bp
        |  FROM g, p)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  round(bg, 6) AS slope_group, round(bp, 6) AS slope_pooled,
        |  sign(bg) <> sign(bp) AS reversed
        |FROM sl ORDER BY 1""".stripMargin,

    "q216_incremental_agg" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(SUM(CAST(value AS DECIMAL(28,9))) AS DOUBLE), 6)
        |    AS total,
        |  min(CAST(value AS DOUBLE)) AS mn,
        |  max(CAST(value AS DOUBLE)) AS mx,
        |  round(CAST(SUM(CAST(value AS DECIMAL(28,9))) AS DOUBLE)
        |    / count(*), 6) AS mean
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q214_pq_recall" -> {
      val qd = (0 until 4).map { s =>
        val qe = s"list_slice(q.embedding, ${s * 16 + 1}, ${s * 16 + 16})"
        s"""  SELECT q.vec_id AS q_id, $s AS sub, c.code,
           |    round(${d2Sql(qe, "c.cv")}, 9) AS qd2
           |  FROM embeddings q, p${s}cent c WHERE q.vec_id < 5"""
          .stripMargin
      }.mkString("\n  UNION ALL\n")
      val cl = (0 until 4)
        .map(s => s"  SELECT id, $s AS sub, code FROM p${s}asg")
        .mkString("\n  UNION ALL\n")
      s"""WITH ${(0 until 4).map(s => pqSubCtes(s, s * 16, 16, 8))
            .mkString(",\n")},
         |qd AS (
         |$qd),
         |cl AS (
         |$cl),
         |sc AS (
         |  SELECT d.q_id, c.id,
         |    CAST(SUM(CAST(d.qd2 AS DECIMAL(28,9))) AS DOUBLE)
         |      AS adist
         |  FROM cl c JOIN qd d ON d.sub = c.sub AND d.code = c.code
         |  WHERE c.id <> d.q_id GROUP BY 1, 2),
         |adc AS (
         |  SELECT q_id, id AS n_id FROM (
         |    SELECT q_id, id, ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY adist, id) AS rank FROM sc)
         |  WHERE rank <= 10),
         |exq AS (
         |  SELECT q_id, n_id FROM (
         |    SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |        ORDER BY round(${d2Sql("q.embedding", "c.embedding")},
         |          9), c.vec_id) AS rn
         |    FROM embeddings q JOIN embeddings c
         |      ON c.vec_id <> q.vec_id
         |    WHERE q.vec_id < 5)
         |  WHERE rn <= 10),
         |ov AS (
         |  SELECT e.q_id, count(*) AS n_overlap
         |  FROM exq e JOIN adc a ON a.q_id = e.q_id
         |    AND a.n_id = e.n_id
         |  GROUP BY 1)
         |SELECT q.vec_id AS q_id,
         |  CAST(COALESCE(o.n_overlap, 0) AS BIGINT) AS n_overlap,
         |  round(CAST(COALESCE(o.n_overlap, 0) AS DOUBLE) / 10.0, 6)
         |    AS recall_at_10
         |FROM embeddings q LEFT JOIN ov o ON o.q_id = q.vec_id
         |WHERE q.vec_id < 5 ORDER BY 1""".stripMargin
    },

    "q213_ivf_pq" -> {
      val qd = (0 until 4).map { s =>
        val qe = s"list_slice(q.embedding, ${s * 16 + 1}, ${s * 16 + 16})"
        s"""  SELECT q.vec_id AS q_id, $s AS sub, c.code,
           |    round(${d2Sql(qe, "c.cv")}, 9) AS qd2
           |  FROM embeddings q, p${s}cent c WHERE q.vec_id < 5"""
          .stripMargin
      }.mkString("\n  UNION ALL\n")
      val cl = (0 until 4)
        .map(s => s"  SELECT id, $s AS sub, code FROM p${s}asg")
        .mkString("\n  UNION ALL\n")
      s"""WITH ${kcenterCtes(5)},
         |ivfasg AS MATERIALIZED (
         |  ${assignSql("cent")}),
         |probe AS (
         |  SELECT q_id, cell FROM (
         |    SELECT q.vec_id AS q_id, c.cid AS cell,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |        ORDER BY round(${d2Sql("q.embedding", "c.cv")}, 9),
         |                 c.cid) AS rn
         |    FROM embeddings q, cent c WHERE q.vec_id < 5)
         |  WHERE rn <= 2),
         |cand AS (
         |  SELECT p.q_id, a.id FROM probe p
         |  JOIN ivfasg a ON a.cell = p.cell),
         |${(0 until 4).map(s => pqSubCtes(s, s * 16, 16, 8))
            .mkString(",\n")},
         |qd AS (
         |$qd),
         |cl AS (
         |$cl),
         |sc AS (
         |  SELECT d.q_id, c.id,
         |    CAST(SUM(CAST(d.qd2 AS DECIMAL(28,9))) AS DOUBLE)
         |      AS adist
         |  FROM cand x
         |  JOIN cl c ON c.id = x.id
         |  JOIN qd d ON d.q_id = x.q_id AND d.sub = c.sub
         |    AND d.code = c.code
         |  WHERE c.id <> d.q_id GROUP BY 1, 2)
         |SELECT q_id, id AS n_id, adist, rank FROM (
         |  SELECT q_id, id, adist,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY adist, id) AS INT) AS rank
         |  FROM sc)
         |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin
    },

    "q211_pq_codes" ->
      s"""WITH ${(0 until 4).map(s => pqSubCtes(s, s * 16, 16, 8))
            .mkString(",\n")}
         |SELECT a0.id AS vec_id, a0.code AS c0, a1.code AS c1,
         |  a2.code AS c2, a3.code AS c3
         |FROM p0asg a0 JOIN p1asg a1 USING (id)
         |JOIN p2asg a2 USING (id) JOIN p3asg a3 USING (id)
         |ORDER BY vec_id""".stripMargin,

    "q212_adc_topk" -> {
      val qd = (0 until 4).map { s =>
        val qe = s"list_slice(q.embedding, ${s * 16 + 1}, ${s * 16 + 16})"
        s"""  SELECT q.vec_id AS q_id, $s AS sub, c.code,
           |    round(${d2Sql(qe, "c.cv")}, 9) AS qd2
           |  FROM embeddings q, p${s}cent c WHERE q.vec_id < 5"""
          .stripMargin
      }.mkString("\n  UNION ALL\n")
      val cl = (0 until 4)
        .map(s => s"  SELECT id, $s AS sub, code FROM p${s}asg")
        .mkString("\n  UNION ALL\n")
      s"""WITH ${(0 until 4).map(s => pqSubCtes(s, s * 16, 16, 8))
            .mkString(",\n")},
         |qd AS (
         |$qd),
         |cl AS (
         |$cl),
         |sc AS (
         |  SELECT d.q_id, c.id,
         |    CAST(SUM(CAST(d.qd2 AS DECIMAL(28,9))) AS DOUBLE)
         |      AS adist
         |  FROM cl c JOIN qd d ON d.sub = c.sub AND d.code = c.code
         |  WHERE c.id <> d.q_id GROUP BY 1, 2)
         |SELECT q_id, id AS n_id, adist, rank FROM (
         |  SELECT q_id, id, adist,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY adist, id) AS INT) AS rank
         |  FROM sc)
         |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin
    },

    "q210_benford_audit" -> {
      // the e0 suffix makes DuckDB parse the literal as DOUBLE; a bare
      // decimal literal becomes DECIMAL(18,17), whose double cast is a
      // float division by 1e17 of a >2^53 numerator — 1 ulp off
      val probs = graft.engine.Aggregates.BenfordProbs.zipWithIndex
        .map { case (p, i) => s"(${i + 1}, ${p}e0)" }.mkString(", ")
      s"""WITH base AS (
         |  SELECT CAST(substr(CAST(CAST(o_totalprice * 100
         |    AS DECIMAL(38,0)) AS VARCHAR), 1, 1) AS INT) AS digit
         |  FROM orders WHERE o_totalprice > 0),
         |ct AS (SELECT digit, count(*) AS nd FROM base GROUP BY 1),
         |grid AS (
         |  SELECT gs.d AS digit, COALESCE(ct.nd, 0) AS nd
         |  FROM (SELECT unnest(generate_series(1, 9)) AS d) gs
         |  LEFT JOIN ct ON ct.digit = gs.d),
         |tot AS (SELECT SUM(nd) AS nn FROM grid),
         |ex AS (
         |  SELECT digit, CAST(ep AS DOUBLE) AS exp_p
         |  FROM (VALUES $probs) AS exv(digit, ep)),
         |tm AS (
         |  SELECT g.digit, g.nd, t.nn,
         |    CAST(g.nd AS DOUBLE) / t.nn AS obs, e.exp_p
         |  FROM grid g CROSS JOIN tot t JOIN ex e ON e.digit = g.digit)
         |SELECT digit, CAST(nd AS BIGINT) AS n,
         |  round(obs, 6) AS obs_p, exp_p,
         |  round(CAST(SUM(CAST(round(nn * (obs - exp_p) * (obs - exp_p)
         |      / exp_p, 12) AS DECIMAL(38,12))) OVER ()
         |    AS DOUBLE), 6) AS chi2
         |FROM tm ORDER BY digit""".stripMargin
    },

    "q206_cohen_kappa" ->
      s"""WITH conf AS (
         |  SELECT lang AS a, $langCase AS b, count(*) AS n
         |  FROM documents GROUP BY 1, 2),
         |tot AS (SELECT SUM(n) AS nn FROM conf),
         |agr AS (
         |  SELECT COALESCE(SUM(CASE WHEN a = b THEN n END), 0) AS ag
         |  FROM conf),
         |rm AS (SELECT a AS c, SUM(n) AS r FROM conf GROUP BY 1),
         |cm AS (SELECT b AS c, SUM(n) AS m FROM conf GROUP BY 1),
         |cr AS (SELECT COALESCE(SUM(rm.r * cm.m), 0) AS x
         |       FROM rm JOIN cm USING (c))
         |SELECT CAST(t.nn AS BIGINT) AS n,
         |  round(CAST(a2.ag AS DOUBLE) / t.nn, 6) AS po,
         |  round(CAST(c2.x AS DOUBLE)
         |    / (CAST(t.nn AS DOUBLE) * t.nn), 6) AS pe,
         |  CASE WHEN 1.0 - CAST(c2.x AS DOUBLE)
         |      / (CAST(t.nn AS DOUBLE) * t.nn) <> 0.0
         |    THEN round((CAST(a2.ag AS DOUBLE) / t.nn
         |        - CAST(c2.x AS DOUBLE) / (CAST(t.nn AS DOUBLE) * t.nn))
         |      / (1.0 - CAST(c2.x AS DOUBLE)
         |          / (CAST(t.nn AS DOUBLE) * t.nn)), 6)
         |  END AS kappa
         |FROM tot t, agr a2, cr c2""".stripMargin,

    "q205_psi_drift" -> {
      val binCase = (1 to 9).map(k =>
        s"CASE WHEN t.v > e.qs[$k] THEN 1 ELSE 0 END")
        .mkString("(", "\n        |     + ", ") AS b")
      s"""WITH sp AS (
        |  SELECT min(epoch_us(CAST(ts AS TIMESTAMP))) AS mn,
        |         max(epoch_us(CAST(ts AS TIMESTAMP))) AS mx
        |  FROM events),
        |tag AS (
        |  SELECT event_type AS key, CAST(value AS DOUBLE) AS v,
        |    epoch_us(CAST(ts AS TIMESTAMP)) < (sp.mn + sp.mx) // 2
        |      AS is_ref
        |  FROM events, sp WHERE value IS NOT NULL),
        |ed AS (
        |  SELECT key, quantile_cont(v,
        |    [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs
        |  FROM tag WHERE is_ref GROUP BY 1),
        |bi AS (
        |  SELECT t.key, t.is_ref,
        |    $binCase
        |  FROM tag t JOIN ed e USING (key)),
        |ct AS (
        |  SELECT key, b,
        |    SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS nr,
        |    SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS nc
        |  FROM bi GROUP BY 1, 2),
        |grid AS (
        |  SELECT e.key, gs.b FROM ed e CROSS JOIN
        |    (SELECT unnest(generate_series(0, 9)) AS b) gs),
        |fl AS (
        |  SELECT g.key, g.b, COALESCE(ct.nr, 0) AS nr,
        |    COALESCE(ct.nc, 0) AS nc
        |  FROM grid g LEFT JOIN ct USING (key, b)),
        |tot AS (
        |  SELECT key, SUM(nr) AS tnr, SUM(nc) AS tnc
        |  FROM fl GROUP BY 1),
        |tm AS (
        |  SELECT f.key, t.tnr, t.tnc,
        |    (f.nr + 0.5) / (t.tnr + 5.0) AS p,
        |    (f.nc + 0.5) / (t.tnc + 5.0) AS q
        |  FROM fl f JOIN tot t USING (key))
        |SELECT key AS event_type,
        |  CAST(max(tnr) AS BIGINT) AS n_ref,
        |  CAST(max(tnc) AS BIGINT) AS n_cur,
        |  round(CAST(SUM(CAST(round((p - q) * ln(p / q), 12)
        |    AS DECIMAL(38,12))) AS DOUBLE), 6) AS psi
        |FROM tm GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q204_local_clustering" ->
      s"""WITH $mutualKnnCtes,
         |ed AS (SELECT id_a AS a, id_b AS b FROM mutual),
         |trir AS (
         |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |  FROM ed e1 JOIN ed e2 ON e2.a = e1.b
         |  JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b),
         |degf AS (
         |  SELECT id, CAST(count(*) AS BIGINT) AS deg FROM (
         |    SELECT a AS id FROM ed UNION ALL SELECT b FROM ed)
         |  GROUP BY 1),
         |tcnt AS (
         |  SELECT id, CAST(count(*) AS BIGINT) AS tri FROM (
         |    SELECT x AS id FROM trir UNION ALL SELECT y FROM trir
         |    UNION ALL SELECT z FROM trir)
         |  GROUP BY 1)
         |SELECT e.vec_id AS id,
         |  COALESCE(d.deg, 0) AS degree,
         |  COALESCE(t.tri, 0) AS triangles,
         |  round(CASE WHEN COALESCE(d.deg, 0) >= 2
         |    THEN 2.0 * COALESCE(t.tri, 0) / (d.deg * (d.deg - 1))
         |    ELSE 0.0 END, 6) AS lcc
         |FROM embeddings e
         |LEFT JOIN degf d ON d.id = e.vec_id
         |LEFT JOIN tcnt t ON t.id = e.vec_id
         |ORDER BY 1""".stripMargin,

    "q203_pareto_skyline" ->
      """WITH prof AS (
        |  SELECT o_custkey AS custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS spend,
        |    CAST(count(*) AS BIGINT) AS n_orders,
        |    max(o_orderdate) AS last_order
        |  FROM orders GROUP BY 1)
        |SELECT custkey, spend, n_orders, last_order FROM prof p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM prof q
        |  WHERE q.spend >= p.spend AND q.n_orders >= p.n_orders
        |    AND q.last_order >= p.last_order
        |    AND (q.spend > p.spend OR q.n_orders > p.n_orders
        |         OR q.last_order > p.last_order))
        |ORDER BY custkey""".stripMargin,

    "q201_pca_power" ->
      s"""WITH ${pc1Ctes(20)}
         |SELECT lv.i AS dim, lv.l AS loading,
         |  round(lam.l, 6) AS lambda1,
         |  round(lam.l / tr.t, 6) AS explained
         |FROM loadv lv, lam, tr ORDER BY 1""".stripMargin,

    "q202_pc1_scores" ->
      s"""WITH ${pc1Ctes(20)}
         |SELECT e.vec_id,
         |  round(CAST(SUM(CAST(CAST(e.embedding[lv.i + 1] AS DOUBLE)
         |    * lv.l * 1000000000000 AS DECIMAL(38,0))) AS DOUBLE)
         |    / 1000000000000.0, 6) AS pc1
         |FROM embeddings e CROSS JOIN loadv lv
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q200_bcubed_quality" -> {
      val norm = "trim(regexp_replace(regexp_replace(lower(text), " +
        "'[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
      s"""WITH RECURSIVE
         |${pairCtes(cap = 100, threshold = 0.1)},
         |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach(s, d) AS (
         |  SELECT s, d FROM edges
         |  UNION
         |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
         |clus AS (
         |  SELECT doc.doc_id AS id,
         |    CAST(least(doc.doc_id, COALESCE(m.mn, doc.doc_id)) AS BIGINT)
         |      AS cluster
         |  FROM documents doc
         |  LEFT JOIN (SELECT s, MIN(d) AS mn FROM reach GROUP BY s) m
         |    ON m.s = doc.doc_id),
         |truth AS (
         |  SELECT doc_id AS id,
         |    min(doc_id) OVER (PARTITION BY $norm) AS gid
         |  FROM documents),
         |cg AS (
         |  SELECT c.cluster, t.gid, count(*) AS n_cg
         |  FROM clus c JOIN truth t ON t.id = c.id GROUP BY 1, 2),
         |cs AS (SELECT cluster, SUM(n_cg) AS n_c FROM cg GROUP BY 1),
         |gs AS (SELECT gid, SUM(n_cg) AS n_g FROM cg GROUP BY 1),
         |agg AS (
         |  SELECT CAST(SUM(n_cg) AS BIGINT) AS n_docs,
         |    CAST(SUM(CAST(round(CAST(n_cg AS DOUBLE)*n_cg/n_c, 12)
         |      AS DECIMAL(38,12))) AS DOUBLE) AS sp,
         |    CAST(SUM(CAST(round(CAST(n_cg AS DOUBLE)*n_cg/n_g, 12)
         |      AS DECIMAL(38,12))) AS DOUBLE) AS sr
         |  FROM cg JOIN cs USING (cluster) JOIN gs USING (gid)),
         |nc AS (SELECT CAST(count(DISTINCT cluster) AS BIGINT)
         |  AS n_clusters FROM clus),
         |ng AS (SELECT CAST(count(DISTINCT gid) AS BIGINT)
         |  AS n_groups FROM truth)
         |SELECT n_docs, n_clusters, n_groups,
         |  round(sp/n_docs, 6) AS bcubed_precision,
         |  round(sr/n_docs, 6) AS bcubed_recall,
         |  round(2*(sp/n_docs)*(sr/n_docs)/((sp/n_docs)+(sr/n_docs)), 6)
         |    AS bcubed_f1
         |FROM agg, nc, ng""".stripMargin
    },

    "q199_vocab_growth" ->
      s"""WITH toks AS (
         |  SELECT doc, tok FROM (
         |    SELECT doc_id AS doc, unnest($toksSql) AS tok
         |    FROM documents)
         |  WHERE length(tok) > 0),
         |pd AS (SELECT doc, count(*) AS n_toks FROM toks GROUP BY 1),
         |fo AS (
         |  SELECT doc, count(*) AS n_new
         |  FROM (SELECT tok, min(doc) AS doc FROM toks GROUP BY 1)
         |  GROUP BY 1),
         |cum AS (
         |  SELECT p.n_toks,
         |    SUM(p.n_toks) OVER (ORDER BY p.doc) AS ct,
         |    SUM(COALESCE(f.n_new, 0)) OVER (ORDER BY p.doc) AS cv
         |  FROM pd p LEFT JOIN fo f ON f.doc = p.doc),
         |xy AS (
         |  SELECT round(ln(CAST(ct AS DOUBLE)), 6) AS x,
         |    round(ln(CAST(cv AS DOUBLE)), 6) AS y
         |  FROM cum),
         |s AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n,
         |    CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) AS sx,
         |    CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS sy,
         |    CAST(SUM(CAST(round(x*x, 12) AS DECIMAL(38,12)))
         |      AS DOUBLE) AS sxx,
         |    CAST(SUM(CAST(round(x*y, 12) AS DECIMAL(38,12)))
         |      AS DOUBLE) AS sxy,
         |    CAST(SUM(CAST(round(y*y, 12) AS DECIMAL(38,12)))
         |      AS DOUBLE) AS syy
         |  FROM xy),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_toks) AS BIGINT) AS total_tokens FROM pd),
         |voc AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS vocab
         |  FROM toks)
         |SELECT n_docs, total_tokens, vocab,
         |  round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS beta,
         |  round(exp((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx))*sx) / n),
         |    6) AS k,
         |  round(((n*sxy - sx*sy)*(n*sxy - sx*sy)) /
         |        ((n*sxx - sx*sx)*(n*syy - sy*sy)), 6) AS r2
         |FROM s, tot, voc""".stripMargin,

    "q198_label_propagation" ->
      s"""WITH $mutualKnnCtes,
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst, round(sim, 9) AS w
         |  FROM mutual
         |  UNION ALL
         |  SELECT id_b, id_a, round(sim, 9) FROM mutual),
         |base AS (
         |  SELECT vec_id AS id,
         |    CASE WHEN vec_id % 5 = 0 THEN label END AS seed_label
         |  FROM embeddings),
         |st0 AS (SELECT id, seed_label AS label FROM base),
         |${lpaRoundSql(1)},
         |${lpaRoundSql(2)}
         |SELECT s.id, s.label, (b.seed_label IS NOT NULL) AS is_seed
         |FROM st2 s JOIN base b ON b.id = s.id
         |ORDER BY s.id""".stripMargin,

    "q35_cosine_neardup_pairs" ->
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  ${cosineSql("a.embedding", "b.embedding")} AS sim
         |FROM embeddings a JOIN embeddings b
         |  ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE ${cosineSql("a.embedding", "b.embedding")} >= 0.35
         |ORDER BY id_a, id_b""".stripMargin,

    "q36_tumbling_window" ->
      """SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS w_start,
        |       event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,

    "q37_sliding_window" ->
      """WITH assigned AS (
        |  SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS w_start,
        |         event_type FROM events
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
        |           - INTERVAL '5 minutes' AS w_start,
        |         event_type FROM events)
        |SELECT w_start, event_type, CAST(count(*) AS BIGINT) AS n
        |FROM assigned GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,

    "q38_session_window" ->
      """WITH flags AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
        |           OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER w
        |              >= INTERVAL '30 minutes'
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP))),
        |sessions AS (
        |  SELECT user_id, ts,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts) AS sid
        |  FROM flags)
        |SELECT user_id, min(ts) AS s_start,
        |       max(ts) + INTERVAL '30 minutes' AS s_end,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, s_start""".stripMargin,

    "q39_json_extract" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT))
        |            AS BIGINT) AS sum_k
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,

    "q40_multimodal_meta" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |       CAST(ord(substring(text, 1, 1)) AS INT) AS head_code
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q41_class_weights" ->
      """WITH counts AS (
        |  SELECT CASE
        |    WHEN p_type IN ('PROMO','ECONOMY') THEN 'BUDGET'
        |    WHEN p_type IN ('LARGE','MEDIUM') THEN 'BULK'
        |    WHEN p_type = 'STANDARD' THEN 'STANDARD'
        |    ELSE 'OTHER' END AS category,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1)
        |SELECT category, n,
        |  round(least(5.0, greatest(0.1,
        |    CAST(SUM(n) OVER () AS DOUBLE) / (4.0 * n))), 6) AS weight
        |FROM counts ORDER BY category""".stripMargin
    // Rows-only by design (no oracle possible): q42 seed-dependent
    // sampler; q43 GK sketch (approximation is the point); q49 KMeans
    // partitioning-sensitive; q56 HLL sketch binaries; q58 MLlib
    // MinHashLSH internals (the oracle-checked formulation is q32).
  )
}
