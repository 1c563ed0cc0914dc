package graft

/** Driver-contract smoke: the exact surface the driver exercises.
  * Running every registered query at sf0.001 catches runtime breakage
  * (schema drift, bad plans) in seconds, before the sf0.01 oracle gate. */
class EntrySpec extends SparkSpec {

  test("entry() returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a registered query; names are well-formed") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracle without query: $orphans")
    assert(qs.forall(_.matches("q\\d{2,3}_[a-z0-9_]+")), qs)
  }

  test("all registered queries execute at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sf0001).count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("resetSharedScratch: Bench's owner-rerun path — scratch rebuilds " +
    "into a fresh generation mid-JVM and owner + consumer results are " +
    "byte-identical") {
    // q107 owns the price-CDF scratch, q113 reads it; after a reset the
    // next touch must REBUILD (not read a stale path) and reproduce the
    // same rows — the property the stall re-run's second sample relies on
    def rows(name: String) =
      SparkEntry.queries(name)(spark, sf0001).collect().toSeq
    val ownerBefore = rows("q107_iqr_outliers")
    val readerBefore = rows("q113_winsorized_mean")
    ExtQueries.resetSharedScratch()
    assert(rows("q107_iqr_outliers") == ownerBefore)
    assert(rows("q113_winsorized_mean") == readerBefore)
  }

  test("resetSharedScratch(owner) is scoped to the owner's family: " +
    "another family's scratch path (and memo) survives the reset") {
    def rows(name: String) =
      SparkEntry.queries(name)(spark, sf0001).collect().toSeq
    // build two families' scratch (q107 → cdf_li_price, q146 →
    // ev_valcounts), then reset ONLY q146's family
    val cdfBefore = rows("q107_iqr_outliers")
    val evBefore = rows("q146_mad_outliers")
    val cdfPath = ExtQueries.scratchPathFor("cdf_li_price", sf0001)
    val evPath = ExtQueries.scratchPathFor("ev_valcounts", sf0001)
    ExtQueries.resetSharedScratch("q146_mad_outliers")
    // only the reset owner's family moved to a new generation
    assert(ExtQueries.scratchPathFor("cdf_li_price", sf0001) == cdfPath)
    assert(ExtQueries.scratchPathFor("ev_valcounts", sf0001) != evPath)
    // the reset family rebuilds byte-identically; the untouched family
    // still answers from its existing scratch
    assert(rows("q146_mad_outliers") == evBefore)
    assert(rows("q107_iqr_outliers") == cdfBefore)
  }

  test("round-10 scratch families rebuild byte-identically after an " +
    "owner reset (the property Bench's stall re-run second sample " +
    "relies on): exact-state, LSH-state and fingerprint-state " +
    "owners + one consumer each") {
    def rows(name: String) =
      SparkEntry.queries(name)(spark, sf0001).collect().toSeq
    // owner + a consumer per family, BEFORE any reset
    val before = Seq("q238_incremental_dedup", "q243_cluster_upsert",
      "q242_incremental_lsh", "q248_lifecycle",
      "q250_incremental_payload", "q251_fp_upsert")
      .map(n => n -> rows(n)).toMap
    Seq("q238_incremental_dedup", "q242_incremental_lsh",
      "q250_incremental_payload")
      .foreach(ExtQueries.resetSharedScratch)
    before.foreach { case (n, r) => assert(rows(n) == r, n) }
  }

  test("round-11 scratch families rebuild byte-identically after an " +
    "owner reset: the embedding-state family (q245 owner — index + " +
    "cluster table) and the fingerprint family's new cluster kind, " +
    "with the lifecycle chains as consumers") {
    def rows(name: String) =
      SparkEntry.queries(name)(spark, sf0001).collect().toSeq
    val before = Seq("q245_incremental_embed", "q255_emb_upsert",
      "q259_emb_lifecycle", "q260_fp_lifecycle")
      .map(n => n -> rows(n)).toMap
    // both round-11-extended families reset; every consumer must
    // rebuild into a fresh generation and reproduce the same rows
    val embPath = ExtQueries.scratchPathFor("embclusters", sf0001)
    val fpPath = ExtQueries.scratchPathFor("fpclusters", sf0001)
    Seq("q245_incremental_embed", "q250_incremental_payload")
      .foreach(ExtQueries.resetSharedScratch)
    assert(ExtQueries.scratchPathFor("embclusters", sf0001) != embPath)
    assert(ExtQueries.scratchPathFor("fpclusters", sf0001) != fpPath)
    before.foreach { case (n, r) => assert(rows(n) == r, n) }
  }

  test("rollbackSharedScratch: a failed owner re-run restores the " +
    "previous generation's path AND memo, so a consumer reads instead " +
    "of rebuilding (round-9 advice)") {
    def rows(name: String) =
      SparkEntry.queries(name)(spark, sf0001).collect().toSeq
    // build q146's family, then simulate Bench's owner-rerun-failed
    // sequence: reset (fresh unbuilt generation) then rollback
    val evBefore = rows("q146_mad_outliers")
    val builtPath = ExtQueries.scratchPathFor("ev_valcounts", sf0001)
    assert(ExtQueries.scratchMemoized("ev_valcounts", sf0001))
    ExtQueries.resetSharedScratch("q146_mad_outliers")
    assert(!ExtQueries.scratchMemoized("ev_valcounts", sf0001))
    ExtQueries.rollbackSharedScratch("q146_mad_outliers", sf0001)
    // back on the built generation, memo restored -> no rebuild
    assert(ExtQueries.scratchPathFor("ev_valcounts", sf0001) == builtPath)
    assert(ExtQueries.scratchMemoized("ev_valcounts", sf0001))
    assert(rows("q146_mad_outliers") == evBefore)
  }
}
