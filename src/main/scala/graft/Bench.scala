package graft
import org.apache.spark.sql.SparkSession

object Bench {
  /** q58 runs MLlib MinHashLSH purely as a stock-library comparison point
    * for the hand-rolled relational LSH (q32, ~16× faster). It is NOT an
    * engine query and its cost is host-sensitive (13–33 s typical, 80.6 s
    * on the round-4 driver host — half the round's bench budget and the
    * same failure mode that cost round 3 its artifact to rc=124), so the
    * bench skips it unless SPARK_GRAFT_MLLIB_BENCH is set (dev-only; the
    * driver never sets it). When run it reports under its own
    * mllib_comparison_sec key, exempt from warm-up and stall re-runs, so
    * the headline engine total is unaffected either way. */
  private val ComparisonQueries = Set("q58_minhash_ml")
  private val RunComparison = sys.env.contains("SPARK_GRAFT_MLLIB_BENCH")

  /** Queries that OWN a once-per-JVM shared scratch table
    * (ExtQueries.sharedPairs/sharedClusters/sharedPriceCdf/sharedCov/
    * sharedPq/mutualKnnFrame/sharedEventValueCounts/sharedBpe). In qNN
    * execution order the owner pays the compute and the consumers read
    * parquet — the honest pipeline shape. On a stall, OWNERS get a
    * re-run preceded by ExtQueries.resetSharedScratch(), which redirects
    * scratch paths to a fresh generation so the second sample re-times
    * the honest build — without it a one-off host stall on an owner is
    * charged permanently (round-6 verdict: q107's 11 s single cold
    * sample vs its 3.5–4.4 s anchor band). PURE consumers get a PLAIN
    * re-run with no reset: the cheap scratch read IS a consumer's honest
    * cost, so min-of-two is exactly the right second sample. (Rounds 6–8
    * exempted consumers from the re-run on the backwards rationale that
    * "a re-run would time the cheap read" — which let single host stalls
    * on q213/q214/q218/q204 be charged permanently in the round-8 driver
    * run. Round-9 fix per the verdict: only ComparisonQueries stay
    * exempt.) */
  private val ScratchOwners = ExtQueries.sharedScratchOwners

  /** Small representative warm-up set: codegen framework, JIT, shuffle
    * machinery, parquet footers for the main fixture tables, the text and
    * vector kernels, CSV and JSON readers. Rounds 2–3 warmed ALL queries,
    * which doubled suite wall time and blew the driver's bench budget
    * (BENCH_r03: rc=124, parsed:null) — steady-state accuracy for 125
    * queries is not worth losing the artifact. Excludes shared-scratch
    * consumers (a warm-up would pre-build the scratch and turn q55's
    * timed run into a read). */
  private val Warmup = Seq("q01_flagship_category_topk",
    "q15_topk_per_group_window", "q16_join_revenue_per_nation",
    "q26_token_counts", "q33_ann_bruteforce", "q36_tumbling_window",
    "q64_json_map", "q76_csv_scan")

  /** A timed result above its threshold re-runs once and reports
    * min(run1, run2): this shared host charges multi-second stalls to
    * arbitrary queries (95 s on a trivial agg, 87.7 s on q15 in the
    * round-3 judge run), and a single polluted sample distorts
    * round-over-round comparison.
    *
    * The threshold is RELATIVE to the committed per-query anchor:
    * max(1 s, 2× the bench_full.json value from the repo checkout),
    * falling back to an absolute 4 s for queries with no committed
    * value (new this round, or no file). Rounds 6–7 both lost
    * adjudication time to the old absolute-4 s rule: a 0.5–1 s query
    * stalled to 2.5–3.8 s kept its single polluted sample with no
    * second look (five such orphans in the round-7 driver run, all
    * later median-confirmed as stalls). The multiplier was 3× through
    * round 9; the round-9 verdict's remaining blind spot was the 2–3×
    * band — three multi-second values (q132/q133/q161) each sat just
    * UNDER 3× with no second sample and cost a judge round as `weak`
    * marks, all later median-confirmed as stalls. At 2× every value
    * the judge would flag carries both samples in rerun_samples, so
    * the weak-mark adjudication loop ends; the extra re-runs are
    * bounded (a genuine 2× value re-confirms in one cheap sample).
    * Legit expensive queries (exact-percentile pairs, scratch owners)
    * either confirm their cost in the re-run or are exempt above. */
  private val FallbackThresholdSec = 4.0

  /** Committed per-query anchors, read from bench_full.json BEFORE this
    * run overwrites it at the end. Keys in the committed file are the
    * compact qNN prefixes (Bench's own output format); top-level JSON
    * keys (metric/value/…) never match the qNN pattern, so a regex scan
    * is unambiguous and avoids a JSON dependency. */
  private[graft] def committedAnchors(
      path: java.nio.file.Path =
        java.nio.file.Paths.get("bench_full.json")): Map[String, Double] =
    try {
      val txt = java.nio.file.Files.readString(path)
      val re = """"(q\d{2,3}[a-z0-9_]*)":(-?\d+(?:\.\d+)?)""".r
      re.findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toDouble)
        .filter(_._2 >= 0) // a committed -1 (failed) is not an anchor
        .toMap
    } catch {
      // NonFatal, not Throwable: swallowing OutOfMemoryError /
      // InterruptedException here would silently degrade every
      // threshold to the 4 s fallback instead of surfacing the fault
      case scala.util.control.NonFatal(_) => Map.empty
    }

  /** The stall re-run trigger for one query: max(1 s, 2× its committed
    * anchor) — by full name or compact qNN key, whichever the committed
    * file carries — falling back to the absolute
    * [[FallbackThresholdSec]] when no anchor exists. */
  private[graft] def rerunThreshold(name: String,
      anchors: Map[String, Double]): Double = {
    val short = name.takeWhile(_ != '_')
    anchors.get(name).orElse(anchors.get(short))
      .map(v => math.max(1.0, 2.0 * v))
      .getOrElse(FallbackThresholdSec)
  }

  /** A full run with more stall re-runs than this is NOT a clean
    * anchor-basis run: the per-query stall machinery fired repeatedly,
    * i.e. the host window was bad for the whole run, and admitting it
    * into the anchor median drags the committed number (round-14: the
    * r14 anchor median included a run with 18 re-runs at 343.5 s
    * against two clean runs at 288.5/303.9). The bound is deliberately
    * loose — one or two re-runs happen on any shared host; a run in
    * the double digits is a window, not a measurement. */
  private[graft] val MaxCleanAnchorReruns = 6

  /** The run-level cleanliness verdict emitted as `"clean":true/false`
    * in BOTH JSON lines (round-15 verdict item 4): the anchor-basis
    * gate applied to the run itself, so a consumer of BENCH_rN.json or
    * bench_full.json can see "this run's total is anchor-INELIGIBLE"
    * without knowing [[MaxCleanAnchorReruns]]. [[anchorBasis]] filters
    * through THIS predicate, so the emitted flag and the anchor gate
    * cannot desynchronize. */
  private[graft] def isCleanRun(reruns: Int): Boolean =
    reruns <= MaxCleanAnchorReruns

  /** What the JSON lines actually EMIT as `"clean"` (round-16 advice):
    * the stall-gate verdict AND `failed == 0` — a run with a failed
    * query is not a valid anchor no matter how quiet the host was,
    * and a consumer reading the flag as "anchor-eligible" must not
    * need to also remember to check `failed`. [[anchorBasis]] keeps
    * its reruns-only signature — battery tooling feeds it runs it has
    * already screened for failures (anchor_basis.py refuses a
    * failed>0 run outright). */
  private[graft] def emittedClean(reruns: Int, failed: Int): Boolean =
    isCleanRun(reruns) && failed == 0

  /** HOST-HEALTH PREFLIGHT (round-16 verdict item 5): the closing
    * battery used to discover a degraded host window only AFTER
    * paying a full ~6-minute run the anchor gate then discarded
    * (round 16 burned 8 runs for 4 usable). Before the timed pass,
    * run [[PreflightSamples]] samples of a pinned fixture-independent
    * calibration job — a 64M-row hash-mod range aggregate: pure CPU +
    * shuffle machinery, no disk reads, so it measures the HOST, not
    * the data — and take the MEDIAN (a single stall must not fail a
    * healthy window, exactly the suite's own re-run reasoning). The
    * median is always emitted as `"preflight_sec"` in both JSON
    * lines; the SKIP behavior is opt-in via
    * SPARK_GRAFT_BENCH_PREFLIGHT_GATE (set by
    * scripts/bench_battery.sh, never by the driver — a driver round
    * must always produce its artifact, degraded window or not).
    * [[PreflightBandSec]] is pinned at ~3× the idle-host median
    * (measured 2026-08-16: 0.51 s cold-JVM — the first sample carries
    * JIT warm-up, which the median mostly absorbs — and 0.35 s warm),
    * the same multiple the per-query stall threshold uses — a host
    * running 3× slow on a CPU-bound kernel is exactly the window
    * whose full runs the gate has been discarding after the fact. */
  private[graft] val PreflightSamples = 5
  private[graft] val PreflightRows = 64L * 1000 * 1000

  /** TWO BANDS, one source of truth (round-17 verdict item 5). The
    * preflight median is compared against a band whose right value
    * depends on WHO is asking:
    *  - [[PreflightBandSec]] (1.5 s ≈ 3× the idle median) is the
    *    STALL-GRADE default compiled into Bench — loose on purpose: a
    *    driver round must always produce its artifact, so the only
    *    windows worth skipping even when gating is enabled are the
    *    unambiguous ones (host 3× slow on a pure-CPU kernel).
    *  - [[AnchorPreflightBandSec]] (0.6 s) is the ANCHOR-GRADE band
    *    `scripts/bench_battery.sh` uses for closing-anchor batteries,
    *    where a skipped run costs ~10 s and an admitted degraded run
    *    costs a full suite pass the anchor gate then discards anyway.
    *    Round-17 evidence: every sub-330 s clean run preflighted
    *    0.44–0.51 s while every stall-storm window preflighted
    *    0.64–0.80 s — 0.6 separates them cleanly. The script reads
    *    this constant out of this file (greps the `val` below) so the
    *    figure lives HERE and nowhere else; BenchSpec pins both the
    *    ordering (anchor-grade stricter than stall-grade) and the
    *    script's reference to the constant's name. */
  private[graft] val PreflightBandSec = 1.5
  private[graft] val AnchorPreflightBandSec = 0.6
  private[graft] def preflightOk(medianSec: Double): Boolean =
    medianSec <= PreflightBandSec
  private[graft] def preflightMedian(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions._
    def once(): Double = {
      val t0 = System.nanoTime()
      spark.range(PreflightRows)
        .select((col("id") % 1021).as("k"), col("id"))
        .groupBy("k").agg(sum("id").as("s"))
        .agg(sum("s"), max("s"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val xs = Seq.fill(PreflightSamples)(once()).sorted
    xs(PreflightSamples / 2)
  }

  /** RERUN VALUE PROVENANCE (round-17 verdict item 6, spec-pinned):
    * the per-query value the full JSON line COMMITS after a stall
    * re-run is min(first, retry) — the suite's standing
    * min-of-samples discipline — except when the retry FAILED
    * (retry < 0), where the first sample is kept: a crash says
    * nothing about the first sample's honesty, and recording the
    * smaller `-1` would turn a host blip into a fake win. Both raw
    * samples are always recorded in `rerun_samples`, so adjudication
    * never has to re-derive which one the committed line carries. */
  private[graft] def committedValue(first: Double, retry: Double)
      : Double = if (retry < 0) first else math.min(first, retry)

  /** The committed-anchor basis rule (round-14 verdict item 5),
    * spec-pinned so future rounds compute the closing anchor the same
    * way: median of the CLEAN runs ([[isCleanRun]]); when fewer than
    * two runs are clean the gate can't adjudicate, so fall back to
    * the median of ALL runs (conservative — same as the old rule)
    * rather than anchoring on a single sample. Each run is
    * (engineTotalSec, rerunCount) from its bench_full.json. */
  private[graft] def anchorBasis(runs: Seq[(Double, Int)]): Double = {
    require(runs.nonEmpty, "anchorBasis of no runs")
    val clean = runs.filter(r => isCleanRun(r._2)).map(_._1)
    val basis = if (clean.size >= 2) clean else runs.map(_._1)
    val s = basis.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // every fixture-loading session pins UTC: Tables.normalize's
      // Date→Timestamp / NTZ widenings and q183's ts→double cast are
      // value-exact only under a fixed session zone (Verify/PlanDump/
      // SparkSpec already pin it; a non-UTC bench host would otherwise
      // shift those casts by the host offset)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: the driver captures only a short stdout tail, and
    // round 3's WARN flood (localCheckpoint lineage, CSVHeaderChecker,
    // WindowExec) pushed the JSON line out of the captured window
    spark.sparkContext.setLogLevel("ERROR")
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // host-health preflight: always measured + emitted; gating is
    // opt-in (battery harness only — see the scaladoc above). The
    // band can be tightened/loosened per battery via
    // SPARK_GRAFT_PREFLIGHT_BAND (dev-only; also how the skip path is
    // exercised end-to-end without waiting for a degraded window).
    val band = sys.env.get("SPARK_GRAFT_PREFLIGHT_BAND")
      .map(_.toDouble).getOrElse(PreflightBandSec)
    val preflight = preflightMedian(spark)
    System.err.println(f"[bench] preflight median $preflight%.3f s " +
      f"(band $band%.2f s, ok=${preflight <= band})")
    if (sys.env.contains("SPARK_GRAFT_BENCH_PREFLIGHT_GATE") &&
        preflight > band) {
      // log-and-skip: the run is not paid for. bench_full.json is NOT
      // touched (the committed anchors stay), and the skip line is the
      // process's last stdout line, machine-readable by the harness.
      val skipLine = s"""{"metric":"preflight_skip","preflight_sec":${
        fmt(preflight)},"band_sec":${fmt(band)},"sf":"$sfDir"}"""
      println(skipLine)
      spark.stop()
      println(skipLine)
      return
    }
    // noop sink: materializes EVERY output column (count() lets Catalyst
    // prune unreferenced projections, under-measuring projection-heavy
    // queries like string ops / casts / quantization)
    //
    // post-run cleanup: localCheckpoint-based operators (jaccard postings,
    // dup clusters, prefix index) pin RDD blocks that outlive their query —
    // accumulated across the suite they degrade the whole JVM into GC/spill
    // (measured: ~3× uniform slowdown by the tail). A real pipeline runs
    // one job per JVM; the bench must not charge query N for query N−1's
    // blocks. blocking=true: the release runs outside the timed window
    // anyway, and an async release would bleed eviction work into the next
    // query's measurement. No DataFrame may be reused across run() calls.
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Unit =
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      finally {
        // in finally: a FAILED query must also release its blocks, or
        // the leak this cleanup exists to prevent comes back for the
        // remaining queries
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
      }
    val byName = SparkEntry.queries
    val anchors = committedAnchors()
    def thresholdFor(name: String): Double = rerunThreshold(name, anchors)
    Warmup.foreach { name =>
      try run(byName(name)) catch { case _: Throwable => }
    }
    def timed(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Double = {
      val t0 = System.nanoTime()
      // a failed query must NOT record its elapsed-to-crash as a normal
      // (smaller!) timing — mark it -1 so regressions can't read as wins
      try { run(fn); (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[bench] failed: ${e.getMessage}")
        -1.0
      }
    }
    // dev-only subset knob (the driver never sets it): isolate queries for
    // clean measurement without the full-suite wall cost
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSet)
    val firstPass = SparkEntry.orderedQueries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .filter { case (name, _) =>
        RunComparison || !ComparisonQueries.contains(name) }
      .map { case (name, fn) => (name, fn, timed(fn)) }
    var reruns = 0
    // both samples of every re-run, recorded for the artifact: three
    // rounds of adjudication reconstructed WHICH queries re-ran from
    // thresholds alone — bench_full.json now says so directly
    val rerunSamples = Seq.newBuilder[(String, Double, Double)]
    val results: Seq[(String, Double)] = firstPass.map {
      case (name, fn, t) =>
        val exempt = ComparisonQueries.contains(name)
        if (t > thresholdFor(name) && !exempt) {
          reruns += 1
          // owner re-run: invalidate the owner's OWN scratch family so
          // the second sample rebuilds into a fresh dir (honest compute,
          // not the parquet read of the first pass's output) — scoped
          // per family so the other owners' already-built scratch stays
          // valid for their later-running consumers. Pure consumers
          // re-run with NO reset: the cheap scratch read is their
          // honest cost.
          if (ScratchOwners.contains(name))
            ExtQueries.resetSharedScratch(name)
          val t2 = timed(fn)
          // a FAILED owner re-run leaves the family pointed at a fresh
          // unbuilt generation — roll it back to the first pass's built
          // dirs so later-stalling consumers in the family still time a
          // read, not a surprise rebuild (round-9 advice)
          if (t2 < 0 && ScratchOwners.contains(name))
            ExtQueries.rollbackSharedScratch(name, sfDir)
          rerunSamples += ((name, t, t2))
          name -> committedValue(t, t2)
        } else name -> t
    }
    // The harness keeps only a short tail of stdout, so the JSON line must
    // stay compact: per-query keys are shortened to their stable qNN prefix
    // (full-name mapping lives in SparkEntry.queries / BASELINE.md) and
    // timings rounded to ms. A 125-query map at full precision + full names
    // is ~2.5 KB and falls outside a 2 KB tail window — unparseable.
    def short(k: String): String = k.takeWhile(_ != '_')
    val collision =
      results.map(_._1).groupBy(short).exists(_._2.size > 1)
    def keyOf(k: String): String = if (collision) k else short(k)
    // fmt (defined at the top of main): Locale.ROOT so a comma decimal
    // separator cannot corrupt the JSON line
    val qs = results.map { case (k, v) => "\"" + keyOf(k) + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    val engine = results
      .filter { case (k, v) => v >= 0 && !ComparisonQueries.contains(k) }
      .map(_._2).sum
    val comparison = results
      .filter { case (k, v) => v >= 0 && ComparisonQueries.contains(k) }
      .map(_._2).sum
    // "value" stays the engine-query total (the BASELINE.md anchor);
    // total_sec is the inclusive wall total so round-over-round consumers
    // comparing against pre-split totals aren't misled by q58's move to
    // mllib_comparison_sec — the key is ABSENT (not 0) when the comparison
    // is gated off, so nobody reads "free" for "skipped".
    //
    // ARTIFACT-CAPTURE CONSTRAINT (round-4 lesson): the driver keeps only
    // the LAST ~2000 chars of stdout and json-parses a line from that
    // tail. At 180+ queries the full per-query map is ~2.6 KB — it can
    // NEVER fit, which is exactly how BENCH_r04 came back parsed:null
    // with a mid-value truncated tail. So: (1) the FULL line is printed
    // first (complete in any log that keeps full stdout), (2) the full
    // map is also written to bench_full.json next to the build for the
    // judge, and (3) the LAST line printed is a COMPACT summary — same
    // schema, "queries" holding only the 10 slowest (schema-compatible
    // subset), plus n_queries + queries_file pointing at the full map —
    // small enough (~350 B) to sit entirely inside the tail even with
    // sbt's trailing "[success]" line.
    val comparisonField =
      if (RunComparison) s""""mllib_comparison_sec":${fmt(comparison)},"""
      else ""
    // rerun evidence: "qNN":[first, second] per re-ran query. Values are
    // ARRAYS, so committedAnchors' "name":number regex cannot mistake
    // them for anchors; a query absent from this map ran single-sample.
    val rerunField = {
      val samples = rerunSamples.result()
      if (samples.isEmpty) ""
      else samples.map { case (k, a, b) =>
        "\"" + keyOf(k) + "\":[" + fmt(a) + "," + fmt(b) + "]"
      }.mkString(""""rerun_samples":{""", ",", "},")
    }
    // "clean": anchor-eligibility of THIS run (round-15 verdict item
    // 4; round-16 advice folded failed==0 in) — false means the stall
    // machinery fired more than MaxCleanAnchorReruns times OR a query
    // failed; consumers need to know neither the gate constant nor
    // the failed-run rule to interpret it
    val clean = emittedClean(reruns, failed)
    val fullLine = s"""{"metric":"engine_total","value":${fmt(engine)},"unit":"sec","queries":$qs,$comparisonField$rerunField"total_sec":${fmt(engine + comparison)},"failed":$failed,"reruns":$reruns,"clean":$clean,"preflight_sec":${fmt(preflight)},"sf":"$sfDir"}"""
    println(fullLine)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_full.json"), fullLine + "\n")
    catch { case _: Throwable => () } // best effort; stdout already has it
    val slowest = results.filter(_._2 >= 0).sortBy(-_._2).take(10)
      .map { case (k, v) => "\"" + keyOf(k) + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val compactLine = s"""{"metric":"engine_total","value":${fmt(engine)},"unit":"sec","queries":$slowest,"n_queries":${results.size},$comparisonField"total_sec":${fmt(engine + comparison)},"failed":$failed,"reruns":$reruns,"clean":$clean,"preflight_sec":${fmt(preflight)},"queries_file":"bench_full.json","sf":"$sfDir"}"""
    // fixed-name sidecar a consumer can read without scraping stdout
    // (round-14 verdict item 6: the stdout tail parse has failed every
    // round because trailing build-tool output displaced the line)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_compact.json"), compactLine + "\n")
    catch { case _: Throwable => () }
    // stop BEFORE the final println so no Spark shutdown output can
    // land after it; build.sbt additionally silences sbt's trailing
    // "[success]" footer (showSuccess := false) and routes forked
    // stdout through unprefixed (outputStrategy := StdoutOutput), so
    // this compact line IS the process's last stdout line — parseable
    // from a bounded tail with plain json.loads
    spark.stop()
    println(compactLine)
  }
}
