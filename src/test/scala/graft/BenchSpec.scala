package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the relative stall-threshold machinery (round-8 fix): the
  * committed bench_full.json is the per-query anchor source, and the
  * re-run trigger is max(1 s, 2× anchor) with a 4 s fallback. This
  * exact logic adjudicates which driver-run samples get a second look —
  * rounds 6 AND 7 lost cycles to sub-threshold stall orphans, so the
  * parser and the formula are spec-pinned, not trusted. */
class BenchSpec extends AnyFunSuite {

  test("committedAnchors parses Bench's own JSON line format: short and " +
    "full keys, ms precision, failed (-1) excluded, top-level keys " +
    "ignored") {
    val line = """{"metric":"engine_total","value":266.551,"unit":"sec",
      |"queries":{"q01":1.234,"q105":1.099,"q238_incremental_dedup":1.716,
      |"q99":-1.000},"total_sec":266.551,"failed":1,"reruns":1,
      |"sf":"/root/testdata/sf0.1"}""".stripMargin.replace("\n", "")
    val f = java.nio.file.Files.createTempFile("benchspec", ".json")
    try {
      java.nio.file.Files.writeString(f, line)
      val a = Bench.committedAnchors(f)
      assert(a == Map("q01" -> 1.234, "q105" -> 1.099,
        "q238_incremental_dedup" -> 1.716))
    } finally java.nio.file.Files.delete(f)
  }

  test("committedAnchors: missing/unreadable file yields no anchors " +
    "(every query falls back to the absolute threshold)") {
    assert(Bench.committedAnchors(
      java.nio.file.Paths.get("/nonexistent/bench_full.json")).isEmpty)
  }

  test("rerunThreshold: 2x anchor with a 1s floor, full-name and " +
    "short-key lookup, 4s fallback when unanchored") {
    val a = Map("q01" -> 1.234, "q105" -> 0.2,
      "q238_incremental_dedup" -> 1.716)
    // short-key anchor via the name's qNN prefix. 2x, not 3x, since
    // round 10: the 2-3x band was the weak-mark blind spot (r9 verdict)
    assert(Bench.rerunThreshold("q01_flagship_category_topk", a)
      == 2 * 1.234)
    // full-name anchor wins when the file carries full names
    assert(Bench.rerunThreshold("q238_incremental_dedup", a) == 2 * 1.716)
    // the 1s floor: a 0.2s query must not re-run at 0.7s
    assert(Bench.rerunThreshold("q105_sessionize", a) == 1.0)
    // no anchor (new query this round) -> absolute fallback
    assert(Bench.rerunThreshold("q241_brand_new", a) == 4.0)
    assert(Bench.rerunThreshold("q241_brand_new", Map.empty) == 4.0)
  }

  test("the committed repo bench_full.json anchors the full registered " +
    "surface (it is the last FULL-suite run, not a subset artifact)") {
    val a = Bench.committedAnchors()
    // nearly every registered query must have an anchor under its short
    // or full key — a 4-query subset artifact (the round-7 failure shape
    // bench_median.py now guards) fails loudly here, while a handful of
    // new queries awaiting their first full run stay tolerated (they
    // fall back to the absolute threshold, which is safe)
    val missing = SparkEntry.queries.keySet
      .filter(_ != "q58_minhash_ml")
      .filterNot(n =>
        a.contains(n) || a.contains(n.takeWhile(_ != '_')))
    assert(missing.size <= SparkEntry.queries.size / 10,
      s"committed bench_full.json anchors too few queries — " +
        s"subset artifact? missing: $missing")
  }

  test("anchorBasis excludes stall-heavy runs from the anchor median " +
    "(round-14 item 5: median-of-3 admitted a run with 18 re-runs at " +
    "343.5 s and dragged the committed anchor), falls back to " +
    "all-runs median when fewer than two runs are clean") {
    // the r14 shape: two clean runs + one stall-heavy run. Old rule:
    // median of all three = 303.9; gated rule: median of the two
    // clean runs
    val r14 = Seq((288.5, 2), (303.9, 1), (343.5, 18))
    assert(Bench.anchorBasis(r14) == (288.5 + 303.9) / 2)
    // all clean: plain median
    assert(Bench.anchorBasis(Seq((10.0, 0), (12.0, 1), (11.0, 2))) == 11.0)
    // boundary: exactly MaxCleanAnchorReruns is still clean
    assert(Bench.anchorBasis(
      Seq((10.0, Bench.MaxCleanAnchorReruns), (12.0, 0),
        (100.0, Bench.MaxCleanAnchorReruns + 1))) == 11.0)
    // fewer than two clean runs: the gate can't adjudicate — median of
    // ALL runs, never a single-sample anchor
    assert(Bench.anchorBasis(
      Seq((10.0, 9), (12.0, 0), (14.0, 9))) == 12.0)
    assert(Bench.anchorBasis(Seq((10.0, 9), (14.0, 9))) == 12.0)
  }

  test("emittedClean folds failed==0 into the emitted flag (round-16 " +
    "advice: a failed run is not anchor-eligible no matter how quiet " +
    "the host was), and agrees with the stall gate when failed==0") {
    assert(Bench.emittedClean(0, 0))
    assert(Bench.emittedClean(Bench.MaxCleanAnchorReruns, 0))
    assert(!Bench.emittedClean(Bench.MaxCleanAnchorReruns + 1, 0))
    assert(!Bench.emittedClean(0, 1))
    assert(!Bench.emittedClean(Bench.MaxCleanAnchorReruns + 1, 3))
  }

  test("preflight gate pins (round-16 verdict item 5): the band is a " +
    "positive host-speed bound, the verdict is a pure threshold on " +
    "the median, and the sample count gives a real median") {
    assert(Bench.PreflightBandSec > 0)
    assert(Bench.PreflightSamples >= 3 && Bench.PreflightSamples % 2 == 1)
    assert(Bench.preflightOk(Bench.PreflightBandSec))
    assert(Bench.preflightOk(Bench.PreflightBandSec / 3))
    assert(!Bench.preflightOk(Bench.PreflightBandSec * 1.01))
    // the calibration job is sized to stay ~a few hundred ms on a
    // healthy host: rows pinned so nobody shrinks it into pure noise
    // or grows it into a second bench
    assert(Bench.PreflightRows == 64L * 1000 * 1000)
  }

  test("two-band preflight provenance (round-17 verdict item 5): the " +
    "anchor-grade band is strictly tighter than the stall-grade " +
    "default, and bench_battery.sh reads its default from the " +
    "Bench.AnchorPreflightBandSec constant rather than carrying its " +
    "own figure") {
    assert(Bench.AnchorPreflightBandSec > 0)
    assert(Bench.AnchorPreflightBandSec < Bench.PreflightBandSec,
      "anchor-grade must be stricter than stall-grade")
    val p = java.nio.file.Paths.get("scripts/bench_battery.sh")
    assume(java.nio.file.Files.exists(p),
      "battery script not visible from the working directory")
    val script = java.nio.file.Files.readString(p)
    assert(script.contains("AnchorPreflightBandSec"),
      "bench_battery.sh must source its default band from the " +
        "named constant (one source of truth)")
    // and the grep the script performs against Bench.scala actually
    // resolves to the constant's value
    val src = java.nio.file.Files.readString(
      java.nio.file.Paths.get("src/main/scala/graft/Bench.scala"))
    val m = """AnchorPreflightBandSec = ([0-9.]+)""".r
      .findFirstMatchIn(src)
    assert(m.exists(_.group(1).toDouble ==
      Bench.AnchorPreflightBandSec))
  }

  test("rerun value provenance (round-17 verdict item 6): the " +
    "committed per-query value after a stall re-run is min(first, " +
    "retry), except a FAILED retry keeps the first sample — a crash " +
    "must not read as a win") {
    assert(Bench.committedValue(2.0, 1.0) == 1.0) // retry confirmed
    assert(Bench.committedValue(1.0, 3.0) == 1.0) // first stands
    assert(Bench.committedValue(2.0, -1.0) == 2.0) // failed retry
    assert(Bench.committedValue(0.4, 0.4) == 0.4)
  }

  test("isCleanRun is the stall-gate half of the emitted flag and " +
    "agrees with the anchorBasis gate at the boundary (round-15 item " +
    "4: a consumer of the JSON line must not need to know " +
    "MaxCleanAnchorReruns)") {
    assert(Bench.isCleanRun(0))
    assert(Bench.isCleanRun(Bench.MaxCleanAnchorReruns))
    assert(!Bench.isCleanRun(Bench.MaxCleanAnchorReruns + 1))
    // a run isCleanRun rejects is exactly one anchorBasis excludes:
    // same constant, pinned from both sides
    val runs = Seq((10.0, Bench.MaxCleanAnchorReruns),
      (12.0, 0), (100.0, Bench.MaxCleanAnchorReruns + 1))
    assert(Bench.anchorBasis(runs) ==
      runs.filter(r => Bench.isCleanRun(r._2)).map(_._1).sorted.apply(1)
        / 2 + runs.filter(r => Bench.isCleanRun(r._2))
        .map(_._1).sorted.head / 2)
  }

  test("the committed bench_full.json carries the \"clean\" flag, " +
    "consistent with its own \"reruns\" and \"failed\" counts") {
    // assume, not assert, on the artifact's PRESENCE (round-16
    // advice): this is a consistency pin on the committed artifact
    // when one is committed and the suite runs from the repo root —
    // a missing file or absent fields cancels the test rather than
    // coupling the unit suite to the working directory
    val p = java.nio.file.Paths.get("bench_full.json")
    assume(java.nio.file.Files.exists(p),
      "no committed bench_full.json in the working directory")
    val txt = java.nio.file.Files.readString(p)
    val reruns = """"reruns":(\d+)""".r.findFirstMatchIn(txt)
      .map(_.group(1).toInt)
    val failed = """"failed":(\d+)""".r.findFirstMatchIn(txt)
      .map(_.group(1).toInt)
    val clean = """"clean":(true|false)""".r.findFirstMatchIn(txt)
      .map(_.group(1).toBoolean)
    assume(reruns.nonEmpty && failed.nonEmpty && clean.nonEmpty,
      "bench_full.json lacks the reruns/failed/clean fields")
    assert(clean.get == Bench.emittedClean(reruns.get, failed.get))
  }
}
