package graft.ext

import graft.SparkSpec

class EventOpsSpec extends SparkSpec {
  import spark.implicits._
  import java.sql.Timestamp

  private def ts(d: Int, h: Int) =
    Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")

  test("funnel: stage order enforced — events BEFORE the prior stage's " +
    "first touch do not count") {
    val events = Seq(
      // u1 completes in order: view(d1) click(d2) purchase(d3)
      (1L, "view", ts(1, 9)), (1L, "click", ts(2, 9)),
      (1L, "purchase", ts(3, 9)),
      // u2: click BEFORE first view → stage2 not reached
      (2L, "click", ts(1, 8)), (2L, "view", ts(1, 9)),
      (2L, "purchase", ts(1, 10)),
      // u3: view+click, purchase before click → stage3 not reached
      (3L, "view", ts(1, 9)), (3L, "purchase", ts(1, 10)),
      (3L, "click", ts(1, 11)),
      // u4: never views (click+purchase only) → not even stage1
      (4L, "click", ts(1, 9)), (4L, "purchase", ts(1, 10)))
      .toDF("user_id", "event_type", "ts")
    val out = EventOps.funnel(events, "user_id", "event_type", "ts",
        "view", "click", "purchase")
      .as[(Long, Long, Long)].collect().head
    assert(out == ((3L, 2L, 1L))) // u1,u2,u3 viewed; u1,u3 clicked after;
                                  // only u1 purchased after the click
  }

  test("funnel: same-timestamp stage events count (>= threshold)") {
    val events = Seq(
      (1L, "view", ts(1, 9)), (1L, "click", ts(1, 9)),
      (1L, "purchase", ts(1, 9)))
      .toDF("user_id", "event_type", "ts")
    val out = EventOps.funnel(events, "user_id", "event_type", "ts",
        "view", "click", "purchase")
      .as[(Long, Long, Long)].collect().head
    assert(out == ((1L, 1L, 1L)))
  }

  test("weeklyRetention: cohorts at week starts, offsets count from the " +
    "user's first week, distinct weeks only") {
    val events = Seq(
      // u1 first active Mon Jan 1 week, returns twice in week +2
      (1L, ts(2, 9)), (1L, ts(16, 9)), (1L, ts(17, 9)),
      // u2 first active week of Jan 8, active next week too
      (2L, ts(9, 9)), (2L, ts(15, 9)))
      .toDF("user_id", "ts")
    val out = EventOps.weeklyRetention(events, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .as[(Timestamp, Int, Long)].collect().toSeq
    val w1 = Timestamp.valueOf("2024-01-01 00:00:00")
    val w2 = Timestamp.valueOf("2024-01-08 00:00:00")
    assert(out == Seq(
      (w1, 0, 1L), (w1, 2, 1L),   // u1: week 0 and week +2 (once)
      (w2, 0, 1L), (w2, 1, 1L)))  // u2: consecutive weeks
  }

  test("concurrency: hand-computed boundary counts, half-open " +
    "[start, end), zero-length interval nets to zero") {
    // [1,5) [3,7) [5,9): at 3 two open, at 5 one closes + one opens;
    // [4,4) is zero-length and must never count
    val intervals = Seq((1L, 5L), (3L, 7L), (5L, 9L), (4L, 4L))
      .toDF("s", "e")
    val out = EventOps.concurrency(intervals, "s", "e")
      .orderBy("us").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L), (3L, 2L), (4L, 2L), (5L, 2L),
      (7L, 1L), (9L, 0L)))
  }

  test("concurrency: distributed prefix sum == single global window " +
    "on a larger frame, and the final boundary always nets to zero") {
    val rnd = new scala.util.Random(7)
    val intervals = Seq.tabulate(500) { i =>
      val s = rnd.nextInt(10000).toLong
      (s, s + 1 + rnd.nextInt(500))
    }.toDF("s", "e").repartition(7) // arbitrary input partitioning
    val out = EventOps.concurrency(intervals, "s", "e")
      .orderBy("us").as[(Long, Long)].collect().toSeq
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val oracle = intervals.select(col("s").as("us"), lit(1L).as("d"))
      .unionByName(intervals.select(col("e").as("us"), lit(-1L).as("d")))
      .groupBy("us").agg(sum(col("d")).as("d"))
      .select(col("us"), sum(col("d")).over(Window.orderBy("us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("c"))
      .orderBy("us").as[(Long, Long)].collect().toSeq
    assert(out == oracle)
    assert(out.last._2 == 0L) // every open interval eventually closes
  }

  test("prefixSums: multi-column cumulative sums match closed forms " +
    "across arbitrary input partitioning; input columns pass through") {
    val df = (1L to 200L).map(i => (i, 1L, i)).toDF("ord", "a", "b")
      .repartition(9)
    val out = EventOps.prefixSums(df, "ord", Seq("a", "b"))
      .orderBy("ord")
      .select("ord", "a", "b", "cum_a", "cum_b")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.size == 200)
    out.foreach { case (i, a, b, ca, cb) =>
      assert(a == 1L && b == i)
      assert(ca == i)               // Σ 1
      assert(cb == i * (i + 1) / 2) // Σ j
    }
  }

  test("transitionMatrix: hand-computed counts and conditional " +
    "probabilities; per-from probabilities sum to 1") {
    val events = Seq(
      // u1: a -> b -> a -> c   u2: a -> b
      (1L, 1L, "a", ts(1, 1)), (2L, 1L, "b", ts(1, 2)),
      (3L, 1L, "a", ts(1, 3)), (4L, 1L, "c", ts(1, 4)),
      (5L, 2L, "a", ts(2, 1)), (6L, 2L, "b", ts(2, 2)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = EventOps.transitionMatrix(events, "user_id", "event_type",
        "ts", "event_id")
      .orderBy("from_type", "to_type")
      .as[(String, String, Long, Double)].collect().toSeq
    // from a: 2×b + 1×c of 3; from b: 1×a of 1 (u2's b is terminal)
    assert(out == Seq(("a", "b", 2L, 2.0 / 3), ("a", "c", 1L, 1.0 / 3),
      ("b", "a", 1L, 1.0)))
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-12)
    }
  }

  test("transitionMatrix: same-timestamp ties break on the id column") {
    val t = ts(1, 1)
    val events = Seq(
      (10L, 1L, "a", t), (11L, 1L, "b", t), (12L, 1L, "c", t))
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = EventOps.transitionMatrix(events, "user_id", "event_type",
        "ts", "event_id")
      .orderBy("from_type")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out == Seq(("a", "b", 1L, 1.0), ("b", "c", 1L, 1.0)))
  }

  test("sessionTrigrams: hand-computed order-2 counts and conditionals; " +
    "per-context probabilities sum to 1; no cross-user trigrams (q187)") {
    val events = Seq(
      // u1: a b a b c → trigrams aba, bab, abc   u2: a b a → aba
      (1L, 1L, "a", ts(1, 1)), (2L, 1L, "b", ts(1, 2)),
      (3L, 1L, "a", ts(1, 3)), (4L, 1L, "b", ts(1, 4)),
      (5L, 1L, "c", ts(1, 5)),
      (6L, 2L, "a", ts(2, 1)), (7L, 2L, "b", ts(2, 2)),
      (8L, 2L, "a", ts(2, 3)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = EventOps.sessionTrigrams(events, "user_id", "event_type",
        "ts", "event_id")
      .orderBy("e1", "e2", "e3")
      .as[(String, String, String, Long, Double)].collect().toSeq
    // context (a,b): aba ×2, abc ×1 → 2/3, 1/3; context (b,a): bab ×1.
    // u2's trailing (b,a) pair never forms a trigram — and no trigram
    // spans the user boundary.
    assert(out == Seq(
      ("a", "b", "a", 2L, 0.666667),
      ("a", "b", "c", 1L, 0.333333),
      ("b", "a", "b", 1L, 1.0)))
    out.groupBy(r => (r._1, r._2)).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_._5).sum - 1.0) < 2e-6)
    }
  }

  test("seasonalIndex: hand-computed dow means and multiplicative " +
    "indices; indices weight-average to 1 per key (q189)") {
    // 2024-01-07 is a Sunday (dow 1), 2024-01-08 a Monday (dow 2)
    val events = Seq(
      (1L, 1L, "a", Timestamp.valueOf("2024-01-07 10:00:00"), 2.0),
      (2L, 1L, "a", Timestamp.valueOf("2024-01-14 10:00:00"), 4.0),
      (3L, 1L, "a", Timestamp.valueOf("2024-01-08 10:00:00"), 6.0))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = EventOps.seasonalIndex(events, "event_type", "ts", "value")
      .orderBy("dow").as[(String, Int, Long, Double, Double)]
      .collect().toSeq
    // Sunday mean (2+4)/2 = 3, Monday 6; key mean 12/3 = 4
    assert(out == Seq(("a", 1, 2L, 3.0, 0.75), ("a", 2, 1L, 6.0, 1.5)))
    // Σ n·idx = N (the multiplicative indices are count-weighted
    // deviations from the key mean)
    assert(math.abs(out.map(r => r._3 * r._5).sum - 3.0) < 1e-9)
  }

  test("sessionTrigrams: same-timestamp ties break on the id column") {
    val t = ts(1, 1)
    val events = Seq(
      (10L, 1L, "a", t), (11L, 1L, "b", t), (12L, 1L, "c", t))
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = EventOps.sessionTrigrams(events, "user_id", "event_type",
        "ts", "event_id")
      .as[(String, String, String, Long, Double)].collect().toSeq
    assert(out == Seq(("a", "b", "c", 1L, 1.0)))
  }

  test("cusumDrift: windowed prefix form == sequential " +
    "max(0, c+x) recurrence, including the first-day deviation") {
    import org.apache.spark.sql.functions.col
    // one event per (day, key): day_mean = value; mu = mean of values
    val vals = Seq(11.0, 7.0, 12.0, 12.0, 9.0) // mu = 10.2
    val ev = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, ts(i + 1, 0), 1L, "t", v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventOps.cusumDrift(ev, "event_type", "ts", "value")
      .orderBy("day").select("cusum").as[Double].collect().toSeq
    // sequential reference: c_t = max(0, c_{t-1} + (v_t - mu))
    val mu = BigDecimal(vals.sum / vals.length)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = vals.scanLeft(0.0) { (c, v) =>
      math.max(0.0, c + (v - mu)) }.tail
      .map(c => BigDecimal(c).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got.zip(expect).forall { case (a, b) =>
      math.abs(a - b) < 1e-9 }, s"got=$got expect=$expect")
    // first day is ABOVE baseline → its cusum must be positive (the
    // S₀=0 empty-prefix term; without it this reads 0)
    assert(got.head > 0)
  }

  test("ewma: geometric prefix form == sequential recurrence, " +
    "seeded at the first value") {
    val vals = Seq(10.0, 14.0, 6.0, 12.0, 8.0, 11.0)
    val ev = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, ts(i + 1, 0), 1L, "t", v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventOps.ewma(ev, "event_type", "ts", "value", alpha = 0.2)
      .orderBy("day").select("ewma").as[Double].collect().toSeq
    val expect = vals.tail.scanLeft(vals.head) { (e, v) =>
      0.2 * v + 0.8 * e }
    assert(got.zip(expect).forall { case (a, b) =>
      math.abs(a - b) < 1e-6 }, s"got=$got expect=$expect")
    assert(got.head == vals.head) // EWMA_1 = x_1 exactly
  }

  test("acf: hand-computed lag-1/lag-2 autocorrelation with the common " +
    "mean and variance denominator (not per-lag Pearson)") {
    // one event per day → daily mean = value; mean 11 exactly
    val vals = Seq(10.0, 12.0, 9.0, 14.0, 8.0, 13.0)
    val ev = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, ts(i + 1, 0), 1L, "t", v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventOps.acf(ev, "event_type", "ts", "value", 2)
      .orderBy("lag").as[(String, Int, Long, Double)].collect().toSeq
    // devs = [-1,1,-2,3,-3,2], den = 28
    // lag1: -1-2-6-9-6 = -24; lag2: 2+3+6+6 = 17
    assert(got == Seq(("t", 1, 5L, -24.0 / 28), ("t", 2, 4L, 17.0 / 28)),
      got.toString)
  }

  test("kaplanMeier: censored users stay in the risk set at their exit " +
    "day; survival is the product-limit; all-deaths tail hits 0.0 " +
    "(not null) despite Spark's log(0)=NULL") {
    val ev = Seq(
      // cohort "view": u1 death t=2, u2 censored t=4,
      // u3 death t=0 (same-day purchase), u4 censored t=0
      (1L, ts(1, 1), 1L, "view", 1.0), (2L, ts(3, 1), 1L, "purchase", 1.0),
      (3L, ts(1, 1), 2L, "view", 1.0), (4L, ts(5, 1), 2L, "click", 1.0),
      (5L, ts(1, 1), 3L, "view", 1.0), (6L, ts(1, 2), 3L, "purchase", 1.0),
      (7L, ts(1, 1), 4L, "view", 1.0),
      // cohort "error": single user dies at t=1 → terminal S = 0
      (8L, ts(1, 1), 5L, "error", 1.0), (9L, ts(2, 1), 5L, "purchase", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventOps.kaplanMeier(ev, "user_id", "ts", "event_id",
        "event_type", "purchase")
      .orderBy("cohort", "t")
      .as[(String, Int, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("error", 1, 1L, 1L, 0L, 0.0),
      // t=0: risk 4 (censored-at-0 u4 still at risk), 1 death → S=.75
      ("view", 0, 4L, 1L, 1L, 0.75),
      // t=2: risk 2, 1 death → S = .75 * .5
      ("view", 2, 2L, 1L, 0L, 0.375),
      // t=4: censor only — S unchanged
      ("view", 4, 1L, 0L, 1L, 0.375)), got.toString)
  }

  test("scd2: consecutive equal attrs collapse, intervals chain, " +
    "current version open; all windows share ONE exchange") {
    import org.apache.spark.sql.functions.col
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      (1L, ts(1), 7L, "A"), (2L, ts(2), 7L, "A"),  // no-op change
      (3L, ts(3), 7L, "B"), (4L, ts(4), 7L, "A"),
      (9L, ts(5), 8L, "X"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val hist = EventOps.scd2(ev, "user_id", "ts", "event_id", "event_type")
    val u7 = hist.filter(col("user_id") === 7)
      .orderBy("version")
      .as[(Long, Int, String, Timestamp, Option[Timestamp], Boolean)]
      .collect().toSeq
    assert(u7 == Seq(
      (7L, 1, "A", ts(1), Some(ts(3)), false),
      (7L, 2, "B", ts(3), Some(ts(4)), false),
      (7L, 3, "A", ts(4), None, true)))
    val u8 = hist.filter(col("user_id") === 8).collect()
    assert(u8.length == 1 && u8(0).getAs[Boolean]("is_current"))
    val plan = hist.queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1, plan)
  }

  test("coverageGaps: hand-computed gap census; dense feed reports " +
      "zero gaps; single-day key has span 1") {
    import org.apache.spark.sql.functions.col
    val events = Seq(
      // key a: days 1,2,5,9 → gaps of 2 (3–4) and 3 (6–8), span 9
      ("a", ts(1, 9)), ("a", ts(2, 9)), ("a", ts(2, 12)),
      ("a", ts(5, 9)), ("a", ts(9, 9)),
      // key b: days 1,2,3 → dense
      ("b", ts(1, 9)), ("b", ts(2, 9)), ("b", ts(3, 9)),
      // key c: one day
      ("c", ts(4, 9)))
      .toDF("k", "ts").select(col("k"), col("ts"))
    val out = EventOps.coverageGaps(events, "k", "ts")
      .as[(String, Long, Int, Long, Int)].collect().toSeq
    assert(out == Seq(
      ("a", 4L, 9, 2L, 3),
      ("b", 3L, 3, 0L, 0),
      ("c", 1L, 1, 0L, 0)))
  }

  test("psiDrift: identical halves → psi exactly 0; shifted half → " +
      "large psi; null values excluded; deterministic") {
    // seconds 0..9 land in the reference half (mid = 9.5 s), 10..19 in
    // the current half; both halves carry values 1..10 → every bin has
    // p == q → each term is exactly 0
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    def mk(rows: Seq[(String, Int, Option[Double])]) =
      rows.toDF("k", "s", "v")
        .select(col("k"), timestamp_seconds(col("s")).as("ts"),
          col("v").as("value"))
    val same = mk(
      (0 until 10).map(i => ("a", i, Some(i + 1.0))) ++
        (0 until 10).map(i => ("a", i + 10, Some(i + 1.0))))
    val r1 = EventOps.psiDrift(same, "k", "ts", "value")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(r1 == Seq(("a", 10L, 10L, 0.0)))
    // current window shifted +100 → everything piles into the top bin
    val shifted = mk(
      (0 until 10).map(i => ("a", i, Some(i + 1.0))) ++
        (0 until 10).map(i => ("a", i + 10, Some(i + 101.0))) :+
        ("a", 15, (None: Option[Double]))) // null: excluded, not bin 0
    val r2 = EventOps.psiDrift(shifted, "k", "ts", "value")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(r2.head._2 == 10L && r2.head._3 == 10L) // null dropped
    assert(r2.head._4 > 0.25, r2.toString) // "shifted" per rule of thumb
    val r3 = EventOps.psiDrift(shifted.repartition(7), "k", "ts", "value")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(r2 == r3)
  }
}
