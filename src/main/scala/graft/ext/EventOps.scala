package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Event-stream analytics over the `events` table: ordered funnels and
  * cohort retention — the product-analytics queries a training-data
  * pipeline's telemetry side needs (and classic non-trivial SQL shapes:
  * correlated stage thresholds, cohort × offset matrices).
  */
object EventOps {

  /** Ordered three-stage funnel: users who did `s1`, then `s2` AFTER
    * their first `s1`, then `s3` after that first qualifying `s2`.
    * Returns one row of stage counts.
    *
    * Each stage is a conditional-min aggregate on the user key joined
    * back for the next stage's threshold — stage thresholds are
    * correlated (stage N's min must follow stage N−1's), which no single
    * agg expresses. All three aggregates and both joins share the
    * user-key partitioning (one shuffle each, |users|-sized frames after
    * the first), and the events scan is reread per stage rather than
    * cached — at 100 TB a date-bounded scan beats pinning the corpus.
    * First-touch semantics (min ts) keep the result replay-deterministic;
    * ties inside a stage collapse under min. */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, s1: String, s2: String, s3: String): DataFrame = {
    val t1 = events.groupBy(userCol)
      .agg(min(when(col(typeCol) === s1, col(tsCol))).as("t1"))
      .filter(col("t1").isNotNull)
    val t2 = events.join(t1, userCol)
      .groupBy(userCol)
      .agg(min(when(col(typeCol) === s2 && col(tsCol) >= col("t1"),
        col(tsCol))).as("t2"))
      .filter(col("t2").isNotNull)
    val t3 = events.join(t2, userCol)
      .groupBy(userCol)
      .agg(min(when(col(typeCol) === s3 && col(tsCol) >= col("t2"),
        col(tsCol))).as("t3"))
      .filter(col("t3").isNotNull)
    t1.agg(count(lit(1)).as("n_stage1"))
      .crossJoin(t2.agg(count(lit(1)).as("n_stage2")))
      .crossJoin(t3.agg(count(lit(1)).as("n_stage3")))
  }

  /** Weekly cohort retention matrix: users grouped by the week of their
    * first event; one row per (cohort week, week offset) with the count
    * of cohort users active in that week.
    *
    * Two user-keyed aggregates (first-event week; distinct active weeks)
    * and one join — every shuffle is on the user key or the final
    * (cohort, offset) pair (≤ weeks² rows). Offsets are exact multiples
    * of 7 days by construction (both sides truncate to week starts), so
    * the integer division is exact in any engine. */
  def weeklyRetention(events: DataFrame, userCol: String, tsCol: String)
      : DataFrame = {
    val cohort = events.groupBy(userCol)
      .agg(date_trunc("week", min(col(tsCol))).as("cohort_week"))
    val active = events
      .select(col(userCol), date_trunc("week", col(tsCol)).as("wk"))
      .distinct()
    active.join(cohort, userCol)
      .groupBy(col("cohort_week"),
        (datediff(col("wk"), col("cohort_week")) / 7).cast("int")
          .as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Interval concurrency via a DISTRIBUTED prefix sum: given intervals
    * [start, end) as long columns, return one row per distinct boundary
    * value with the number of intervals open after processing every
    * boundary at that value (+1 at start, −1 at end; grouping boundaries
    * by value first makes the result independent of any within-timestamp
    * tie order, and gives half-open semantics — a zero-length interval
    * nets to 0 and is never counted).
    *
    * The running sum is the textbook scalable scan, NOT a global
    * single-partition window (the `WindowExec: No Partition Defined`
    * anti-pattern, which serializes the whole boundary stream through one
    * task): range-partition by boundary value, cumulative-sum WITHIN each
    * partition (partitioned window — parallel), and bridge partitions by
    * collecting one subtotal per partition to the driver (≤
    * shuffle.partitions rows, the q90/q129 documented KB-scale pattern)
    * and broadcasting exclusive prefix offsets back. Two shuffles total
    * (boundary group-by, range partition); everything else is map-side.
    * The ranged frame is lineage-truncated because both the subtotal pass
    * and the output consume its partition ids, which must agree. */
  def concurrency(intervals: DataFrame, startCol: String, endCol: String)
      : DataFrame = {
    val boundaries = intervals.select(col(startCol).as("us"),
        lit(1L).as("delta"))
      .unionByName(intervals.select(col(endCol).as("us"),
        lit(-1L).as("delta")))
      .groupBy("us").agg(sum(col("delta")).as("delta"))
    prefixSums(boundaries, "us", Seq("delta"))
      .select(col("us"), col("cum_delta").as("concurrent"))
  }

  /** Distributed inclusive prefix sums of one or more LONG columns over
    * a global `orderCol` order — the reusable form of [[concurrency]]'s
    * scan, shared with TextOps.vocabGrowth. Appends `cum_<c>` for each
    * value column; `orderCol` values must be distinct (group first).
    *
    * NOT a global single-partition window (the `WindowExec: No
    * Partition Defined` anti-pattern): range-partition on `orderCol`,
    * window-cumsum WITHIN each partition (parallel), bridge partitions
    * by collecting ≤ shuffle.partitions subtotal rows to the driver
    * (the q90/q129 documented KB-scale collect) and broadcasting
    * exclusive prefix offsets back. Two shuffles total; the ranged
    * frame is lineage-truncated because the subtotal pass and the
    * output must agree on partition ids. */
  def prefixSums(df: DataFrame, orderCol: String, valCols: Seq[String])
      : DataFrame = {
    require(valCols.nonEmpty, "need at least one value column")
    val spark = df.sparkSession
    val ranged = df
      .repartitionByRange(col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = true) // pid read by subtotals AND output
    val subtotals = ranged.groupBy("__pid")
      .agg(valCols.head -> "sum", valCols.tail.map(_ -> "sum"): _*)
      .orderBy("__pid")
      .collect()
      .map(r => (r.getInt(0), valCols.indices.map(i => r.getLong(i + 1))))
    val zero = valCols.map(_ => 0L).toIndexedSeq
    val offsets = subtotals.scanLeft((0, zero)) {
      case ((_, acc), (pid, t)) =>
        (pid, acc.lazyZip(t).map(_ + _))
    }.init.zip(subtotals).map { case ((_, prefix), (pid, _)) =>
      Row.fromSeq(pid +: prefix)
    } // exclusive prefix: sum of all earlier partitions' subtotals
    val offSchema = StructType(StructField("__pid", IntegerType) +:
      valCols.map(c => StructField(s"__off_$c", LongType)))
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsets.toSeq, 1), offSchema)
    val inPart = Window.partitionBy("__pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cums = valCols.map(c =>
      (col(s"__off_$c") + sum(col(c)).over(inPart)).as(s"cum_$c"))
    ranged.join(broadcast(offDf), "__pid")
      .select(df.columns.map(col).toIndexedSeq ++ cums: _*)
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * one row per observed (from_type, to_type) with the transition count
    * and the conditional probability p(to | from).
    *
    * One shuffle on the user key for the `lead` window (ordered by
    * truncated-µs timestamp then event id — fully deterministic), one
    * |types|²-bounded aggregate, and a broadcast join against the
    * |types|-row per-source totals. n/ntot is an IEEE division of two
    * exact longs, so the probability is bit-identical cross-engine. */
  def transitionMatrix(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(userCol)
      .orderBy(col("__us"), col(idCol))
    val counts = events
      .withColumn("__us", unix_micros(col(tsCol).cast("timestamp")))
      .withColumn("to_type", lead(col(typeCol), 1).over(w))
      .filter(col("to_type").isNotNull)
      .select(col(typeCol).as("from_type"), col("to_type"))
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("from_type")
      .agg(sum(col("n")).as("ntot"))
    counts.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast("double") / col("ntot").cast("double")).as("p"))
  }

  /** Day-of-week seasonal decomposition of a per-key metric: for each
    * (key, dow 1=Sunday..7) the observation count, the exact mean, and
    * the SEASONAL INDEX dow_mean / key_mean — the multiplicative
    * weekly-seasonality profile (index > 1 = hot day), the first
    * decomposition any event-rate monitor or forecast baseline needs
    * (de-seasonalize by dividing by the index before alerting, q184's
    * rolling z-scores upstream).
    *
    * ONE (key, dow) partial-agg shuffle; the per-key totals derive from
    * the ≤7 dow partials via a window over the key (never a second scan
    * of the events). Means divide exact decimal sums by exact counts,
    * index at 6 dp — partitioning-invariant, oracle-replicable (DuckDB
    * `dayofweek` is 0-based, its oracle adds 1). */
  def seasonalIndex(events: DataFrame, keyCol: String, tsCol: String,
      valCol: String): DataFrame = {
    val byDow = events
      .groupBy(col(keyCol), dayofweek(col(tsCol)).as("dow"))
      .agg(count(lit(1)).as("n"),
        sum(col(valCol).cast("decimal(38,6)")).as("__s"))
    val wk = Window.partitionBy(keyCol)
    byDow
      .withColumn("__mean", col("__s").cast("double") / col("n"))
      .withColumn("__keyMean",
        sum(col("__s")).over(wk).cast("double") /
          sum(col("n")).over(wk))
      .select(col(keyCol), col("dow"), col("n"),
        round(col("__mean"), 6).as("dow_mean"),
        round(col("__mean") / col("__keyMean"), 6).as("seasonal_idx"))
  }

  /** Order-2 session paths: event-type TRIGRAM counts across per-user
    * time-ordered streams with the order-2 conditional p(e₃ | e₁,e₂) —
    * the sequence-mining extension of [[transitionMatrix]]'s order-1
    * transitions (funnel discovery: which two-step contexts determine
    * the next action). Returns (e1, e2, e3, n, p_cond) for every
    * observed trigram; callers rank/limit on top.
    *
    * ONE user-partitioned sort feeds both `lead` columns (same exchange
    * as transitionMatrix); the conditional is a window sum over the
    * |types|³-bounded trigram counts — no second scan of the events.
    * p_cond rounds to 6 dp from an exact-long ratio ⇒ bit-identical
    * cross-engine. */
  def sessionTrigrams(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val tri = events
      .select(col(userCol), col(tsCol), col(idCol),
        col(typeCol).as("e1"))
      .withColumn("e2", lead("e1", 1).over(w))
      .withColumn("e3", lead("e1", 2).over(w))
      .filter(col("e3").isNotNull)
      .groupBy("e1", "e2", "e3")
      .agg(count(lit(1)).as("n"))
    val ctx = Window.partitionBy("e1", "e2")
    tri.withColumn("p_cond",
      round(col("n") / sum(col("n")).over(ctx), 6))
  }

  /** CUSUM drift detection over a per-key daily metric: alarm when the
    * cumulative sum of deviations from the key's baseline exceeds a
    * threshold — the sequential change-point detector (catches slow
    * drifts a per-day z-score never trips on).
    *
    * The recurrence CUSUM_t = max(0, CUSUM_{t-1} + x_t) is
    * NON-associative — naively a sequential scan. The distributed form
    * uses the prefix identity CUSUM_t = S_t − min(0, min_{j≤t} S_j)
    * (S = running sum of deviations; the 0 is the empty prefix S₀,
    * without which the first positive deviation would report 0): BOTH
    * terms are plain windowed aggregates sharing one key-partitioned
    * sort, so the whole detector is one exchange, no sequential pass,
    * no state. Deviations
    * accumulate through exact decimals ⇒ partitioning-invariant.
    * Threshold = `hSigmas` × the key's deviation stddev (exact-sum
    * form, deterministic). Returns (key, day, day_mean, cusum, alarm). */
  def cusumDrift(events: DataFrame, keyCol: String, tsCol: String,
      valCol: String, hSigmas: Double = 2.0): DataFrame = {
    import graft.engine.Aggregates.{sumExact6, stddevExact}
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(round(sumExact6(col(valCol)) / count(lit(1)), 6).as("day_mean"))
    val base = daily.groupBy(keyCol)
      .agg(round(sumExact6(col("day_mean")) / count(lit(1)), 6).as("__mu"),
        stddevExact(col("day_mean")).as("__sd"))
    val w = Window.partitionBy(keyCol).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(broadcast(base), Seq(keyCol))
      .withColumn("__s",
        sum((col("day_mean") - col("__mu")).cast("decimal(38,6)")).over(w)
          .cast("double"))
      .withColumn("cusum", round(col("__s") -
        least(min(col("__s")).over(w), lit(0.0)), 6))
      .select(col(keyCol), col("day"), col("day_mean"), col("cusum"),
        (col("cusum") > lit(hSigmas) * col("__sd")).as("alarm"))
  }

  /** Exponentially-weighted moving average of a per-key daily metric:
    * EWMA_t = α·x_t + (1−α)·EWMA_{t−1}, seeded EWMA_1 = x_1 — the
    * smoothing companion to [[cusumDrift]]'s alarm.
    *
    * Like CUSUM, the recurrence is non-associative; the distributed form
    * uses the geometric prefix identity: with r = 1−α and u_j = x_j·r^−j,
    * EWMA_t = r^t · (u_1 + α·Σ_{j=2..t} u_j) — running sums over one
    * key-partitioned sort, no sequential scan. The r^−j terms grow
    * geometrically, so this form is for BOUNDED window lengths (r^−t
    * must fit a double: t ≲ 300 days at α = 0.2 — document-dated daily
    * series, not tick data; for unbounded series, chunk by month and
    * carry the boundary EWMA). Deviation terms accumulate as exact
    * decimals scaled at 12 dp ⇒ partitioning-invariant. */
  def ewma(events: DataFrame, keyCol: String, tsCol: String,
      valCol: String, alpha: Double): DataFrame = {
    import graft.engine.Aggregates.sumExact6
    val r = 1.0 - alpha
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(round(sumExact6(col(valCol)) / count(lit(1)), 6).as("x"))
    val w = Window.partitionBy(keyCol).orderBy(col("day"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("__t", row_number().over(w))
      .withColumn("__u", col("x") * pow(lit(r), -col("__t")))
      .withColumn("__su",
        sum(when(col("__t") > 1, col("__u") * alpha).otherwise(col("__u"))
          .cast("decimal(38,12)")).over(wRun).cast("double"))
      .select(col(keyCol), col("day"), col("x"),
        round(pow(lit(r), col("__t")) * col("__su"), 6).as("ewma"))
  }

  /** Sample autocorrelation function (ACF) of a per-key daily metric at
    * lags 1..`maxLag` — the standard serial-dependence diagnostic (the
    * statsmodels/Box–Jenkins form: deviations from the SERIES mean and a
    * common variance denominator, not per-lag Pearson), feeding
    * seasonality detection and ARIMA order picking over telemetry.
    *
    * Scale shape: the daily roll-up is one hash-agg; all `maxLag` lag
    * columns ride ONE key-partitioned sort (one WindowExec), and the
    * numerators/denominator collapse in ONE hash-agg (2·maxLag+1
    * aggregate columns) — the per-(key,lag) unpivot then runs on the
    * |keys|-row frame, never on the series. Deviations are computed IN
    * DECIMAL (x and mu live on the 6 dp grid, so the subtraction and
    * the 12 dp products are exact — a double product rounds its last
    * decimal digit differently across engines) and the final acf is a
    * single IEEE division of two exact-decimal casts ⇒
    * partitioning-invariant, bit-identical cross-engine. */
  def acf(events: DataFrame, keyCol: String, tsCol: String,
      valCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    import graft.engine.Aggregates.sumExact6
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(round(sumExact6(col(valCol)) / count(lit(1)), 6).as("x"))
    val base = daily.groupBy(keyCol)
      .agg(round(sumExact6(col("x")) / count(lit(1)), 6).as("__mu"))
    val w = Window.partitionBy(keyCol).orderBy(col("day"))
    val lagged = daily.join(broadcast(base), Seq(keyCol))
      .withColumn("__d",
        col("x").cast("decimal(12,6)") - col("__mu").cast("decimal(12,6)"))
      .select(col(keyCol) +: col("__d") +:
        (1 to maxLag).map(k => lag(col("__d"), k).over(w).as(s"__l$k")): _*)
    val aggs =
      sum((col("__d") * col("__d")).cast("decimal(38,12)")).as("__den") +:
      (1 to maxLag).flatMap { k => Seq(
        sum((col("__d") * col(s"__l$k")).cast("decimal(38,12)"))
          .as(s"__n$k"),
        count(col(s"__l$k")).as(s"__c$k")) }
    val sums = lagged.groupBy(keyCol).agg(aggs.head, aggs.tail: _*)
    val stackExpr = (1 to maxLag).map(k => s"$k, __n$k, __c$k")
      .mkString(s"stack($maxLag, ", ", ", ") as (lag, __num, n_pairs)")
    sums.select(col(keyCol), col("__den"), expr(stackExpr))
      .select(col(keyCol), col("lag").cast("int").as("lag"), col("n_pairs"),
        (col("__num").cast("double") / col("__den").cast("double"))
          .as("acf"))
  }

  /** Kaplan–Meier survival curves per cohort: time-to-first-`eventType`
    * (in days from each user's first event), right-censored at the
    * user's last observed event, grouped by the user's acquisition
    * channel (deterministic first event type). Returns one row per
    * (cohort, day) with the at-risk count, deaths, censorings, and the
    * product-limit survival estimate S(t) = Π_{t_i ≤ t} (1 − d_i/n_i) —
    * the standard censoring-correct estimator (a naive "fraction
    * converted by day t" is biased when observation windows differ).
    *
    * Scale shape: one user-key hash-agg produces (duration, observed,
    * cohort) per user; the per-(cohort, day) roll-up is
    * |cohorts|·|days|-bounded; the risk-set and survival windows
    * partition on the cohort (no global single-partition window).
    * Deaths-before-censorings at equal t is the textbook convention:
    * the risk set counts everyone with T ≥ t, via the strictly-before
    * cumulative frame. S(t) is exp∘Σln over IEEE divisions of exact
    * longs, rounded at 9 dp (the q128/q111 libm-parity precedent). */
  def kaplanMeier(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, eventType: String): DataFrame = {
    val per = events.groupBy(userCol).agg(
      min(struct(col(tsCol), col(idCol), col(typeCol))).getField(typeCol)
        .as("cohort"),
      min(to_date(col(tsCol))).as("__d0"),
      min(when(col(typeCol) === eventType, to_date(col(tsCol))))
        .as("__de"),
      max(to_date(col(tsCol))).as("__dl"))
    val byT = per.select(col("cohort"),
        when(col("__de").isNotNull, datediff(col("__de"), col("__d0")))
          .otherwise(datediff(col("__dl"), col("__d0"))).as("t"),
        col("__de").isNotNull.as("__ev"))
      .groupBy("cohort", "t").agg(
        sum(when(col("__ev"), 1L).otherwise(0L)).as("d"),
        sum(when(col("__ev"), 0L).otherwise(1L)).as("c"))
    val wAll = Window.partitionBy("cohort")
    val wBefore = Window.partitionBy("cohort").orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy("cohort").orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT
      .withColumn("n_risk", sum(col("d") + col("c")).over(wAll) -
        coalesce(sum(col("d") + col("c")).over(wBefore), lit(0L)))
      // the all-deaths terminal row needs an explicit zero branch:
      // Spark log(0) is NULL while DuckDB ln(0) is -inf — a silent
      // cross-engine divergence if left to the libm path
      .withColumn("survival",
        when(min(col("n_risk") - col("d")).over(wRun) === 0, lit(0.0))
          .otherwise(round(exp(sum(
            log((col("n_risk") - col("d")).cast("double") /
              col("n_risk").cast("double"))).over(wRun)), 9)))
      .select(col("cohort"), col("t"), col("n_risk"), col("d"), col("c"),
        col("survival"))
  }

  /** Slowly-changing-dimension type-2 history build: collapse a per-key
    * change stream to change-only version rows with effective-interval
    * bounds — (key, version, attr, valid_from, valid_to, is_current),
    * where a new version opens only when `attrCol` actually changes
    * (consecutive equal values collapse into the earlier row's interval)
    * and the current version has an open (null) `valid_to`. The classic
    * warehouse dimension-load shape.
    *
    * Scale shape: one shuffle on `keyCol` serves all three windows (the
    * change-detect lag, the version row_number, and the interval lead
    * share partitioning and (ts, id) sort — `.explain` shows one
    * Exchange). Ties on the timestamp break by `idCol`, so versioning is
    * deterministic under replay and re-partitioning. Per-key state never
    * materializes beyond the window sort — no per-key collect. */
  def scd2(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      attrCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    val changes = df
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(attrCol))
    changes
      .withColumn("version", row_number().over(w))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(col(keyCol), col("version"), col(attrCol),
        col("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Per-key calendar coverage audit: active-day count, span, number
    * of gaps and the longest gap — the "is this feed actually
    * arriving" check run before any time-series op downstream trusts
    * the daily grid (a silent 3-day ingestion hole corrupts every
    * rolling statistic computed over it). No calendar explode: gaps
    * fall out of a lag diff over the DISTINCT (key, day) frame, which
    * is calendar-bounded regardless of corpus size — the raw events
    * are touched once, in the distinct. */
  def coverageGaps(events: DataFrame, keyCol: String, tsCol: String)
      : DataFrame = {
    val days = events.select(col(keyCol).as("key"),
        to_date(col(tsCol).cast("timestamp")).as("day"))
      .distinct()
    val w = Window.partitionBy("key").orderBy("day")
    days.withColumn("gap",
        datediff(col("day"), lag(col("day"), 1).over(w)) - 1)
      .groupBy(col("key").as(keyCol))
      .agg(count(lit(1)).as("n_active_days"),
        (datediff(max(col("day")), min(col("day"))) + 1)
          .as("span_days"),
        sum(when(col("gap") > 0, 1).otherwise(0)).as("n_gaps"),
        coalesce(max(when(col("gap") > 0, col("gap"))), lit(0))
          .as("max_gap_days"))
      .orderBy(keyCol)
  }

  /** Population Stability Index per key between the first and second
    * half of the observed time span — the model-monitoring standard
    * for "has this score's distribution moved": bin the CURRENT window
    * by the REFERENCE window's decile edges, then
    * PSI = Σ_b (p_b − q_b)·ln(p_b / q_b). Rule of thumb: <0.1 stable,
    * 0.1–0.25 drifting, >0.25 shifted. The numeric-score complement of
    * [[graft.ext.TextOps.sourceDrift]]'s token-KL and [[cusumDrift]]'s
    * mean-shift detector.
    *
    * Scale shape: one global min/max row fixes the split point
    * ((mn+mx)/2 in long micros — exact in double while mn+mx < 2⁵³,
    * true for any epoch); reference decile edges come from the
    * memory-bounded [[graft.engine.Aggregates.exactPercentiles]]
    * (count-agg + rank window over DISTINCT values, never a buffered
    * group); edges broadcast back so binning is map-side; then one
    * (key, bin) hash-agg and a |keys|·bins-row finish. Laplace-style
    * smoothing (+0.5 per bin) keeps empty bins finite and is mirrored
    * by the oracle. 12-dp term round before the exact decimal sum
    * makes the result add-order free; keys absent from the reference
    * window have no edges and are dropped (PSI needs a reference). */
  def psiDrift(events: DataFrame, keyCol: String, tsCol: String,
      valCol: String, bins: Int = 10): DataFrame = {
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val span = events.agg(min(us).as("__mn"), max(us).as("__mx"))
    val tagged = events
      .filter(col(valCol).isNotNull)
      .select(col(keyCol).as("key"), col(valCol).cast("double").as("v"),
        us.as("__us"))
      .crossJoin(broadcast(span))
      .withColumn("is_ref",
        col("__us") < ((col("__mn") + col("__mx")) / 2).cast("long"))
      .select("key", "v", "is_ref")
    val edges = graft.engine.Aggregates.exactPercentiles(
      tagged.filter(col("is_ref")), "key", "v",
      (1 until bins).map(_ / bins.toDouble))
    val binExpr = (0 until bins - 1)
      .map(k => when(col("v") > col(s"p$k"), 1).otherwise(0))
      .reduce(_ + _)
    val counts = tagged.join(broadcast(edges), Seq("key"))
      .withColumn("b", binExpr)
      .groupBy("key", "b")
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("nr"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("nc"))
    val grid = edges.select(col("key"),
      explode(sequence(lit(0), lit(bins - 1))).as("b"))
    val full = grid.join(counts, Seq("key", "b"), "left")
      .na.fill(0L, Seq("nr", "nc"))
    val tot = full.groupBy("key")
      .agg(sum("nr").as("tnr"), sum("nc").as("tnc"))
    val sm = lit(0.5) * bins
    full.join(tot, Seq("key"))
      .withColumn("p", (col("nr") + 0.5) / (col("tnr") + sm))
      .withColumn("q", (col("nc") + 0.5) / (col("tnc") + sm))
      .withColumn("t", round((col("p") - col("q")) *
        log(col("p") / col("q")), 12).cast("decimal(38,12)"))
      .groupBy(col("key").as(keyCol))
      .agg(max(col("tnr")).as("n_ref"), max(col("tnc")).as("n_cur"),
        round(sum(col("t")).cast("double"), 6).as("psi"))
      .orderBy(keyCol)
  }
}
