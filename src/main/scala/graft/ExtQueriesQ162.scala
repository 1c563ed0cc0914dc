package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine._
import graft.engine.Aggregates._
import graft.ext._

/** [[ExtQueries]] query definitions q162-q221 — split out of the
  * monolith (round-12 verdict item 6), zero behavior change;
  * the registry stays in [[ExtQueries]].
  */
private[graft] trait ExtQueriesQ162 extends ExtQueriesShared {
  /** q162 — rolling 7-day active users: each (user, active-day) pair
    * CONTRIBUTES to the 7 window-end days it falls in (a bounded ×7
    * explode), then one distinct-count per window day — the standard
    * exact rolling-distinct shape (the alternative is 7 self-joins or a
    * 7-day window over per-day user SETS; both blow up at scale while
    * the explode stays linear ×window). Tail windows beyond the last
    * observed day are clipped against a broadcast max-day scalar. */
  private[graft] val q162: Q = (s, d) => {
    val ud = Tables.events(s, d)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val mx = ud.agg(max(col("day")).as("mx"))
    ud.select(explode(sequence(col("day"), date_add(col("day"), 6)))
        .as("day7"), col("user_id"))
      .crossJoin(broadcast(mx))
      .filter(col("day7") <= col("mx"))
      .groupBy("day7")
      .agg(countDistinct(col("user_id")).as("mau7"))
      .orderBy("day7")
  }

  /** q163 — conversion-lag percentiles: per converting user, the lag
    * from first click to first subsequent purchase; p25/p50/p90 via the
    * memory-bounded exact-percentile machinery
    * ([[Aggregates.exactPercentiles]]). */
  private[graft] val q163: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val firstClick = ev.filter(col("event_type") === "click")
      .groupBy("user_id").agg(min(col("ts")).as("c_ts"))
    val firstBuy = ev.filter(col("event_type") === "purchase")
      .join(broadcast(firstClick), Seq("user_id"))
      .filter(col("ts") >= col("c_ts"))
      .groupBy("user_id", "c_ts").agg(min(col("ts")).as("p_ts"))
    val lags = firstBuy.select(lit("all").as("g"),
      ((unix_micros(col("p_ts").cast("timestamp")) -
        unix_micros(col("c_ts").cast("timestamp"))) / 1000000L)
        .cast("double").as("lag_s"))
    exactPercentiles(lags, "g", "lag_s", Seq(0.25, 0.5, 0.9))
      .select(round(col("p0"), 6).as("p25"),
        round(col("p1"), 6).as("p50"), round(col("p2"), 6).as("p90"))
  }

  /** q164 — EWMA smoothing ([[EventOps.ewma]]): daily mean value per
    * event_type smoothed at α = 0.2 via the geometric prefix identity. */
  private[graft] val q164: Q = (s, d) =>
    EventOps.ewma(Tables.events(s, d), "event_type", "ts", "value",
        alpha = 0.2)
      .orderBy("event_type", "day")

  /** q165 — 2-core of the near-dup graph ([[GraphOps.kcorePeel]], 4
    * rounds over the shared pair scratch): the dense-template families
    * that survive peeling, with their core degrees. */
  private[graft] val q165: Q = (s, d) =>
    GraphOps.kcorePeel(sharedPairs(s, d), "id_a", "id_b", k = 2,
        rounds = 4)
      .orderBy("id")

  /** q166 — Neyman-allocation stratified sample: per-stratum budget
    * ∝ N_h·σ_h (optimal allocation for estimating the mean under a
    * fixed total budget — high-variance strata get more draws), floor
    * allocation with a 1-row floor, then the q89 deterministic
    * hash-rank draw inside each stratum. Fully oracle-checkable: the
    * allocation is closed-form over exact stats and the draw is
    * poly-hash ranked, no RNG state anywhere. */
  private[graft] val q166: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
    val st = ev.groupBy("event_type")
      .agg(count(lit(1)).cast("double").as("nh"),
        stddevExact(col("value")).as("sd"))
    val tot = st.agg(
      sum((col("nh") * col("sd")).cast("decimal(38,6)"))
        .cast("double").as("t"))
    val alloc = st.crossJoin(broadcast(tot))
      .select(col("event_type"),
        greatest(lit(1.0),
          floor(lit(500) * (col("nh") * col("sd")) / col("t")))
          .cast("long").as("alloc"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("__h"), col("event_id"))
    ev.withColumn("__h",
        TextOps.scrambledHash(col("event_id").cast("string")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .join(broadcast(alloc), "event_type")
      .filter(col("rank") <= col("alloc"))
      .select(col("event_id"), col("event_type"), col("rank"),
        col("alloc"))
      .orderBy("event_type", "rank")
  }

  /** q167 — lead–lag cross-correlation: corr(clicks(t),
    * purchases(t+lag)) for lags 0–3 days — "does click volume lead
    * purchase volume, and by how much" (the time-series causality
    * screen). A ×4 lag explode on the |days|-row daily frame, one
    * day-keyed join, per-lag [[Aggregates.corrExact]]. */
  private[graft] val q167: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val c = daily.filter(col("event_type") === "click")
      .select(col("day"), col("n").as("x"))
    val p = daily.filter(col("event_type") === "purchase")
      .select(col("day").as("pday"), col("n").as("y"))
    c.withColumn("lag", explode(array((0 to 3).map(lit): _*)))
      .withColumn("pday", date_add(col("day"), col("lag")))
      .join(p, "pday")
      .groupBy("lag")
      .agg(count(lit(1)).as("n_days"),
        round(corrExact(col("x"), col("y")), 6).as("xcorr"))
      .orderBy("lag")
  }

  /** q168 — per-source dedup report: document counts, exact-duplicate
    * share (texts collapsing under [[Dedup.exactDedup]] semantics), and
    * near-dup cluster membership share (shared scratch clusters) — the
    * one-page curation summary a source-quality review starts from. */
  private[graft] val q168: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val csz = sharedClusters(s, d).groupBy("cluster")
      .agg(count(lit(1)).as("csz"))
    val clustered = sharedClusters(s, d)
      .join(broadcast(csz.filter(col("csz") >= 2).select("cluster")),
        "cluster")
      .select(col("doc_id")).withColumn("__nd", lit(1L))
    val w = Window.partitionBy("text").orderBy("doc_id")
    docs.withColumn("__rn", row_number().over(w))
      .join(clustered, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__rn") > 1, 1L).otherwise(0L))
          .as("n_exact_dropped"),
        sum(coalesce(col("__nd"), lit(0L)))
          .as("n_in_neardup_cluster"))
      .orderBy("source")
  }

  /** q169 — Benford first-digit forensics: observed first-significant-
    * digit distribution of order totals vs Benford's log10(1+1/d)
    * expectation, with the χ² fit statistic — the synthetic-data /
    * tampering screen. One scan-stage digit projection + a 9-key agg. */
  private[graft] val q169: Q = (s, d) => {
    val x = col("o_totalprice")
    val counts = Tables.orders(s, d)
      .select(floor(x / pow(lit(10.0), floor(log10(x))))
        .cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).cast("double").as("nn"))
    val scored = counts.crossJoin(broadcast(tot))
      .withColumn("p", log10(lit(1.0) + lit(1.0) / col("digit")))
    val chi2 = scored.agg(round(
      sum((((col("n") - col("nn") * col("p")) *
            (col("n") - col("nn") * col("p"))) /
          (col("nn") * col("p"))).cast("decimal(38,12)"))
        .cast("double"), 6).as("chi2"))
    scored.crossJoin(broadcast(chi2))
      .select(col("digit"), col("n"),
        round(col("n") / col("nn"), 6).as("share"),
        round(col("p"), 6).as("benford_p"), col("chi2"))
      .orderBy("digit")
  }

  /** q170 — calendar gap-fill with linear interpolation: the daily mean
    * series per event_type with every 5th/10th/…-of-month day knocked
    * out, reconstructed over the full per-type calendar — missing days
    * interpolate between the IGNORE-NULLS last/first neighbors
    * (endpoints clamp). The feature-pipeline regularization step before
    * any fixed-stride model input. */
  private[graft] val q170: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(round(sumExact6(col("value")) / count(lit(1)), 6).as("v"))
      .filter(dayofmonth(col("day")) % 5 =!= 0) // make gaps to fill
    val cal = daily.groupBy("event_type")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val wb = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    cal.join(daily, Seq("event_type", "day"), "left")
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wb))
      .withColumn("pd", last(when(col("v").isNotNull, col("day")),
        ignoreNulls = true).over(wb))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wf))
      .withColumn("nd", first(when(col("v").isNotNull, col("day")),
        ignoreNulls = true).over(wf))
      .withColumn("filled", round(
        when(col("v").isNotNull, col("v"))
          .when(col("pv").isNull, col("nv"))
          .when(col("nv").isNull, col("pv"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            datediff(col("day"), col("pd")).cast("double") /
            datediff(col("nd"), col("pd")).cast("double")), 6))
      .select(col("event_type"), col("day"),
        col("v").isNull.as("was_gap"), col("filled"))
      .orderBy("event_type", "day")
  }

  /** q171 — weighted quantiles ([[Aggregates.weightedQuantiles]]):
    * quantity-weighted price quartiles/p90 per return flag. */
  private[graft] val q171: Q = (s, d) =>
    weightedQuantiles(Tables.lineitem(s, d), "l_returnflag",
        "l_extendedprice", "l_quantity", Seq(0.25, 0.5, 0.9))
      .select(col("l_returnflag"), col("wq0").as("wp25"),
        col("wq1").as("wp50"), col("wq2").as("wp90"))
      .orderBy("l_returnflag")

  /** q172 — cross-source near-dup flow: near-dup pairs (shared scratch)
    * whose endpoints live in DIFFERENT sources, counted per unordered
    * source pair — "which feeds are re-publishing each other" (q109
    * counts identity overlap; this counts similarity flow). */
  private[graft] val q172: Q = (s, d) => {
    val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
    sharedPairs(s, d)
      .join(src.select(col("doc_id").as("id_a"),
        col("source").as("src_a")), "id_a")
      .join(src.select(col("doc_id").as("id_b"),
        col("source").as("src_b")), "id_b")
      .filter(col("src_a") =!= col("src_b"))
      .select(least(col("src_a"), col("src_b")).as("source_x"),
        greatest(col("src_a"), col("src_b")).as("source_y"))
      .groupBy("source_x", "source_y").agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("n_pairs").desc, col("source_x"), col("source_y"))
  }

  /** q173 — Welch's t ([[Aggregates.welchT]]): finished-vs-open order
    * value comparison per priority band — is the F slice priced
    * differently, and with what confidence (t, Welch–Satterthwaite df).
    * One shared scan; six numbers per group cross the shuffle. */
  private[graft] val q173: Q = (s, d) =>
    welchT(Tables.orders(s, d), "o_orderpriority", "o_totalprice",
        col("o_orderstatus") === "F")
      .orderBy("o_orderpriority")

  /** q174 — Mann–Whitney U ([[Aggregates.mannWhitneyU]]): rank-sum test
    * on the tie-heavy quantity column (integer-valued ⇒ the tie
    * correction actually engages), even-vs-odd orderkey split per
    * return flag — a null-effect fixture, so z should hover near 0. */
  private[graft] val q174: Q = (s, d) =>
    mannWhitneyU(Tables.lineitem(s, d), "l_returnflag", "l_quantity",
        col("l_orderkey") % 2 === 0)
      .orderBy("l_returnflag")

  /** q175 — Spearman rank correlation ([[Aggregates.spearman]]):
    * monotone association of quantity and price per return flag — the
    * rank-based counterpart of q25's Pearson on the same columns. */
  private[graft] val q175: Q = (s, d) =>
    spearman(Tables.lineitem(s, d), "l_returnflag", "l_quantity",
        "l_extendedprice")
      .orderBy("l_returnflag")

  /** q176 — two-sample KS ([[Aggregates.ksTwoSample]]): max ECDF gap
    * between finished and open order values per priority band — the
    * same comparison as q173's Welch t, but sensitive to any
    * distributional difference, not just the mean. */
  private[graft] val q176: Q = (s, d) =>
    ksTwoSample(Tables.orders(s, d), "o_orderpriority", "o_totalprice",
        col("o_orderstatus") === "F")
      .orderBy("o_orderpriority")

  /** q177 — Gini concentration ([[Aggregates.gini]]): how unequal are
    * order values within each priority band — the inequality audit
    * (budget-skew) counterpart of q118's frequency skew profile. */
  private[graft] val q177: Q = (s, d) =>
    gini(Tables.orders(s, d), "o_orderpriority", "o_totalprice",
        "o_orderkey")
      .orderBy("o_orderpriority")

  /** q178 — daily-series autocorrelation ([[EventOps.acf]]): lag-1..7
    * ACF of each event type's daily mean value — the serial-dependence
    * diagnostic feeding seasonality detection and ARIMA order picking
    * (the self-correlation counterpart of q167's lead-lag CROSS
    * correlation between two series). */
  private[graft] val q178: Q = (s, d) =>
    EventOps.acf(Tables.events(s, d), "event_type", "ts", "value", 7)
      .orderBy("event_type", "lag")

  /** q179 — Kaplan–Meier survival ([[EventOps.kaplanMeier]]):
    * time-to-first-purchase in days per acquisition cohort (the user's
    * deterministic first event type), right-censored at last observed
    * activity — the censoring-correct conversion curve a naive
    * "converted by day t" fraction gets wrong. */
  private[graft] val q179: Q = (s, d) =>
    EventOps.kaplanMeier(Tables.events(s, d), "user_id", "ts",
        "event_id", "event_type", "purchase")
      .orderBy("cohort", "t")

  /** q180 — greedy keep-first dedup CASCADE attrition report
    * ([[Dedup.cascadeSurvival]]): per source, documents surviving each
    * stage of exact-normalized → identical-SimHash → MinHash-band
    * elimination — the funnel metric a curation pipeline publishes with
    * every corpus release (how much did each stage remove, per source).
    * Cheap stages run first so expensive ones see a shrunken corpus. */
  private[graft] val q180: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val flags = Dedup.cascadeSurvival(docs, "doc_id", "text",
      k = 3, numHashes = 12, rowsPerBand = 3)
    docs.select(col("doc_id"), col("source"))
      .join(flags, col("doc_id") === flags("id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep_exact"), 1L).otherwise(0L)).as("n_exact"),
        sum(when(col("keep_simhash"), 1L).otherwise(0L)).as("n_simhash"),
        sum(when(col("keep_minhash"), 1L).otherwise(0L)).as("n_minhash"))
      .orderBy("source")
  }

  /** q181 — leakage-safe near-dup-aware split: every document of a
    * near-dup CLUSTER (shared scratch) lands in the SAME train/val/test
    * split, because the split hash is taken on the cluster id, not the
    * doc id — the property that keeps eval examples from leaking into
    * train via their near-duplicates (a doc-hash split puts ~2% of each
    * near-dup pair's members in different splits). Reports per
    * (split, source) doc and cluster counts. */
  private[graft] val q181: Q = (s, d) => {
    val byCluster = PipelineOps.hashSplit(sharedClusters(s, d), "cluster")
    Tables.documents(s, d).select(col("doc_id"), col("source"))
      .join(byCluster, "doc_id")
      .groupBy("split", "source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("cluster")).as("n_clusters"))
      .orderBy("split", "source")
  }

  /** q182 — quota eval sampling ([[PipelineOps.quotaSample]]): per
    * language, the first max(10, ⌊2%·n⌋) docs in deterministic hash
    * order — minimum-coverage floors for tail languages. */
  private[graft] val q182: Q = (s, d) =>
    PipelineOps.quotaSample(Tables.documents(s, d), "lang", "doc_id",
        frac = 0.02, minPerGroup = 10)
      .orderBy("lang", "rk")

  /** q183 — RFM segmentation: customers scored 1–3 on Recency (last
    * order), Frequency (order count), Monetary (exact-decimal revenue) by
    * tertile cuts from the memory-bounded
    * [[graft.engine.Aggregates.exactPercentiles]], then counted per
    * (r,f,m) cell — the classic marketing segmentation grid (the
    * two-pass stats-then-broadcast shape of q99; nothing buffers a value
    * multiset, nothing sorts the corpus). All three tertile grids come
    * from ONE percentile build: the customer frame is checkpointed once
    * (orders are aggregated once, not once per metric) and melted to
    * (metric, value) rows, so a single metric-keyed CDF replaces three
    * separate fact-rescanning builds — same interpolation arithmetic
    * per metric group, so every cut point (and every hash) is
    * unchanged. */
  private[graft] val q183: Q = (s, d) => {
    val cust = Tables.orders(s, d).groupBy("o_custkey")
      .agg(max(col("o_orderdate")).as("last_ts"),
        count(lit(1)).as("freq"),
        sum(col("o_totalprice").cast("decimal(38,6)")).cast("double")
          .as("money"))
      .withColumn("rec", col("last_ts").cast("timestamp").cast("double"))
      .localCheckpoint(eager = false) // percentile build + scoring pass
    val melted = cust.select(explode(array(
        struct(lit("rec").as("metric"), col("rec").as("__m")),
        struct(lit("freq").as("metric"), col("freq").cast("double")
          .as("__m")),
        struct(lit("money").as("metric"), col("money").as("__m"))))
        .as("e"))
      .select(col("e.metric"), col("e.__m"))
    val grid = Aggregates.exactPercentiles(melted, "metric", "__m",
      Seq(1.0 / 3, 2.0 / 3))
    def cut(m: String, pcol: String) =
      max(when(col("metric") === m, col(pcol)))
    val p = grid.groupBy().agg(
      cut("rec", "p0").as("r33"), cut("rec", "p1").as("r66"),
      cut("freq", "p0").as("f33"), cut("freq", "p1").as("f66"),
      cut("money", "p0").as("m33"), cut("money", "p1").as("m66"))
    def score(v: Column, lo: Column, hi: Column): Column =
      when(v <= lo, 1).when(v <= hi, 2).otherwise(3)
    cust.crossJoin(broadcast(p))
      .select(score(col("rec"), col("r33"), col("r66")).as("r_score"),
        score(col("freq").cast("double"), col("f33"), col("f66"))
          .as("f_score"),
        score(col("money"), col("m33"), col("m66")).as("m_score"))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("r_score", "f_score", "m_score")
  }

  /** q184 — rolling z-score anomaly days: each event type's daily mean
    * value vs its OWN trailing 8-day window (7 preceding through 1
    * preceding — the current day never smooths itself), flagging
    * |z| > 1.5 with ≥ 4 trailing days. Mean/variance come from exact
    * DECIMAL window sums so the statistic is identical across engines
    * and partitionings (the q99 z-score contract, windowed); one
    * key-partitioned sort carries count and both moment sums. */
  private[graft] val q184: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"),
        to_date(col("ts").cast("timestamp")).as("day"))
      .agg(sum(col("value").cast("decimal(38,6)")).as("s6"),
        count(lit(1)).as("n"))
      .withColumn("m", col("s6").cast("double") / col("n"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-7, -1)
    daily
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("s1", sum(col("m").cast("decimal(38,12)")).over(w))
      .withColumn("s2",
        sum((col("m") * col("m")).cast("decimal(38,12)")).over(w))
      .filter(col("cnt") >= 4)
      .withColumn("mu", col("s1").cast("double") / col("cnt"))
      .withColumn("vr",
        col("s2").cast("double") / col("cnt") - col("mu") * col("mu"))
      .filter(col("vr") > 0)
      .withColumn("z", (col("m") - col("mu")) / sqrt(col("vr")))
      .filter(abs(col("z")) > 1.5)
      .select(col("event_type"), col("day"), round(col("z"), 6).as("z"))
      .orderBy("event_type", "day")
  }

  /** q185 — last-touch revenue attribution: each purchase's value is
    * credited to the channel (props.k mod 5) of the user's most recent
    * preceding click — the custom AS-OF JOIN operator
    * ([[graft.plans.AsOf]], q50/q158's point-in-time machinery) applied
    * to the marketing-attribution shape; purchases with no prior click
    * fall into channel −1 (unattributed). Clicks are deduplicated per
    * (user, ts) with a deterministic max before the as-of probe. */
  private[graft] val q185: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id").as("c_user"), col("ts").as("click_ts"))
      .agg(max(get_json_object(col("props"), "$.k").cast("long") % 5)
        .as("channel"))
    graft.plans.AsOf.join(purchases, clicks,
        ("user_id", "c_user"), ("ts", "click_ts"))
      .groupBy(coalesce(col("channel"), lit(-1L)).as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("value").cast("decimal(38,6)")).cast("double")
          .as("revenue"))
      .orderBy("channel")
  }

  /** q186 — Poisson-bootstrap CI ([[graft.engine.Aggregates.bootstrapCI]]):
    * 95% confidence interval on mean order value per status from 50
    * deterministic hash-seeded Poisson(1) replicate weightings — the
    * resample-free bootstrap that works at 100 TB because the ×B
    * replicate stream collapses inside partial aggregation and never
    * crosses an exchange. */
  private[graft] val q186: Q = (s, d) =>
    Aggregates.bootstrapCI(Tables.orders(s, d), "o_orderstatus",
        "o_totalprice", "o_orderkey", reps = 50, alpha = 0.05)
      .orderBy("o_orderstatus")

  /** q187 — order-2 session paths ([[EventOps.sessionTrigrams]]): the
    * top-20 event-type TRIGRAMS across per-user time-ordered streams
    * with the order-2 conditional p(e₃ | e₁,e₂) — the sequence-mining
    * extension of q135's order-1 transition matrix (funnel discovery:
    * which two-step contexts determine the next action). Top-20 via
    * TakeOrdered, ties broken on the path for determinism. */
  private[graft] val q187: Q = (s, d) =>
    EventOps.sessionTrigrams(Tables.events(s, d),
        "user_id", "event_type", "ts", "event_id")
      .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
      .limit(20)

  /** q188 — personalized PageRank ([[GraphOps.personalizedPageRank]])
    * over the shared near-dup pair graph, teleporting to the seed set
    * {doc_id ≡ 0 (mod 4)} ∩ subgraph — "documents most connected to
    * THESE documents" (seed-anchored graph retrieval), vs q125's global
    * centrality. 5 iterations, recursive-CTE oracle under the same
    * 12/9-dp decimal determinism contract. */
  private[graft] val q188: Q = (s, d) => {
    val pairs = sharedPairs(s, d)
    val seeds = pairs.select(col("id_a").as("id"))
      .union(pairs.select(col("id_b").as("id")))
      .filter(col("id") % 4 === 0).distinct()
    GraphOps.personalizedPageRank(pairs, seeds, iterations = 5)
      .select(col("id").as("doc_id"), col("rank"))
      .orderBy("doc_id")
  }

  /** q189 — day-of-week seasonal indices ([[EventOps.seasonalIndex]]):
    * per event_type the dow observation counts, exact means, and the
    * multiplicative seasonal index dow_mean/type_mean. */
  private[graft] val q189: Q = (s, d) =>
    EventOps.seasonalIndex(Tables.events(s, d), "event_type", "ts",
        "value")
      .orderBy("event_type", "dow")

  /** q190 — Dunning LLR collocations ([[TextOps.llrCollocations]]):
    * top-20 adjacent-bigram collocations by log-likelihood ratio
    * (evidence-weighted association — the principled complement to
    * q143's PMI, which over-rewards rare pairs). */
  private[graft] val q190: Q = (s, d) =>
    TextOps.llrCollocations(Tables.documents(s, d), "text",
      minCo = 5, topK = 20)

  /** q191 — blocking-quality audit ([[Dedup.blockingQuality]]): q32's
    * production banding scheme (12 hashes × 3 rows/band) measured
    * against the shared df-capped exact-Jaccard ground truth — pairs
    * completeness (blocker recall) and reduction ratio (fraction of the
    * all-pairs quadratic never generated), the two record-linkage axes
    * you check BEFORE a 100 TB dedup pass. Shared-scratch consumer
    * (reads sharedPairs). */
  private[graft] val q191: Q = (s, d) =>
    Dedup.blockingQuality(Tables.documents(s, d), "doc_id", "text",
      sharedPairs(s, d), k = 3, numHashes = 12, rowsPerBand = 3)

  /** q192 — greedy k-center coreset ([[SimSearch.kCenterCoreset]]):
    * 5 maximally-diverse exemplar embeddings by farthest-point
    * selection, with the selection-time min-distance (the cover-radius
    * curve). Unrolled-CTE oracle under the 9-dp determinism contract. */
  private[graft] val q192: Q = (s, d) =>
    SimSearch.kCenterCoreset(Tables.embeddings(s, d), "vec_id",
        "embedding", k = 5)
      .orderBy("sel")

  /** q193 — directed association rules
    * ([[PipelineOps.associationRules]]): brand ⇒ brand rules over order
    * baskets with support ≥ 5 and confidence ≥ 0.13 — the directed
    * complement of q151's symmetric support/lift, sharing the same
    * basket shuffle + pair hash-agg machinery (the direction split is a
    * map-side projection of the pair frame). */
  private[graft] val q193: Q = (s, d) => {
    val basket = Tables.lineitem(s, d).select("l_orderkey", "l_partkey")
      .join(Tables.part(s, d).select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
    PipelineOps.associationRules(basket, "l_orderkey", "p_brand",
        minSupport = 5, minConf = 0.13)
      .orderBy("antecedent", "consequent")
  }

  private[graft] val q194: Q = (s, d) => mutualKnnFrame(s, d)

  /** q195 — SemDeDup semantic dedup ([[SimSearch.semanticDedup]]):
    * corpus partitioned into 5 coarse cells (nearest k-center seed,
    * q192's codebook), near-dups marked within cells only at cosine ≥
    * 0.3 with smaller-id dominance — the pair count drops from n²/2 to
    * Σ|cell|²/2, which is the whole trick at 100 TB; cross-cell misses
    * are the documented recall trade. */
  private[graft] val q195: Q = (s, d) =>
    SimSearch.semanticDedup(Tables.embeddings(s, d), "vec_id",
      "embedding", kcenterCentroids(s, d, 5), threshold = 0.3)

  /** q196 — Lloyd k-means refinement ([[SimSearch.lloydRefine]]): two
    * assign→exact-decimal-mean rounds from the q192 k-center seeds —
    * the IVF codebook trainer (Gonzalez spreads, Lloyd re-centers onto
    * density). Unrolled-CTE oracle under the 9-dp/6-dp determinism
    * contract. */
  private[graft] val q196: Q = (s, d) =>
    SimSearch.lloydRefine(Tables.embeddings(s, d), "vec_id",
      "embedding", kcenterCentroids(s, d, 5), rounds = 2)

  /** q197 — functional-dependency audit ([[PipelineOps.fdAudit]]):
    * six candidate FDs across five relations — name→nationkey and
    * name→regionkey hold (keyed lookups are safe); brand→type,
    * name→brand, priority→status and source→lang violate with their
    * fan-outs quantified — the profile you read before trusting a
    * column as a bucketing/partition key. */
  private[graft] val q197: Q = (s, d) => {
    def audit(rel: String, df: DataFrame, pairs: (String, String)*) =
      PipelineOps.fdAudit(df, pairs)
        .select(lit(rel).as("rel"), col("lhs"), col("rhs"),
          col("n_groups"), col("n_violations"), col("holds"),
          col("max_distinct"))
    audit("part", Tables.part(s, d),
        ("p_brand", "p_type"), ("p_name", "p_brand"))
      .unionByName(audit("customer", Tables.customer(s, d),
        ("c_name", "c_nationkey")))
      .unionByName(audit("nation", Tables.nation(s, d),
        ("n_name", "n_regionkey")))
      .unionByName(audit("orders", Tables.orders(s, d),
        ("o_orderpriority", "o_orderstatus")))
      .unionByName(audit("documents", Tables.documents(s, d),
        ("source", "lang")))
      .orderBy("rel", "lhs", "rhs")
  }

  /** q198 — semi-supervised label propagation
    * ([[GraphOps.labelPropagation]]): the 20 % of embeddings with
    * vec_id % 5 = 0 seed their class label; two synchronous weighted-
    * majority rounds spread labels over the mutual-kNN graph (q194's
    * edges) — "hand-label 1 %, extend over the similarity structure
    * dedup already built". Unlabeled output rows are nodes the graph
    * never reached. */
  private[graft] val q198: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    GraphOps.labelPropagation(
      emb.select(col("vec_id").as("id")),
      mutualKnnFrame(s, d),
      emb.filter(col("vec_id") % 5 === 0)
        .select(col("vec_id").as("id"), col("label").as("seed_label")),
      rounds = 2)
  }

  /** q199 — Heaps'-law vocabulary growth ([[TextOps.vocabGrowth]]):
    * K·n^β fit of type-vs-token growth over the documents corpus in
    * doc-id order — the per-batch corpus-health scalar (templated data
    * flattens β). Cumulative walk via the range-partitioned prefix
    * scan, regression via mergeable sufficient stats. */
  private[graft] val q199: Q = (s, d) =>
    TextOps.vocabGrowth(Tables.documents(s, d), "doc_id", "text")

  /** q200 — B³ cluster-quality audit ([[Dedup.bcubedQuality]]): the
    * production near-dup clustering (shared scratch, q55's output)
    * scored against exact normalized-text duplicate groups — B³
    * precision quantifies how much the shingle-Jaccard cascade
    * over-merges beyond exact duplication, B³ recall how much it
    * splits true dup groups; the cluster-level complement of q191's
    * pair-level blocking audit. Shared-scratch consumer. */
  private[graft] val q200: Q = (s, d) => {
    val keyed = Tables.documents(s, d).select(col("doc_id").as("id"),
      TextOps.normalizeText(col("text")).as("__k"))
    val gids = keyed.groupBy("__k").agg(min(col("id")).as("gid"))
    val truth = keyed.join(gids, Seq("__k")).select(col("id"), col("gid"))
    Dedup.bcubedQuality(
      sharedClusters(s, d).select(col("doc_id").as("id"), col("cluster")),
      truth)
  }

  /** q201 — top principal component ([[SimSearch.pc1]]): 20-round
    * deterministic power iteration over the q147 covariance matrix —
    * loadings, dominant eigenvalue, explained-variance ratio. The
    * distributed pass is the one-scan covariance; the d×d eigensolve
    * is corpus-independent driver math (KB-scale-scalar pattern). */
  private[graft] val q201: Q = (s, d) =>
    SimSearch.pc1Frame(s, sharedCov(s, d))

  /** q202 — PC1 projection scores ([[SimSearch.project]]): every vector
    * scored along the q201 component, shuffle-free (loadings ride as an
    * array literal; the dot product is a sequential decimal fold inside
    * the scan) — the whitening / diversity-ranking primitive. */
  private[graft] val q202: Q = (s, d) => {
    val r = SimSearch.pc1(sharedCov(s, d))
    SimSearch.project(Tables.embeddings(s, d), "embedding", "vec_id",
      r.loadings).orderBy("vec_id")
  }

  /** q203 — Pareto-skyline customer frontier ([[Pareto.skyline]]):
    * undominated (spend, order count, recency) profiles via the
    * grid-pruned two-phase skyline — cell-level dominance (sound for
    * any grid) discards the interior, exact pairwise dominance runs
    * only over the frontier shell. Oracle is the naive NOT EXISTS
    * all-pairs — the engine must match it exactly. */
  private[graft] val q203: Q = (s, d) => {
    val prof = Tables.orders(s, d).groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
        .cast("double").as("spend"),
        count(lit(1)).as("n_orders"),
        max(col("o_orderdate")).as("last_order"))
      .select(col("o_custkey").as("custkey"), col("spend"),
        col("n_orders"), col("last_order"))
    Pareto.skyline(prof, Seq("custkey"),
      Seq("spend", "n_orders", "last_order")).orderBy("custkey")
  }

  /** q204 — local clustering coefficients
    * ([[GraphOps.localClustering]]) of the q194 mutual-kNN graph:
    * per-node degree / triangle count / lcc, separating tight
    * semantic cliques (lcc → 1) from hub-through-traffic. Same
    * arboricity-bounded enumeration as q148's global census; oracle
    * re-derives the triangle set by naive x<y<z edge joins (the
    * orientation changes the enumeration order, never the set). */
  private[graft] val q204: Q = (s, d) =>
    GraphOps.localClustering(
      Tables.embeddings(s, d).select(col("vec_id").as("id")), "id",
      mutualKnnFrame(s, d), "id_a", "id_b")

  /** q205 — PSI score drift ([[EventOps.psiDrift]]): per-event-type
    * Population Stability Index of `value` between the first and
    * second half of the span, binned by the reference half's exact
    * decile edges — the model-monitoring "has this distribution
    * moved" scalar (<0.1 stable, >0.25 shifted). */
  private[graft] val q205: Q = (s, d) =>
    EventOps.psiDrift(Tables.events(s, d), "event_type", "ts", "value")

  /** q206 — Cohen's κ labeler agreement ([[Aggregates.cohenKappa]]):
    * chance-corrected agreement between the q28 langid heuristic and
    * the gold lang column — "is the cheap classifier predicting the
    * label or just matching base rates". One confusion-count agg;
    * everything else re-aggregates the |classes|² frame in exact
    * longs. */
  private[graft] val q206: Q = (s, d) =>
    cohenKappa(TextOps.withLangId(Tables.documents(s, d), "text",
      "doc_id", keep = Seq("lang")), "lang", "lang_pred")

  /** q207 — deterministic contrastive negatives
    * ([[PipelineOps.negativeSample]]): 4 cross-label negatives per
    * embedding, drawn from the anchor's scrambled-hash bucket and
    * ranked by a pair hash — RNG-free triplet building; one
    * co-partitioned bucket join, never anchor × corpus. */
  private[graft] val q207: Q = (s, d) =>
    PipelineOps.negativeSample(Tables.embeddings(s, d), "vec_id",
      "label", k = 4, buckets = 8)

  /** q208 — order-invariant table digest
    * ([[graft.engine.Expectations.tableDigest]]): sum-of-row-hashes
    * checksum of the documents slice — equal bytes ⇒ equal digest
    * under any row order / partitioning / file layout; the cheap
    * rewrite-validation for incremental pipelines. */
  private[graft] val q208: Q = (s, d) =>
    Expectations.tableDigest(Tables.documents(s, d),
      Seq("doc_id", "text", "lang", "source", "n_chars"))

  /** q209 — CUBE profile with grouping_id
    * ([[Aggregates.cubeProfile]]): counts + exact char totals for
    * every (lang, source) subset in ONE Expand + hash-agg pass; gid's
    * bitmask separates genuine NULL dim values from subtotal rows. */
  private[graft] val q209: Q = (s, d) =>
    cubeProfile(Tables.documents(s, d), Seq("lang", "source"),
      "n_chars")

  /** q210 — Benford first-digit audit ([[Aggregates.benfordAudit]])
    * of order totals: observed vs log₁₀(1+1/d) with χ² — the
    * data-forensics screen for fabricated / truncated amounts. Digit
    * extraction goes through exact integer cents (never log10, never
    * double formatting). */
  private[graft] val q210: Q = (s, d) =>
    benfordAudit(Tables.orders(s, d), "o_totalprice")

  /** q211 — product-quantization codes ([[SimSearch.pqCodesWide]]):
    * every embedding compressed to 4 k-center codes (16-dim subspaces,
    * k=8) — deterministic Gonzalez codebooks, broadcast assignment;
    * the m·log₂k-bit storage layout behind PQ serving. */
  private[graft] val q211: Q = (s, d) =>
    SimSearch.pqCodesWideFrom(sharedPq(s, d)._1, "vec_id", m = 4)

  /** q212 — ADC top-10 ([[SimSearch.adcTopK]]): full-precision queries
    * against the PQ-coded corpus — per-subspace distance tables
    * broadcast, corpus scanned as codes only; 9-dp lookups summed as
    * exact decimals so ranking is add-order free. */
  private[graft] val q212: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val (codes, books) = sharedPq(s, d)
    SimSearch.adcTopKFrom(codes, books, emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", m = 4, len = 16, topK = 10)
  }

  /** q213 — IVF-PQ search ([[SimSearch.ivfAdcTopK]]): 5-cell coarse
    * k-center quantizer, queries probe their 2 nearest cells, ADC
    * ranks the cell-pruned candidates via the q211 codes — IVF cuts
    * candidates, PQ cuts bytes per candidate; the production ANN
    * serving shape, fully deterministic and oracle-replicated. */
  private[graft] val q213: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val (codes, books) = sharedPq(s, d)
    SimSearch.ivfAdcTopKFrom(emb, "vec_id", "embedding",
      emb.filter(col("vec_id") < 5), ivfK = 5, nprobe = 2,
      codes, books, m = 4, len = 16, topK = 10)
  }

  /** q214 — PQ recall audit: ADC top-10 (q212 parameters) intersected
    * with the EXACT Euclidean top-10 per query — recall measured, not
    * assumed (the q49 discipline applied to the PQ family). The exact
    * side broadcasts the 5 queries against the corpus: one scan, no
    * corpus shuffle. */
  private[graft] val q214: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") < 5)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("__d2"), col("vec_id"))
    val exact = emb.join(broadcast(
        q.select(col("vec_id").as("q_id"),
          col("embedding").as("q_emb"))),
        col("vec_id") =!= col("q_id"))
      .withColumn("__d2",
        round(SimSearch.sqDist(col("q_emb"), col("embedding")), 9))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 10)
      .select(col("q_id"), col("vec_id").as("n_id"))
    val (codes, books) = sharedPq(s, d)
    val adc = SimSearch.adcTopKFrom(codes, books, q, "vec_id",
        "embedding", m = 4, len = 16, topK = 10)
      .select(col("q_id"), col("n_id"))
    exact.join(adc, Seq("q_id", "n_id"), "left_semi")
      .groupBy("q_id").agg(count(lit(1)).as("n_overlap"))
      .join(q.select(col("vec_id").as("q_id")), Seq("q_id"), "right")
      .na.fill(0L, Seq("n_overlap"))
      .select(col("q_id"), col("n_overlap"),
        round(col("n_overlap") / 10.0, 6).as("recall_at_10"))
      .orderBy("q_id")
  }

  /** q215 — Simpson's-paradox audit ([[Aggregates.simpsonSlopes]]):
    * per-returnflag OLS slope of price on quantity vs the pooled
    * slope, reversal-flagged — the aggregation-trap detector run
    * before trusting any blended-corpus metric. Exact-decimal
    * sufficient stats; pooled stats merge the group partials while
    * still decimal. */
  private[graft] val q215: Q = (s, d) =>
    simpsonSlopes(Tables.lineitem(s, d), "l_returnflag", "l_quantity",
      "l_extendedprice")

  /** q216 — incremental aggregate maintenance
    * ([[PipelineOps.statPartials]]/[[PipelineOps.mergePartials]]): the
    * events stream splits at the 80% timestamp into base + delta;
    * per-type stats are computed as mergeable partials on each side
    * and FOLDED — the oracle is a single full-data pass, so the gate
    * checks the merge law itself (partial-on-split ≡ full recompute,
    * bit-for-bit). The daily-batch-updates-corpus-aggregate shape. */
  private[graft] val q216: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val us = unix_micros(col("ts").cast("timestamp"))
    val span = ev.agg(min(us).as("mn"), max(us).as("mx")).first()
    val (mn, mx) = (span.getLong(0), span.getLong(1))
    val cut = mn + (mx - mn) * 4 / 5
    val base = ev.filter(us < cut)
    val delta = ev.filter(us >= cut)
    PipelineOps.finalizeStats(
      PipelineOps.mergePartials(Seq(
        PipelineOps.statPartials(base, "event_type", "value"),
        PipelineOps.statPartials(delta, "event_type", "value")),
        "event_type"),
      "event_type")
  }

  /** q217 — calendar coverage audit ([[EventOps.coverageGaps]]): per
    * event type, active days / span / gap count / longest gap — the
    * "is this feed actually arriving" precondition every downstream
    * rolling statistic silently assumes. Gaps via lag over the
    * calendar-bounded distinct-day frame; no calendar explode. */
  private[graft] val q217: Q = (s, d) =>
    EventOps.coverageGaps(Tables.events(s, d), "event_type", "ts")

  /** q218 — golden-record survivorship ([[Dedup.goldenRecord]]): each
    * multi-member near-dup cluster (shared scratch) collapses to one
    * synthesized record by deterministic per-attribute rules —
    * longest-text representative, modal lang/source, max chars; the
    * MDM step after clustering. Shared-scratch consumer. */
  private[graft] val q218: Q = (s, d) =>
    Dedup.goldenRecord(Tables.documents(s, d), sharedClusters(s, d),
      "doc_id")

  /** q219 — CMS self-join-size / F₂ estimation
    * ([[Aggregates.cmsSelfJoinSize]]): the equi-join-size / skew
    * synopsis computed from a w·d-bounded RELATIONAL Count–Min
    * counter frame — deterministic hashing makes the estimate itself
    * oracle-replicable, and the never-undercount guarantee is an
    * output column, not an assumption. */
  private[graft] val q219: Q = (s, d) =>
    cmsSelfJoinSize(Tables.lineitem(s, d), "l_suppkey")

  /** q220 — source vocabulary overlap ([[TextOps.vocabOverlap]]): the
    * pairwise corpus-similarity matrix consulted before mixing sources
    * — shared-type counts and vocab Jaccard per source pair, bounded
    * by |vocab|·|sources| regardless of document count. */
  private[graft] val q220: Q = (s, d) =>
    TextOps.vocabOverlap(Tables.documents(s, d), "source", "text")

  /** q221 — PQ distance-distortion audit: Pearson correlation and mean
    * ratio between ADC approximate distances and exact d² over every
    * (query, candidate) pair — the calibration companion to q214's
    * recall (recall says WHICH neighbors survive; this says how far
    * the DISTANCES drifted, which reranking thresholds consume).
    * Precision discipline: both 9-dp inputs convert to EXACT integer
    * nanos (a double within 1e-5 of an integer quantizes identically
    * in any engine); Pearson r is scale-invariant so the correlation
    * of the nano integers IS the correlation of the distances, with
    * every sum an exact DECIMAL of integer products — no decimal-tie
    * exposure at all (a scale-18 product sum would exceed double's
    * ~16 faithful digits; integers sidestep the whole class).
    * Shared-scratch consumer. */
  private[graft] val q221: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") < 5)
    val (codes, books) = sharedPq(s, d)
    val adc = SimSearch.adcTopKFrom(codes, books, q, "vec_id",
        "embedding", m = 4, len = 16, topK = Int.MaxValue)
      .select(col("q_id"), col("n_id"), col("adist"))
    val exact = emb.join(broadcast(q.select(col("vec_id").as("q_id"),
        col("embedding").as("q_emb"))),
        col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        round(SimSearch.sqDist(col("q_emb"), col("embedding")), 9)
          .as("d2"))
    val j = adc.join(exact, Seq("q_id", "n_id"))
      .filter(col("d2") > 0)
      .select((col("adist") * lit(1e9)).cast("decimal(18,0)").as("ix"),
        (col("d2") * lit(1e9)).cast("decimal(18,0)").as("iy"))
    val n = count(lit(1)).cast("double")
    val sx = sum(col("ix")).cast("double")
    val sy = sum(col("iy")).cast("double")
    val sxy = sum(col("ix") * col("iy")).cast("double")
    val sxx = sum(col("ix") * col("ix")).cast("double")
    val syy = sum(col("iy") * col("iy")).cast("double")
    j.agg(count(lit(1)).as("n_pairs"),
      round((n * sxy - sx * sy) /
        (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
        .as("corr"),
      round(sum(round(col("ix").cast("double") /
          col("iy").cast("double"), 12).cast("decimal(38,12)"))
        .cast("double") / n, 6).as("mean_ratio"))
  }
}
