package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine._

/** Registry of oracle-checked queries (SparkEntry.queries / oracleSql).
  *
  * Conventions for driver-compare stability:
  *  - every aggregate/computed column is aliased identically in Spark + SQL;
  *  - every query ends with a deterministic ORDER BY (full tie-break), with
  *    null ordering explicit in the SQL (Spark asc defaults nulls-first,
  *    DuckDB defaults nulls-last);
  *  - double aggregates go through exact DECIMAL sums cast back to DOUBLE
  *    (Aggregates.sumExact*), so Spark and DuckDB produce bit-identical
  *    values regardless of accumulation order;
  *  - integer-typed SQL aggregates are CAST(... AS BIGINT) to match Spark's
  *    long (DuckDB SUM(int) is HUGEINT).
  */
object Queries {
  import Aggregates._

  private type Q = (SparkSession, String) => DataFrame

  /** q01 — flagship: CASE-WHEN category map → groupBy → count → top-k
    * (`Preprocessing.py:203`, `XGBoost.py:101-114`). lineitem ⋈ broadcast(part)
    * stays a BroadcastHashJoin (no shuffle of the fact side) at any SF. */
  def flagshipCategoryTopK(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .withColumn("category", Features.category4(col("p_type")))
      .groupBy("category").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("category"))
      .limit(10)
  }

  /** q02 — sentinel→null cleanup then frequency table
    * (`Preprocessing.py:60-64` pattern over o_orderpriority's
    * '4-NOT SPECIFIED' sentinel). */
  private val q02: Q = (s, d) => {
    val o = Cleaning.sentinelsToNull(Tables.orders(s, d),
      Seq("o_orderpriority"), Seq("4-NOT SPECIFIED"))
    o.groupBy(col("o_orderpriority").as("prio"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("prio").asc_nulls_first)
  }

  /** q03 — exact dedup on a projected key set (`Preprocessing.py:53`). */
  private val q03: Q = (s, d) =>
    Cleaning.dropDuplicatesAll(
      Tables.lineitem(s, d).select("l_returnflag", "l_linestatus"))
      .orderBy("l_returnflag", "l_linestatus")

  /** q04 — sentinel→null then constant fill (`XGBoost.py:172-187` fillna). */
  private val q04: Q = (s, d) => {
    val o = Cleaning.sentinelsToNull(Tables.orders(s, d),
      Seq("o_orderpriority"), Seq("4-NOT SPECIFIED"))
    Cleaning.fillConst(o, Map("o_orderpriority" -> "UNKNOWN"))
      .groupBy(col("o_orderpriority").as("prio"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("prio"))
  }

  /** q05 — sentinel→null then dropna subset (`Preprocessing.py:77-95`). */
  private val q05: Q = (s, d) => {
    val o = Cleaning.sentinelsToNull(Tables.orders(s, d),
      Seq("o_orderpriority"), Seq("4-NOT SPECIFIED"))
    Cleaning.dropNullRows(o, Seq("o_orderpriority"))
      .groupBy(col("o_orderpriority").as("prio"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("prio"))
  }

  /** q06 — explicit casts incl. garbage→null try_cast
    * (`Preprocessing.py:103-116`, `XGBoost.py:75`). */
  private val q06: Q = (s, d) =>
    Tables.customer(s, d)
      .withColumn("cust_num",
        substring(col("c_name"), 10, 99).try_cast("bigint"))
      .withColumn("seg_num", col("c_mktsegment").try_cast("double"))
      .select("c_custkey", "cust_num", "seg_num")
      .orderBy("c_custkey")

  /** q07 — temporal extracts (`Preprocessing.py:234-237`); Spark dayofweek
    * 1=Sunday (DuckDB oracle adds 1). */
  private val q07: Q = (s, d) =>
    Features.withTemporal(Tables.events(s, d), "ts")
      .select("event_id", "d_year", "d_month", "d_hour", "d_dow")
      .orderBy("event_id")

  /** q08 — 1-key frequency table (`Preprocessing.py:203`). */
  private val q08: Q = (s, d) =>
    freqTable(Tables.lineitem(s, d), Seq("l_returnflag"))

  /** q09 — multi-key frequency + PySpark `ascending=False` all-keys-desc
    * ordering semantics (`Preprocessing.py:316-327`, SURVEY §2.6 O2). */
  private val q09: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("l_returnflag").desc,
        col("l_linestatus").desc)

  /** q10 — hand-rolled multi-granularity counts → ONE rollup shuffle
    * (`Preprocessing.py:296-327`, SURVEY §4.2.4). */
  private val q10: Q = (s, d) =>
    rollupCounts(Tables.lineitem(s, d), Seq("l_returnflag", "l_linestatus"))

  /** q11 — pivoted counts, explicit value list, fill-0
    * (`Preprocessing.py:618-619` re-homed from pandas). */
  private val q11: Q = (s, d) =>
    pivotCounts(Tables.lineitem(s, d), "l_returnflag", "l_linestatus",
      Seq("F", "O"))

  /** q12 — single-pass null/sentinel profile (`Preprocessing.py:32-36`). */
  private val q12: Q = (s, d) =>
    nullProfile(Tables.orders(s, d),
      Tables.ordersSchema.fieldNames.toSeq, Seq("4-NOT SPECIFIED"))

  /** q13 — exact median per group (oracle-checkable variant of the
    * reference's approxQuantile imputation statistic,
    * `Preprocessing.py:145-160`). Uses the memory-bounded
    * [[Aggregates.exactPercentiles]] (count-agg + rank-bracket
    * interpolation) — bit-identical to the buffering `percentile()` but no
    * per-group value multiset ever sits in one aggregation buffer, so a
    * hot group can't overflow an executor at 100 TB. */
  private val q13: Q = (s, d) =>
    Aggregates.exactPercentiles(Tables.lineitem(s, d), "l_returnflag",
        "l_quantity", Seq(0.5))
      .select(col("l_returnflag"), col("p0").as("med_qty"))
      .orderBy("l_returnflag")

  /** q14 — describe() re-homed: count/mean/std/min/max per group
    * (`Preprocessing.py:209,281`), exact-decimal determinism. */
  private val q14: Q = (s, d) =>
    summaryStats(Tables.lineitem(s, d), "l_returnflag", "l_extendedprice")

  /** q15 — per-group top-k via window row_number — the shape the reference
    * computes with a global sort (`Preprocessing.py:352-355`), upgraded. */
  private val q15: Q = (s, d) => {
    val rev = Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_suppkey")
      .agg(sumExact6(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("revenue").desc, col("l_suppkey"))
    rev.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .orderBy("l_returnflag", "rn")
  }

  /** q16 — multi-way join: revenue per nation (lineitem⋈orders⋈customer⋈
    * broadcast nation⋈broadcast region); dims broadcast, facts shuffle on
    * join keys only. */
  private val q16: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        sumExact6(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** q17 — count-encoding density feature: broadcast LEFT join + fill 0
    * (`XGBoost.py:168-187`). */
  private val q17: Q = (s, d) => {
    val cust = Tables.customer(s, d)
    val ords = Tables.orders(s, d)
      .select(col("o_custkey").as("c_custkey"))
    Density.attachCount(cust, ords, "c_custkey", "n_orders")
      .select("c_custkey", "n_orders")
      .orderBy("c_custkey")
  }

  /** q18 — left-semi join (EXISTS). */
  private val q18: Q = (s, d) => {
    val big = Tables.orders(s, d).filter(col("o_totalprice") > 200000)
      .select(col("o_custkey").as("c_custkey"))
    Tables.customer(s, d).join(big, Seq("c_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** q19 — left-anti join (NOT EXISTS): customers with no high-value order. */
  private val q19: Q = (s, d) => {
    val big = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
      .select(col("o_custkey").as("c_custkey"))
    Tables.customer(s, d).join(big, Seq("c_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** q20 — time-based train/test split + boolean-ish flag derivation
    * (`XGBoost.py:91-92,139-140`); split is a partition-prunable predicate
    * at scale. */
  private val q20: Q = (s, d) => {
    val o = Tables.orders(s, d)
    o.withColumn("split",
        when(year(col("o_orderdate")) <= 1998, "train").otherwise("test"))
      .groupBy("split")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L))
          .as("n_finished"))
      .orderBy("split")
  }

  /** q21 — INTERSECT (distinct semantics, matching SQL). */
  private val q21: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    li.filter(col("l_discount") > 0.09).select("l_partkey")
      .intersect(li.filter(col("l_quantity") > 48).select("l_partkey"))
      .orderBy("l_partkey")
  }

  /** q22 — EXCEPT (distinct semantics). */
  private val q22: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    li.filter(col("l_discount") > 0.09).select("l_partkey")
      .except(li.filter(col("l_quantity") > 40).select("l_partkey"))
      .orderBy("l_partkey")
  }

  /** q23 — top-N-then-isin filter (`Preprocessing.py:807-816` pattern),
    * re-expressed as a broadcast semi-join against the top-N table so no
    * driver collect is needed at scale. */
  private val q23: Q = (s, d) => {
    val p = Tables.part(s, d)
    val top3 = p.groupBy("p_brand").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("p_brand")).limit(3)
      .select("p_brand")
    p.join(broadcast(top3), Seq("p_brand"), "left_semi")
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
      .orderBy("p_brand")
  }

  /** q24 — avg-centroid aggregation (`Preprocessing.py:500-503`), exact
    * mean via decimal sums. */
  private val q24: Q = (s, d) =>
    Tables.customer(s, d).groupBy("c_mktsegment")
      .agg(avgExact(col("c_acctbal")).as("avg_bal"),
        count(lit(1)).as("n"))
      .orderBy("c_mktsegment")

  /** q46 — unionByName + distinct (SA2, `Preprocessing.py:429` re-homed
    * from pandas concat). */
  private val q46: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val hi = li.filter(col("l_quantity") > 45)
      .select("l_orderkey", "l_suppkey")
    val lo = li.filter(col("l_extendedprice") < 2000)
      .select("l_orderkey", "l_suppkey")
    hi.unionByName(lo).distinct()
      .orderBy("l_orderkey", "l_suppkey")
  }

  /** q47 — the 7-class category variant (`Preprocessing.py:807-817`),
    * multi-branch CASE with compound predicates. */
  private val q47: Q = (s, d) => {
    val p = Tables.part(s, d)
    p.withColumn("category7",
        Features.category7(col("p_type"), col("p_size")))
      .groupBy("category7").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("category7"))
  }

  /** q48 — median imputation end-to-end (`Preprocessing.py:144-168`):
    * sentinel→null, group medians computed distributed, nulls filled with
    * the median (broadcast join of the 1-row-per-group stat table). The
    * median uses the memory-bounded [[Aggregates.exactPercentiles]] — same
    * rationale as q13. */
  private val q48: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
      .withColumn("qty_n",
        when(col("l_quantity") > 45, lit(null)).otherwise(col("l_quantity")))
    val med = Aggregates.exactPercentiles(li, "l_returnflag", "qty_n",
        Seq(0.5))
      .select(col("l_returnflag"), col("p0").as("med"))
    li.join(broadcast(med), Seq("l_returnflag"))
      .withColumn("qty_filled", coalesce(col("qty_n"), col("med")))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("qty_filled").cast("decimal(28,12)")).cast("double")
          .as("sum_filled"))
      .orderBy("l_returnflag")
  }

  val all: Map[String, Q] = Map(
    "q46_union_distinct" -> q46,
    "q47_category7" -> q47,
    "q48_median_impute" -> q48,
    "q01_flagship_category_topk" -> (flagshipCategoryTopK _),
    "q02_sentinel_null_freq" -> q02,
    "q03_dedup_distinct" -> q03,
    "q04_fillna_const" -> q04,
    "q05_dropna_subset" -> q05,
    "q06_cast_trycast" -> q06,
    "q07_temporal_extracts" -> q07,
    "q08_freq_1key" -> q08,
    "q09_freq_multikey_desc" -> q09,
    "q10_rollup_counts" -> q10,
    "q11_pivot_counts" -> q11,
    "q12_null_profile" -> q12,
    "q13_median_exact" -> q13,
    "q14_summary_stats" -> q14,
    "q15_topk_per_group_window" -> q15,
    "q16_join_revenue_per_nation" -> q16,
    "q17_countencode_left_join" -> q17,
    "q18_semi_join" -> q18,
    "q19_anti_join" -> q19,
    "q20_time_split_flag" -> q20,
    "q21_intersect" -> q21,
    "q22_except" -> q22,
    "q23_topn_isin_filter" -> q23,
    "q24_avg_centroid" -> q24
  )

  // ---- Oracle SQL (DuckDB dialect, ANSI where possible) ----

  private val sumExactSql =
    (c: String) => s"CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"
  private val sumExact6Sql =
    (c: String) => s"CAST(SUM(CAST($c AS DECIMAL(38,6))) AS DOUBLE)"

  val oracles: Map[String, String] = Map(
    "q46_union_distinct" ->
      """SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity > 45
        |UNION
        |SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_extendedprice < 2000
        |ORDER BY l_orderkey, l_suppkey""".stripMargin,

    "q47_category7" ->
      """SELECT CASE
        |  WHEN p_type = 'PROMO' AND p_size <= 10 THEN 'PROMO_SMALL'
        |  WHEN p_type = 'PROMO' THEN 'PROMO_LARGE'
        |  WHEN p_type = 'ECONOMY' THEN 'ECONOMY'
        |  WHEN p_type = 'STANDARD' AND p_size <= 25 THEN 'STANDARD_SMALL'
        |  WHEN p_type = 'STANDARD' THEN 'STANDARD_LARGE'
        |  WHEN p_type IN ('LARGE','MEDIUM') THEN 'BULK'
        |  ELSE 'OTHER' END AS category7,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM part GROUP BY 1 ORDER BY n DESC, category7""".stripMargin,

    "q48_median_impute" ->
      """WITH base AS (
        |  SELECT l_returnflag,
        |    CASE WHEN l_quantity > 45 THEN NULL ELSE l_quantity END AS qty_n
        |  FROM lineitem),
        |med AS (
        |  SELECT l_returnflag, quantile_cont(qty_n, 0.5) AS med
        |  FROM base GROUP BY 1)
        |SELECT base.l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(COALESCE(qty_n, med) AS DECIMAL(28,12))) AS DOUBLE)
        |    AS sum_filled
        |FROM base JOIN med USING (l_returnflag)
        |GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "q01_flagship_category_topk" ->
      """SELECT CASE
        |  WHEN p_type IN ('PROMO','ECONOMY') THEN 'BUDGET'
        |  WHEN p_type IN ('LARGE','MEDIUM') THEN 'BULK'
        |  WHEN p_type = 'STANDARD' THEN 'STANDARD'
        |  ELSE 'OTHER' END AS category,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY n DESC, category LIMIT 10""".stripMargin,

    "q02_sentinel_null_freq" ->
      """SELECT CASE WHEN o_orderpriority IN ('4-NOT SPECIFIED')
        |            OR o_orderpriority = '' THEN NULL
        |       ELSE o_orderpriority END AS prio,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY 1
        |ORDER BY n DESC, prio ASC NULLS FIRST""".stripMargin,

    "q03_dedup_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q04_fillna_const" ->
      """SELECT COALESCE(CASE WHEN o_orderpriority IN ('4-NOT SPECIFIED')
        |                 OR o_orderpriority = '' THEN NULL
        |            ELSE o_orderpriority END, 'UNKNOWN') AS prio,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY 1 ORDER BY n DESC, prio""".stripMargin,

    "q05_dropna_subset" ->
      """SELECT o_orderpriority AS prio, CAST(count(*) AS BIGINT) AS n
        |FROM orders
        |WHERE o_orderpriority NOT IN ('4-NOT SPECIFIED') AND o_orderpriority <> ''
        |GROUP BY 1 ORDER BY n DESC, prio""".stripMargin,

    "q06_cast_trycast" ->
      """SELECT c_custkey,
        |       TRY_CAST(substring(c_name, 10, 99) AS BIGINT) AS cust_num,
        |       TRY_CAST(c_mktsegment AS DOUBLE) AS seg_num
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q07_temporal_extracts" ->
      """SELECT event_id,
        |       CAST(year(ts) AS INT) AS d_year,
        |       CAST(month(ts) AS INT) AS d_month,
        |       CAST(hour(ts) AS INT) AS d_hour,
        |       CAST(dayofweek(ts) + 1 AS INT) AS d_dow
        |FROM events ORDER BY event_id""".stripMargin,

    "q08_freq_1key" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY 1
        |ORDER BY n DESC, l_returnflag ASC""".stripMargin,

    "q09_freq_multikey_desc" ->
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY 1, 2
        |ORDER BY n DESC, l_returnflag DESC, l_linestatus DESC""".stripMargin,

    "q10_rollup_counts" ->
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""
        .stripMargin,

    "q11_pivot_counts" ->
      """SELECT l_returnflag,
        |       CAST(count(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS n_F,
        |       CAST(count(*) FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS n_O
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "q12_null_profile" ->
      Tables.ordersSchema.fieldNames.map(c =>
        s"CAST(SUM(CASE WHEN $c IS NULL OR CAST($c AS VARCHAR) = '4-NOT SPECIFIED' " +
          s"OR CAST($c AS VARCHAR) = '' THEN 1 ELSE 0 END) AS BIGINT) AS $c")
        .mkString("SELECT ", ", ", " FROM orders"),

    "q13_median_exact" ->
      """SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med_qty
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "q14_summary_stats" ->
      s"""SELECT l_returnflag,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  ${sumExactSql("l_extendedprice")} / count(*) AS mean_v,
         |  round(sqrt((CAST(count(*) AS DOUBLE) * ${sumExact6Sql("l_extendedprice*l_extendedprice")}
         |        - ${sumExactSql("l_extendedprice")} * ${sumExactSql("l_extendedprice")})
         |       / (CAST(count(*) AS DOUBLE) * (CAST(count(*) AS DOUBLE) - 1.0))), 4) AS std_v,
         |  min(l_extendedprice) AS min_v,
         |  max(l_extendedprice) AS max_v
         |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "q15_topk_per_group_window" ->
      s"""SELECT * FROM (
         |  SELECT l_returnflag, l_suppkey,
         |         ${sumExact6Sql("l_extendedprice*(1-l_discount)")} AS revenue,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag
         |           ORDER BY ${sumExact6Sql("l_extendedprice*(1-l_discount)")} DESC,
         |                    l_suppkey) AS INT) AS rn
         |  FROM lineitem GROUP BY l_returnflag, l_suppkey)
         |WHERE rn <= 3 ORDER BY l_returnflag, rn""".stripMargin,

    "q16_join_revenue_per_nation" ->
      s"""SELECT r_name, n_name,
         |  ${sumExact6Sql("l_extendedprice*(1-l_discount)")} AS revenue,
         |  CAST(count(*) AS BIGINT) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY 1, 2 ORDER BY revenue DESC, n_name""".stripMargin,

    "q17_countencode_left_join" ->
      """SELECT c_custkey,
        |       CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders
        |FROM customer
        |LEFT JOIN (SELECT o_custkey, count(*) AS n_orders
        |           FROM orders GROUP BY 1) ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,

    "q18_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 200000)
        |ORDER BY c_custkey""".stripMargin,

    "q19_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,

    "q20_time_split_flag" ->
      """SELECT CASE WHEN year(o_orderdate) <= 1998 THEN 'train'
        |            ELSE 'test' END AS split,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_finished
        |FROM orders GROUP BY 1 ORDER BY split""".stripMargin,

    "q21_intersect" ->
      """SELECT l_partkey FROM lineitem WHERE l_discount > 0.09
        |INTERSECT
        |SELECT l_partkey FROM lineitem WHERE l_quantity > 48
        |ORDER BY l_partkey""".stripMargin,

    "q22_except" ->
      """SELECT l_partkey FROM lineitem WHERE l_discount > 0.09
        |EXCEPT
        |SELECT l_partkey FROM lineitem WHERE l_quantity > 40
        |ORDER BY l_partkey""".stripMargin,

    "q23_topn_isin_filter" ->
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n
        |FROM part
        |WHERE p_brand IN (SELECT p_brand FROM part GROUP BY p_brand
        |                  ORDER BY count(*) DESC, p_brand LIMIT 3)
        |GROUP BY 1 ORDER BY p_brand""".stripMargin,

    "q24_avg_centroid" ->
      s"""SELECT c_mktsegment,
         |  ${sumExactSql("c_acctbal")} / count(*) AS avg_bal,
         |  CAST(count(*) AS BIGINT) AS n
         |FROM customer GROUP BY 1 ORDER BY c_mktsegment""".stripMargin
  )
}
