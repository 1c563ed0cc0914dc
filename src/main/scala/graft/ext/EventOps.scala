package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
