package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-encoding (density features) — SURVEY.md §2.4 J1
  * (`XGBoost.py:168-187`): aggregate counts on a key from a *statistics*
  * frame (train only — leakage discipline, `XGBoost.py:156`), then attach
  * to a target frame via broadcast LEFT join, filling misses with 0.
  *
  * Scale: the count side is |distinct(key)| rows — orders of magnitude
  * smaller than the fact table — so the join is an explicit
  * BroadcastHashJoin: zero shuffle of the fact side at any scale. */
object Density {

  /** Per-key count table from the statistics frame. */
  def countTable(stats: DataFrame, key: String, outName: String): DataFrame =
    stats.groupBy(col(key)).agg(count(lit(1)).as(outName))

  /** Attach the count feature to `target` (broadcast left join + fill 0). */
  def attachCount(target: DataFrame, stats: DataFrame, key: String,
      outName: String): DataFrame =
    target.join(broadcast(countTable(stats, key, outName)), Seq(key), "left")
      .na.fill(0, Seq(outName))
}
