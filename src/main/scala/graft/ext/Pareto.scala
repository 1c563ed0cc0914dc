package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pareto-skyline selection — multi-objective "best under no weighting"
  * (SURVEY.md §7.4 extension): keep exactly the rows no other row
  * dominates, where q dominates p iff q ≥ p on EVERY objective and
  * q > p on at least one (all objectives maximize; callers negate a
  * column to minimize it). The curation shape behind "keep documents
  * that are not beaten on quality AND freshness AND uniqueness at
  * once" — a weighted score forces one trade-off; the skyline returns
  * the whole undominated frontier.
  *
  * Scale design — the naive form is an all-pairs O(n²) theta join, so
  * the operator prunes with an equi-width grid first:
  *
  *  1. one agg row of global per-dim min/max (broadcast) buckets every
  *     row into a ≤ gridQ^dims cell id — a pure map;
  *  2. per-cell min/max aggregates (one shuffle, output bounded by the
  *     CELL COUNT, not the data) feed a cell-level dominance test:
  *     cell c is discarded iff some cell c' has min_k(c') ≥ max_k(c)
  *     on every dim, strictly on one. That rule is sound for ANY grid:
  *     every point of c' then dominates every point of c (p'_k ≥
  *     min_k(c') ≥ max_k(c) ≥ p_k, strict on the witness dim) — no
  *     reliance on how bucket boundaries split ties, so the final
  *     output is deterministic even though bucketing needn't be;
  *  3. only rows in surviving cells — the frontier shell, typically a
  *     vanishing fraction — enter the exact pairwise dominance
  *     anti-join (broadcast nested loop over the shell only).
  *
  * The exact phase makes the result EXACTLY the skyline; the grid only
  * shrinks the quadratic set. A dominated-majority corpus at 100 TB
  * prunes to a shell bounded by the frontier's surface, not the data.
  *
  * LIMITATION (anti-correlated objectives): the exact phase broadcasts
  * the frontier SHELL as the rival side, betting the shell is small.
  * When the dims are strongly anti-correlated (every point trades one
  * objective for another) the true skyline — and hence the shell — can
  * be O(n), and the forced broadcast becomes the bottleneck the grid
  * cannot bound. Mitigations at scale: raise `gridQ` (a finer grid
  * discards more dominated cells, shrinking the shell toward the true
  * frontier), or pre-reduce per distinct first-dim value with a max on
  * the others (the 2-D [[graft.ext.PipelineOps.paretoFrontier]] trick)
  * before calling skyline. A skyline that IS a constant fraction of
  * the corpus is not a selection operator anymore — callers wanting
  * that should stream the frontier out in dominance-sorted batches
  * instead. */
object Pareto {

  /** All-maximize skyline of `df` over numeric/orderable `dimCols`
    * (each must support `>=`/`>` and min/max; cast dates/timestamps
    * upstream if sub-typed semantics matter). `idCols` pass through.
    * Ties: exact duplicates on every dim dominate nothing and are ALL
    * kept — the classic skyline convention, and the deterministic one. */
  def skyline(df: DataFrame, idCols: Seq[String], dimCols: Seq[String],
      gridQ: Int = 8): DataFrame = {
    require(dimCols.nonEmpty)
    val keep = (idCols ++ dimCols).map(col)

    // numeric image used ONLY for grid placement (dominance always
    // compares the original column). Temporal types have no direct
    // double cast — route them through timestamp seconds (session tz
    // is pinned UTC in every entry point).
    import org.apache.spark.sql.types._
    val dtypes = df.schema.fields.map(f => f.name -> f.dataType).toMap
    def asDouble(d: String): Column = dtypes(d) match {
      case TimestampType | TimestampNTZType | DateType =>
        col(d).cast("timestamp").cast("double")
      case _ => col(d).cast("double")
    }

    // 1. global per-dim ranges — ONE row, broadcast
    val rangeAgg = dimCols.flatMap(d => Seq(
      min(asDouble(d)).as(s"__lo_$d"),
      max(asDouble(d)).as(s"__hi_$d")))
    val ranges = df.agg(rangeAgg.head, rangeAgg.tail: _*)

    def bucket(d: String): Column = {
      val x = asDouble(d)
      val lo = col(s"__lo_$d"); val hi = col(s"__hi_$d")
      when(hi <= lo, lit(0)).otherwise(
        least(lit(gridQ - 1),
          floor((x - lo) / (hi - lo) * gridQ).cast("int")))
        .as(s"__b_$d")
    }
    val bucketed = df.crossJoin(broadcast(ranges))
      .select(keep ++ dimCols.map(bucket): _*)
    val bCols = dimCols.map(d => s"__b_$d")

    // 2. cell frame (bounded by gridQ^dims) + sound cell dominance
    val cellAgg = dimCols.flatMap(d => Seq(
      min(col(d)).as(s"__cmin_$d"), max(col(d)).as(s"__cmax_$d")))
    val cells = bucketed.groupBy(bCols.map(col): _*)
      .agg(cellAgg.head, cellAgg.tail: _*)
    val c = cells.select(
      bCols.map(col) ++ dimCols.map(d => col(s"__cmax_$d")): _*)
    val dnm = cells.select(dimCols.map(d =>
      col(s"__cmin_$d").as(s"__dmin_$d")): _*)
    val weakCell = dimCols.map(d => col(s"__dmin_$d") >= col(s"__cmax_$d"))
      .reduce(_ && _)
    val strictCell = dimCols.map(d => col(s"__dmin_$d") > col(s"__cmax_$d"))
      .reduce(_ || _)
    val deadCells = c.join(broadcast(dnm), weakCell && strictCell,
      "left_semi").select(bCols.map(col): _*)

    // 3. shell rows → exact pairwise dominance anti-join
    val shell = bucketed.join(broadcast(deadCells), bCols, "left_anti")
      .select(keep: _*)
    val rival = shell.select(dimCols.map(d => col(d).as(s"__r_$d")): _*)
    val weak = dimCols.map(d => col(s"__r_$d") >= col(d)).reduce(_ && _)
    val strict = dimCols.map(d => col(s"__r_$d") > col(d)).reduce(_ || _)
    shell.join(broadcast(rival), weak && strict, "left_anti")
  }
}
