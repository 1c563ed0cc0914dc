package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.shim

/** Spark's own runtime-filter bloom expressions surfaced as Columns (the
  * engine uses `BloomFilterAggregate`/`BloomFilterMightContain` internally
  * for injected runtime filters but does not SQL-register them).
  *
  * The 100 TB use is semi-join pruning: build the KB-scale sketch over the
  * (already-filtered) key side in one aggregate, broadcast it as a 1-row
  * frame, and `might_contain` prunes the fact scan BEFORE the shuffle of
  * the exact verifying join — shuffle volume drops by the join selectivity
  * while the final result stays exact (no false negatives by construction;
  * false positives are removed by the join itself). */
object Bloom {

  /** Aggregate a long key column into a bloom-filter sketch (binary). */
  def bloom_agg(c: Column, estimatedItems: Long, numBits: Long): Column =
    shim.toColumn(new BloomFilterAggregate(shim.toExpression(c),
      Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** Bloom sketch of `df(key)` as a scalar-subquery Column —
    * `might_contain` requires its sketch to be a constant or scalar
    * subquery (the exact shape Spark's own InjectRuntimeFilter builds), so
    * the one-row aggregate is embedded as a subquery rather than joined.
    *
    * INVARIANT (load-bearing, do not regress): callers routinely pass the
    * SAME DataFrame here and into the verifying join of the main plan
    * (q79, ScaleSpec), so the subquery's plan shares expression IDs with
    * the outer plan. That is legal only because the analyzer's
    * DeduplicateRelations re-instances conflicting attribute IDs across
    * subquery boundaries — a private behavior, not a public API. The
    * ScaleSpec case "bloom sketch and verifying join over the SAME
    * DataFrame" exists to catch a Spark upgrade changing this; if it ever
    * breaks, switch to deriving the subquery from a freshly re-instanced
    * copy of the plan instead of `agg.queryExecution.analyzed`. */
  def bloomOf(df: org.apache.spark.sql.DataFrame, key: String,
      estimatedItems: Long, numBits: Long): Column = {
    val agg = df.agg(bloom_agg(df(key), estimatedItems, numBits))
    shim.toColumn(org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
      agg.queryExecution.analyzed))
  }

  /** Membership probe against a [[bloom_agg]] sketch. */
  def might_contain(bloom: Column, v: Column): Column =
    shim.toColumn(BloomFilterMightContain(shim.toExpression(bloom),
      shim.toExpression(v)))
}
