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
    * the one-row aggregate is embedded as a subquery rather than joined. */
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
