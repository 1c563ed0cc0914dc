package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.DataType

/** AS-OF JOIN — the canonical "operator Spark lacks" (SURVEY.md §4.3 /
  * builder contract preference (c)): for every left row, attach the most
  * recent right row with `rightTime <= leftTime` within the same key
  * (pandas merge_asof / kdb aj / DuckDB ASOF JOIN semantics, left-outer).
  *
  * Why a custom operator: composing built-ins needs either a range
  * self-join (quadratic per key) or a union+window trick (full-width
  * shuffle of both sides plus two window sorts). This exec declares
  * `ClusteredDistribution` + per-partition `(key, time)` ordering, so
  * Catalyst inserts exactly one hash exchange + sort per side, and the
  * merge itself is a single forward pass over co-partitioned sorted
  * iterators — the same wire cost as a sort-merge join. At 100 TB both
  * sides shuffle once on the key; no state beyond one buffered right row.
  *
  * Ties on rightTime: the last right row in (key, time, insertion) order
  * wins; feed a (key, time)-unique right side for engine-independent
  * determinism (the registered query pre-aggregates).
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = physicalOrdering(leftKey.dataType)
    val timeOrd = physicalOrdering(leftTime.dataType)
    val rightSchema = right.schema
    val outputAttrs = output

    val lRdd = left.execute()
    val rRdd = right.execute()
    // zipPartitions relies on EnsureRequirements co-partitioning both
    // sides; fail with a diagnosable message if a future planner/AQE
    // change breaks the alignment instead of a cryptic zip error
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      s"as-of join children not co-partitioned: " +
        s"${lRdd.getNumPartitions} vs ${rRdd.getNumPartitions}")
    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      val nullRight = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(rightSchema.length)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outputAttrs, outputAttrs)
      val rBuf = rIter.buffered
      // last right row at or before the current left time, for its key
      var lastKey: Any = null
      var lastRow: InternalRow = null
      lIter.map { lRow =>
        val lk = lKey.eval(lRow)
        val lt = lTime.eval(lRow)
        if (lk != null && lt != null) {
          // advance the right side through all rows usable by this left row
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val peek = rBuf.head
            val rk = rKey.eval(peek)
            val rt = rTime.eval(peek)
            val cmpKey = if (rk == null) -1 else keyOrd.compare(rk, lk)
            if (rk == null || cmpKey < 0 || (cmpKey == 0 && rt == null)) {
              // earlier key, null key, or null time (sorts first, can never
              // match): consume so the scan can't stall on it
              rBuf.next()
            } else if (cmpKey == 0 && timeOrd.compare(rt, lt) <= 0) {
              // copy the row FIRST, then re-derive the key from the copy:
              // for non-primitive key types (string/decimal/struct) eval
              // returns a view into the iterator's reused UnsafeRow buffer,
              // which is silently overwritten when the iterator advances
              lastRow = rBuf.next().copy()
              lastKey = rKey.eval(lastRow)
            } else {
              advancing = false
            }
          }
        }
        val matches = lk != null && lastRow != null &&
          keyOrd.compare(lastKey, lk) == 0
        proj(joined(lRow, if (matches) lastRow else nullRight))
      }
    }
  }

  private def physicalOrdering(dt: DataType): Ordering[Any] =
    org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(dt)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical node to the exec. */
object AsOfJoinStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Optimizer rule (the `Rule[LogicalPlan]` leg of the custom-operator
  * triple): Catalyst cannot push predicates through a binary node it does
  * not know, so a filter above an as-of join would otherwise keep BOTH
  * sides scanning fully — at 100 TB that is the difference between
  * reading one key's partitions and reading the table.
  *
  * Two safe moves, both proved by the operator's semantics (output rows
  * are exactly the left rows, and a match requires rightKey == leftKey):
  *  1. any deterministic conjunct referencing only left attributes pushes
  *     into the left child (1:1 left-row ↔ output-row);
  *  2. a conjunct referencing ONLY the left join key additionally
  *     transfers to the right child with leftKey→rightKey substituted —
  *     right rows whose key fails the predicate can never be emitted.
  * Pushed filters then reach the parquet scans' PushedFilters /
  * partition pruning through the normal planning path. */
object AsOfFilterPushdown
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet}
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsOfJoinPlan) =>
      // Only the deterministic PREFIX of the conjunct list may move (same
      // span(_.deterministic) contract as Spark's PushPredicateThroughNonJoin):
      // a conjunct sitting after a non-deterministic one — e.g.
      // `rand() < 0.5 AND key = 7` — must keep evaluating over the
      // pre-filter row set, or the sample distribution changes.
      val (detPrefix, tail) =
        splitConjunctivePredicates(cond).span(_.deterministic)
      val (leftOnly, detRest) = detPrefix.partition(p =>
        p.references.subsetOf(aj.left.outputSet))
      val rest = detRest ++ tail
      if (leftOnly.isEmpty) f
      else {
        val rightPreds = (aj.leftKey, aj.rightKey) match {
          case (lk: Attribute, rk: Attribute) =>
            leftOnly.filter(_.references == AttributeSet(lk :: Nil))
              .map(_.transform {
                case a: Attribute if a.semanticEquals(lk) => rk
              })
          case _ => Nil
        }
        val newLeft = Filter(leftOnly.reduce(And), aj.left)
        val newRight = rightPreds.reduceOption(And)
          .map(Filter(_, aj.right)).getOrElse(aj.right)
        val pushed = aj.copy(left = newLeft, right = newRight)
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** SparkSessionExtensions entry point (builder-time registration):
  * `SparkSession.builder().withExtensions(new GraftExtensions)` — the
  * runtime path below (extraStrategies) covers already-built sessions.
  *
  * Also registers the native kernels as SQL functions, so the engine's
  * full surface is reachable from `spark.sql(...)`, not only the Column
  * DSL — `SELECT poly_hash(s)`, `cosine_sim(a, b)`,
  * `simhash(hashes, bits)`, `misra_gries(tok, k)`, …. Literal-int
  * parameters (bits, k, …) are required foldable at registration. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
  import graft.functions._

  private def litInt(e: Expression, fn: String): Int = {
    require(e.foldable, s"$fn: parameter must be a literal integer")
    val v = e.eval(null)
    require(v != null, s"$fn: literal parameter must not be null")
    v.asInstanceOf[Number].intValue()
  }

  private def fn(name: String, arity: Int)(
      builder: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft.functions", name),
      (args: Seq[Expression]) => {
        require(args.length == arity, s"$name expects $arity arguments")
        builder(args)
      })

  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectPlannerStrategy(_ => GroupTopKStrategy)
    e.injectOptimizerRule(_ => AsOfFilterPushdown)
    e.injectFunction(fn("poly_hash", 1)(a => PolyHashExpr(a.head)))
    e.injectFunction(fn("cosine_sim", 2)(a => CosineSimExpr(a(0), a(1))))
    e.injectFunction(fn("sq_dist", 2)(a => SqDistExpr(a(0), a(1))))
    e.injectFunction(fn("array_top_count", 1)(a => ArrayTopCountExpr(a.head)))
    e.injectFunction(fn("quantize_int8", 1)(a => QuantizeInt8Expr(a.head)))
    e.injectFunction(fn("shingle_hash", 2)(a =>
      ShingleHashExpr(a.head, litInt(a(1), "shingle_hash"))))
    e.injectFunction(fn("simhash", 2)(a =>
      SimHashExpr(a.head, litInt(a(1), "simhash"))))
    e.injectFunction(fn("lsh_bucket", 3)(a => LshBucketExpr(a.head,
      litInt(a(1), "lsh_bucket"), litInt(a(2), "lsh_bucket"))))
    // return the RAW AggregateFunction — the analyzer wraps it itself,
    // which is what makes DISTINCT and FILTER (WHERE …) clauses resolve
    e.injectFunction(fn("misra_gries", 2)(a =>
      MisraGriesAgg(a.head, litInt(a(1), "misra_gries"))))
  }
}

object AsOf {
  /** User-facing as-of left join. Column names must be unambiguous across
    * the two sides. Registers the planner strategy idempotently. */
  def join(leftDf: DataFrame, rightDf: DataFrame,
      key: (String, String), time: (String, String)): DataFrame = {
    val spark = leftDf.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(AsOfFilterPushdown)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AsOfFilterPushdown
    }
    val lPlan = leftDf.queryExecution.analyzed
    val rPlan = rightDf.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val (lk, rk) = (attr(lPlan, key._1), attr(rPlan, key._2))
    val (lt, rt) = (attr(lPlan, time._1), attr(rPlan, time._2))
    // the exec builds its orderings from the LEFT types; mismatched sides
    // would fail deep inside executor tasks — fail at plan time instead
    require(lk.dataType == rk.dataType,
      s"as-of key types differ: ${lk.dataType} vs ${rk.dataType}")
    require(lt.dataType == rt.dataType,
      s"as-of time types differ: ${lt.dataType} vs ${rt.dataType}")
    val plan = AsOfJoinPlan(lPlan, rPlan, lk, rk, lt, rt)
    shim.ofRows(spark, plan)
  }
}
