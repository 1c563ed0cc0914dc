package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graft.shim

/** GROUP TOP-K — the second whole-operator custom plan (SURVEY.md §4.3
  * preference (c), next to [[AsOfJoinPlan]]): per group, the k rows with
  * the largest `ord` value (ties broken by smallest `tie`, which should
  * be unique for engine-independent determinism).
  *
  * Why a custom operator: the built-in formulation
  * (`row_number().over(partitionBy(keys).orderBy(...)) <= k`) shuffles
  * EVERY row to its group's reducer and sorts whole groups, then throws
  * almost all of it away — at 100 TB with k=3 that is a full-corpus
  * shuffle for a 3-row-per-group answer, and one hot group becomes one
  * hot sorting task. This operator runs a bounded min-heap per group
  * MAP-SIDE first (memory O(groups·k) per task, no sort), so the
  * exchange carries at most `k · numPartitions` rows per group; the
  * final pass re-heaps the survivors after the shuffle. Same
  * partial→exchange→final shape as Spark's own aggregation, applied to
  * top-k. Skew: a hot group costs each map task only O(n_task · log k),
  * and the reducer sees ≤ k·P rows, not the group.
  *
  * Null `ord` values sort last (never kept while non-null candidates
  * remain); null keys form their own group, matching window-function
  * grouping semantics.
  */
case class GroupTopKPlan(keys: Seq[Attribute], ord: Attribute,
    tie: Attribute, k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(
      newChild: LogicalPlan): GroupTopKPlan = copy(child = newChild)
}

case class GroupTopKExec(keys: Seq[Expression], ord: Expression,
    tie: Expression, k: Int, partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def nodeName: String =
    if (partial) "GroupTopKPartial" else "GroupTopKFinal"

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val boundKeys = keys.map(BindReferences.bindReference(_, child.output))
    val boundOrd = BindReferences.bindReference(ord, child.output)
    val boundTie = BindReferences.bindReference(tie, child.output)
    val ordCmp = org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(ord.dataType)
    val tieCmp = org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(tie.dataType)
    val capacity = k

    child.execute().mapPartitions({ iter =>
      // "worth" comparison: positive if a beats b. Larger ord wins; null
      // ord always loses; on ord ties the SMALLER tie wins (asc)
      def beats(aOrd: Any, aTie: Any, bOrd: Any, bTie: Any): Boolean = {
        val c =
          if (aOrd == null && bOrd == null) 0
          else if (aOrd == null) -1
          else if (bOrd == null) 1
          else ordCmp.compare(aOrd, bOrd)
        if (c != 0) c > 0
        else if (aTie == null && bTie == null) false
        else if (aTie == null) false // null tie loses the tiebreak
        else if (bTie == null) true
        else tieCmp.compare(aTie, bTie) < 0
      }
      // min-heap per group: the queue's head (dequeue target) is the
      // WORST retained row, so an incoming better row replaces it in
      // O(log k); total map-side cost O(n log k), memory O(groups · k)
      val heapOrd = new Ordering[(Any, Any, InternalRow)] {
        override def compare(a: (Any, Any, InternalRow),
            b: (Any, Any, InternalRow)): Int =
          if (beats(a._1, a._2, b._1, b._2)) -1
          else if (beats(b._1, b._2, a._1, a._2)) 1
          else 0
      }
      val keyProj = UnsafeProjection.create(boundKeys)
      val groups = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.PriorityQueue[(Any, Any, InternalRow)]]()
      iter.foreach { row =>
        val key = keyProj(row)
        var heap = groups.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue
            .empty[(Any, Any, InternalRow)](heapOrd)
          groups.put(key.copy(), heap)
        }
        val o = boundOrd.eval(row)
        val t = boundTie.eval(row)
        if (heap.size < capacity) {
          // copy: eval results may be views into the iterator's reused
          // row buffer (strings/decimals), and the row itself certainly is
          val copied = row.copy()
          heap.enqueue((boundOrd.eval(copied), boundTie.eval(copied), copied))
        } else {
          val worst = heap.head
          if (beats(o, t, worst._1, worst._2)) {
            heap.dequeue()
            val copied = row.copy()
            heap.enqueue((boundOrd.eval(copied), boundTie.eval(copied), copied))
          }
        }
      }
      import scala.jdk.CollectionConverters._
      groups.values().iterator().asScala.flatMap(_.iterator.map(_._3))
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): GroupTopKExec = copy(child = newChild)
}

/** Plans the logical node as partial → (exchange via required
  * distribution) → final, the aggregation shape applied to top-k. */
object GroupTopKStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupTopKPlan(keys, ord, tie, k, child) =>
      val part = GroupTopKExec(keys, ord, tie, k, partial = true,
        planLater(child))
      GroupTopKExec(keys, ord, tie, k, partial = false, part) :: Nil
    case _ => Nil
  }
}

object GroupTopK {
  /** User-facing per-group top-k: the `k` rows with the largest
    * `orderCol` per `keys` group, ties broken by smallest `tieCol`
    * (pass a unique id for full determinism). Registers the planner
    * strategy idempotently. */
  def topK(df: DataFrame, keyCols: Seq[String], orderCol: String,
      tieCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(GroupTopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GroupTopKStrategy
    }
    val plan = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    shim.ofRows(spark, GroupTopKPlan(keyCols.map(attr), attr(orderCol),
      attr(tieCol), k, plan))
  }
}
