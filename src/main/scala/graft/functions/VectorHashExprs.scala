package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Hot loops for the SimHash vote fold and the random-hyperplane LSH
  * bucket, shared by interpreted eval and generated code (same pattern as
  * [[ShingleHashUtil]]). Both replace per-bit `aggregate(...)` lambda
  * stacks — `bits` interpreted scans of the array per row — with ONE
  * JIT-compiled pass, while reproducing the lambda forms' results
  * bit-for-bit (parity spec-asserted) so the DuckDB oracles are untouched.
  */
object VectorHashUtil {

  /** SimHash over token hashes: bit j set iff Σ_h (2·((h>>j)&1) − 1) > 0.
    * Matches the per-bit lambda `aggregate(hashes, 0L, acc + (h>>j)%2*2−1)`
    * + `when(votes > 0, 1L<<j).otherwise(0)` fold, including its edge
    * semantics: empty array → 0, any null element → 0 (null votes make
    * every `when` fall through to otherwise(0)). */
  def simhash(arr: ArrayData, bits: Int): Long = {
    val n = arr.numElements()
    val votes = new Array[Long](bits)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return 0L
      val h = arr.getLong(i)
      var j = 0
      while (j < bits) {
        votes(j) += ((h >> j) & 1L) * 2 - 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }

  /** `bits` sign-of-projection bits over a float vector, planes
    * `planeOffset … planeOffset+bits−1`. Plane component r(p, j) and the
    * sequential accumulation order are EXACTLY SimSearch.planeComponent's
    * `((p·2654435761 + j·40503) mod 8191) / 4095.5 − 1.0` inside
    * `aggregate(zip_with(emb, sequence, x·r), 0.0, +)`; edge semantics
    * match the lambda fold too: empty vector → bucket 0, any null element
    * → bucket 0 (null projections make every sign test fall through). */
  def lshBucket(arr: ArrayData, bits: Int, planeOffset: Int): Long = {
    val n = arr.numElements()
    val acc = new Array[Double](bits)
    var j = 0
    while (j < n) {
      if (arr.isNullAt(j)) return 0L
      val x = arr.getFloat(j).toDouble
      var b = 0
      while (b < bits) {
        val p = planeOffset + b
        val r = ((p * 2654435761L + j * 40503L) % 8191L) / 4095.5 - 1.0
        acc(b) += x * r
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      // Spark's `proj > 0` (and DuckDB's) orders NaN above every number,
      // so a NaN projection sets its bit — Java's `> 0` alone would not
      if (acc(b) > 0 || java.lang.Double.isNaN(acc(b))) out |= 1L << b
      b += 1
    }
    out
  }
}

/** SimHash fingerprint of an array<long> of (distinct) token hashes. */
case class SimHashExpr(child: Expression, bits: Int)
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("simhash requires array<bigint>")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      VectorHashUtil.simhash(input.asInstanceOf[ArrayData], bits))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorHashUtil.simhash($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression)
      : SimHashExpr = copy(child = newChild)
}

/** Random-hyperplane LSH bucket id of an array<float> embedding. */
case class LshBucketExpr(child: Expression, bits: Int, planeOffset: Int)
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("lsh_bucket requires array<float>")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      VectorHashUtil.lshBucket(input.asInstanceOf[ArrayData], bits,
        planeOffset))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorHashUtil.lshBucket(" +
        s"$c, $bits, $planeOffset);")

  override protected def withNewChildInternal(newChild: Expression)
      : LshBucketExpr = copy(child = newChild)
}

object VectorHash {
  /** SimHash fingerprint column over an array<bigint> of token hashes. */
  def simhash(hashes: Column, bits: Int): Column =
    shim.toColumn(SimHashExpr(shim.toExpression(hashes), bits))

  /** LSH bucket column over an array<float> embedding. */
  def lsh_bucket(emb: Column, bits: Int, planeOffset: Int = 0): Column =
    shim.toColumn(
      LshBucketExpr(shim.toExpression(emb), bits, planeOffset))
}
