package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Hot loop for k-word shingle hashing, shared by interpreted eval and
  * generated code (the codegen path calls this static method — the loop is
  * JIT-compiled either way, with zero per-element lambda dispatch).
  *
  * Semantics are EXACTLY `transform(sequence(1, n-k+1),
  * i => polyHash(concat_ws(" ", slice(toks, i, k))))`: the rolling hash of
  * each shingle's characters with single-space separators (code 32).
  * Computed algebraically — per-word hash h_w and 31^len(w) mod P once per
  * word, then each shingle composes h = ((h·31 + 32)·pow_w + h_w) mod P —
  * O(chars + n·k) instead of O(chars·k), allocation-free in the loop.
  */
object ShingleHashUtil {
  final val P = 1000000007L

  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val hw = new Array[Long](n)
    val pw = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i).toString
      var h = 0L
      var p = 1L
      var ci = 0
      while (ci < s.length) {
        val cp = s.codePointAt(ci)
        h = (h * 31 + cp) % P
        p = (p * 31) % P
        ci += Character.charCount(cp)
      }
      hw(i) = h; pw(i) = p
      i += 1
    }
    val out = new Array[Long](n - k + 1)
    var s0 = 0
    while (s0 <= n - k) {
      var h = hw(s0)
      var j = s0 + 1
      while (j < s0 + k) {
        h = (h * 31 + 32) % P          // the ' ' separator
        h = (h * pw(j) + hw(j)) % P    // append word j in one step
        j += 1
      }
      out(s0) = h
      s0 += 1
    }
    new GenericArrayData(out)
  }
}

/** Array of k-word shingle rolling hashes over a token array (order
  * preserved, duplicates kept — wrap in array_distinct for the set form). */
case class ShingleHashExpr(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("shingle_hash requires array<string>")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleHashUtil.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashUtil.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression)
      : ShingleHashExpr = copy(child = newChild)
}

object ShingleHash {
  def shingle_hash(tokens: Column, k: Int): Column =
    shim.toColumn(ShingleHashExpr(shim.toExpression(tokens), k))
}
