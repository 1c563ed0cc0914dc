package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types._

/** Hot loop for symmetric int8 quantization, shared by interpreted eval and
  * generated code (same pattern as [[ShingleHashUtil]]).
  *
  * Semantics for FINITE inputs are EXACTLY the lambda composition
  * `struct(m.cast(float), transform(emb, x =>
  * when(m > 0, round(x.cast(double)*127.0/m)).otherwise(0.0).cast(tinyint)))`
  * with `m = array_max(transform(emb, abs(x.cast(double))))` — including
  * its edge cases (empty/all-null array → null scale + 0/empty codes; null
  * element under m>0 → null code) and its exact HALF_UP rounding
  * (java BigDecimal, the same path Spark's `round` takes for doubles).
  * On NaN/±Infinity elements the two deliberately diverge: under Spark 4's
  * ANSI default the lambda's tinyint cast THROWS CAST_OVERFLOW, while this
  * kernel stays total — NaN-greatest max (Spark comparison semantics),
  * round passes NaN/Inf through, and the non-ANSI `toByte` maps the
  * resulting NaN ratios to code 0 (golden-pinned in SimSearchSpec).
  * The lambda form evaluates the `array_max` subtree PER ELEMENT
  * (no let-binding in the Column DSL ⇒ O(dim²) interpreted work per row);
  * this kernel is one O(dim) pass. */
object QuantizeUtil {

  def quantize(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    // pass 1: m = max |x| over non-null elements (array_max skips nulls,
    // yields null on empty/all-null input, and orders NaN ABOVE every
    // number — Spark's nan-max semantics, not Java's)
    var m = 0.0
    var mSet = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val a = math.abs(arr.getFloat(i).toDouble)
        if (!mSet || java.lang.Double.isNaN(a) ||
            (!java.lang.Double.isNaN(m) && a > m)) {
          m = a; mSet = true
        }
      }
      i += 1
    }
    // Spark's `m > 0` predicate treats NaN as greater than any number
    val mPositive = mSet && (java.lang.Double.isNaN(m) || m > 0)
    val q = new Array[Any](n)
    i = 0
    while (i < n) {
      q(i) =
        if (!mPositive) java.lang.Byte.valueOf(0: Byte)
        else if (arr.isNullAt(i)) null
        else {
          val v = arr.getFloat(i).toDouble * 127.0 / m
          // exact Spark round(double) semantics: NaN/Infinity pass through
          // unrounded (BigDecimal.valueOf would throw), else HALF_UP
          val r =
            if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) v
            else java.math.BigDecimal.valueOf(v)
              .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
          // Spark non-ANSI double→tinyint cast = Scala toByte
          java.lang.Byte.valueOf(r.toByte)
        }
      i += 1
    }
    val scale: Any = if (mSet) java.lang.Float.valueOf(m.toFloat) else null
    new GenericInternalRow(Array[Any](scale, new GenericArrayData(q)))
  }
}

/** struct(scale: float, q: array<tinyint>) int8 quantization of an
  * array<float> embedding — see [[QuantizeUtil.quantize]]. */
case class QuantizeInt8Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("quantize_int8 requires array<float>")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("scale", FloatType, nullable = true),
    StructField("q", ArrayType(ByteType, containsNull = true))))

  override def nullSafeEval(input: Any): Any =
    QuantizeUtil.quantize(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.QuantizeUtil.quantize($c);")

  override protected def withNewChildInternal(newChild: Expression)
      : QuantizeInt8Expr = copy(child = newChild)
}

object QuantizeInt8 {
  def quantize_int8(emb: Column): Column =
    shim.toColumn(QuantizeInt8Expr(shim.toExpression(emb)))
}
