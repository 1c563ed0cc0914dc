package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's hot scalar kernels
  * (SURVEY.md §7.3 / builder contract: custom `Expression` with codegen
  * beats higher-order-function lambdas, which evaluate interpreted).
  *
  * Both expressions are drop-in replacements for compositions of built-ins
  * (`zip_with`+`aggregate`, `split`+`aggregate`) with IDENTICAL semantics —
  * same fold order, same arithmetic — so DuckDB oracle parity is preserved
  * bit-for-bit while the inner loop runs as generated Java inside
  * whole-stage codegen instead of per-element interpreted lambda calls.
  */

/** Cosine similarity of two float-array columns, computed in double in one
  * pass (dot, |a|², |b|² accumulated component-wise in index order).
  * Returns null on null/length-mismatched inputs, null elements, or zero
  * norms — matching `when(den > 0, dot/den)` over sequential folds (which
  * null-propagates through `acc + null`). */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("cosine_sim requires two array<float> arguments")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      // null elements null-propagate, matching the zip_with+aggregate
      // lambda form (acc + null = null) — getFloat on a null slot would
      // otherwise read garbage and yield an arbitrary similarity
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den > 0) java.lang.Double.valueOf(dot / den) else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val den = ctx.freshName("den")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  int $n = $x.numElements();
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |    } else {
         |      double $xi = (double) $x.getFloat($i);
         |      double $yi = (double) $y.getFloat($i);
         |      $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    double $den = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |    if ($den > 0) { ${ev.value} = $dot / $den; }
         |    else { ${ev.isNull} = true; }
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

/** Polynomial rolling hash of a string's code points:
  * h = fold(31·h + codePoint) mod 1e9+7 — identical to
  * `aggregate(split(s, ""), 0L, (acc, ch) => (acc*31 + ascii(ch)) % P)`
  * and to the DuckDB oracle's list_reduce over ord(). */
case class PolyHashExpr(child: Expression) extends UnaryExpression {

  final val Prime = 1000000007L

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("poly_hash requires a string argument")
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % Prime
      i += Character.charCount(cp)
    }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      val cp = ctx.freshName("cp"); val h = ctx.freshName("h")
      s"""
         |String $s = $c.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $h = ($h * 31L + $cp) % ${Prime}L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : PolyHashExpr = copy(child = newChild)
}

/** Per-row helper for [[ArrayTopCountExpr]] — kept as a static method so
  * generated code can call it (same pattern as ShingleHashUtil). */
object ArrayTopCountUtil {
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n == 0) return 0L
    val m = new java.util.HashMap[java.lang.Long, Array[Int]](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      // null ELEMENTS are ignored, not read as 0 — getLong on a null
      // slot would silently merge nulls with real zeros
      if (!arr.isNullAt(i)) {
        val v: java.lang.Long = arr.getLong(i)
        var slot = m.get(v)
        if (slot == null) { slot = Array(0); m.put(v, slot) }
        slot(0) += 1
        if (slot(0) > best) best = slot(0)
      }
      i += 1
    }
    best.toLong
  }
}

/** Maximum element multiplicity of an array<long> — the per-row kernel
  * behind repetition statistics (top-bigram fraction): O(n) with one
  * hashmap per row, replacing an explode → groupBy → max that would
  * shuffle every n-gram of the corpus. Equivalent (spec-asserted) to
  * `array_max(transform(array_distinct(a), x -> size(filter(a, _ = x))))`,
  * which evaluates interpreted AND is quadratic per row. Null elements
  * are ignored (not counted as a value). */
case class ArrayTopCountExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("array_top_count requires array<long>")
    }
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    ArrayTopCountUtil.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ArrayTopCountUtil.compute($c);")

  override protected def withNewChildInternal(newChild: Expression)
      : ArrayTopCountExpr = copy(child = newChild)
}

/** Squared Euclidean distance of two numeric-array columns, accumulated
  * component-wise in index order in double — bit-identical to the
  * `aggregate(zip_with(a, b, (x,y) => (x−y)·(x−y)), 0.0, +)` lambda form
  * (same fold order, same IEEE adds) and to the DuckDB oracle's
  * list_reduce, but the inner loop is generated Java inside whole-stage
  * codegen instead of ~4 interpreted lambda frames per element. Sits on
  * the engine's hottest vector paths: Gonzalez k-center rounds, cell
  * assignment, PQ/ADC distance tables. Element types may be float or
  * double independently per side (Lloyd's exact-decimal means come back
  * as array<double> while the corpus stays array<float>). Null element,
  * null side, or length mismatch → null, exactly like the padded
  * zip_with; empty arrays → 0.0. */
case class SqDistExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression) = e.dataType match {
    case ArrayType(t, _) => t
    case _ => null
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(e => elemType(e) match {
      case FloatType | DoubleType => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        "sq_dist requires two array<float|double> arguments")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def get(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val (tl, tr) = (elemType(left), elemType(right))
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = get(x, i, tl) - get(y, i, tr)
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    def getter(v: String, i: String, t: DataType) = t match {
      case FloatType => s"(double) $v.getFloat($i)"
      case _ => s"$v.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  int $n = $x.numElements();
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |    } else {
         |      double $d = ${getter(x, i, elemType(left))}
         |        - ${getter(y, i, elemType(right))};
         |      $acc += $d * $d;
         |    }
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistExpr =
    copy(left = newLeft, right = newRight)
}

object expressions {
  /** Column wrapper: cosine similarity of two array<float> columns. */
  def cosine_sim(a: Column, b: Column): Column =
    shim.toColumn(
      CosineSimExpr(shim.toExpression(a), shim.toExpression(b)))

  /** Column wrapper: squared Euclidean distance (float/double arrays). */
  def sq_dist(a: Column, b: Column): Column =
    shim.toColumn(
      SqDistExpr(shim.toExpression(a), shim.toExpression(b)))

  /** Column wrapper: polynomial rolling string hash mod 1e9+7. */
  def poly_hash(c: Column): Column =
    shim.toColumn(PolyHashExpr(shim.toExpression(c)))

  /** Column wrapper: max element multiplicity of an array<long> column. */
  def array_top_count(c: Column): Column =
    shim.toColumn(ArrayTopCountExpr(shim.toExpression(c)))
}
