package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types._

/** Hot loop for content-defined chunking (CDC — the LBFS/storage-dedup
  * classic), shared by interpreted eval and generated code.
  *
  * A rolling Horner hash over a `window`-byte sliding window picks chunk
  * boundaries CONTENT-dependently: a cut lands after byte i whenever
  * H(i) = Horner₃₁(bytes[i−w+1 .. i]) mod 1e9+7 ≡ 0 (mod `divisor`), so
  * the expected chunk length is `divisor` bytes. Because boundaries
  * depend only on LOCAL content, inserting or deleting bytes re-chunks
  * only the neighborhood of the edit and every later chunk keeps its
  * hash — the shift resistance that fixed-offset frames (q59) and
  * whole-payload hashes (q226/q237) fundamentally lack, and the reason
  * CDC is the partial-content dedup primitive for byte streams at scale.
  *
  * Arithmetic contract (oracle-replicable): the window hash is Horner
  * WITHOUT intermediate mods — max Σ 255·31^t, t < w, which fits a long
  * for w ≤ 12 (the require below) — then one `% 1e9+7 % divisor`; each
  * chunk's hash is the same left fold as [[graft.ext.TextOps.polyHash]]
  * ((acc·31 + byte) mod 1e9+7, seed 0), which DuckDB replays as
  * `list_reduce` (first-element seeding equals the zero seed because
  * 0·31 + b₀ = b₀). Pure integer arithmetic end to end.
  */
object CdcChunkUtil {

  private val P = 31L
  private val M = 1000000007L // TextOps.HashPrime, inlined for codegen

  /** Returns array<struct<off int, len int, hash long>> tiling
    * [0, bytes.length) exactly; empty payload → empty array. */
  def chunks(bytes: Array[Byte], window: Int, divisor: Int): ArrayData = {
    // CdcChunksExpr's constructor validates too (fails at expression
    // construction, not inside a Spark task), but this object is public
    // and spec-called directly — an unguarded window=16 would silently
    // overflow the no-mod Horner and return WRONG hashes, not fail
    require(window >= 2 && window <= 12,
      s"window must be in [2, 12] (no-mod Horner fits a long), got $window")
    require(divisor >= 2, s"divisor must be >= 2, got $divisor")
    val n = bytes.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0
    def emit(endExclusive: Int): Unit = {
      var h = 0L
      var j = start
      while (j < endExclusive) {
        h = (h * P + (bytes(j) & 0xFF)) % M
        j += 1
      }
      out += new GenericInternalRow(
        Array[Any](start, endExclusive - start, h))
      start = endExclusive
    }
    // TRUE rolling window hash: maintain hw = Horner31(bytes[i-w+1..i])
    // with the subtract-leading-term update
    //   hw' = (hw − b_out·31^(w−1))·31 + b_in
    // instead of recomputing the w-byte Horner at every position
    // (O(n) vs the previous O(n·w)). Subtract-BEFORE-multiply keeps the
    // running value within the cold-recompute bound 255·Σ_{t<w} 31^t
    // (≈6.7e18 < Long.Max for w = 12); the multiply-then-subtract order
    // would transiently hash w+1 bytes and overflow. Window hashes are
    // bit-identical to the per-position recompute (ExpressionsSpec
    // bit-parity pins this), so boundaries — and every chunk hash —
    // are unchanged.
    val pw1 = { // 31^(window−1)
      var p = 1L; var t = 1
      while (t < window) { p *= P; t += 1 }
      p
    }
    var hw = 0L
    var i = 0
    while (i < n) {
      val bi = bytes(i) & 0xFF
      hw = if (i < window) hw * P + bi
           else (hw - (bytes(i - window) & 0xFF) * pw1) * P + bi
      if (i >= window - 1 && hw % M % divisor == 0) emit(i + 1)
      i += 1
    }
    if (start < n) emit(n)
    new GenericArrayData(out.toArray)
  }
}

/** `cdc_chunks(payload, w, d)`: content-defined chunk list of a binary
  * column — see [[CdcChunkUtil.chunks]]. One O(n) codegen pass per row
  * (true rolling window hash, w ≤ 12), no shuffle, no UDF. */
case class CdcChunksExpr(child: Expression, window: Int, divisor: Int)
    extends UnaryExpression {

  require(window >= 2 && window <= 12,
    s"window must be in [2, 12] (no-mod Horner fits a long), got " +
      s"$window")
  require(divisor >= 2, s"divisor must be >= 2, got $divisor")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("cdc_chunks requires a binary column")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("off", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("hash", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CdcChunkUtil.chunks(input.asInstanceOf[Array[Byte]], window, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CdcChunkUtil.chunks($c, $window, " +
        s"$divisor);")

  override protected def withNewChildInternal(newChild: Expression)
      : CdcChunksExpr = copy(child = newChild)
}

object CdcChunks {
  def cdc_chunks(payload: Column, window: Int, divisor: Int): Column =
    shim.toColumn(CdcChunksExpr(shim.toExpression(payload), window,
      divisor))
}
