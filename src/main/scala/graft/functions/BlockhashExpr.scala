package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types._

/** Hot loop for the 1-D payload blockhash, shared by interpreted eval and
  * generated code (same pattern as [[QuantizeUtil]] / [[ShingleHashUtil]]).
  *
  * Perceptual fingerprint of an opaque binary payload: the payload is
  * normalized onto a fixed grid of `blocks` contiguous byte ranges (byte
  * at 0-based offset b belongs to block ⌊b·B/n⌋ — the grid scales with
  * payload length, the 1-D analogue of image blockhash's pixel grid), and
  * fingerprint bit j is set iff block j's mean byte value exceeds the
  * payload's overall mean byte value. A re-encoded or lightly-edited copy
  * keeps its content at the same RELATIVE offsets, so block means — and
  * the bits — survive perturbations that break any exact hash of the
  * payload or of fixed-offset frames.
  *
  * Purely integer arithmetic: "mean_j > mean" is compared as
  * s_j·n > S·c_j (block sum × total count vs total sum × block count), so
  * there is no floating point anywhere and the fingerprint is
  * bit-replicable in the DuckDB oracle from hex(payload) byte values.
  * Exact while 255·n² < 2⁶³, i.e. payloads up to ~190 MB — far above any
  * row Spark would hold. Empty payloads fingerprint to 0L.
  */
object BlockhashUtil {

  def blockhash(bytes: Array[Byte], blocks: Int): Long = {
    // BlockhashExpr's constructor validates too, but this object is
    // public and spec-called directly — an unguarded blocks=64 would
    // silently wrap 1L << 63 negative and return a WRONG fingerprint,
    // not fail
    require(blocks >= 2 && blocks <= 62,
      s"blocks must be in [2, 62] (bit j = 1L << j must stay positive " +
        s"in a signed long), got $blocks")
    val n = bytes.length
    if (n == 0) return 0L
    val sums = new Array[Long](blocks)
    val cnts = new Array[Long](blocks)
    var total = 0L
    var i = 0
    while (i < n) {
      val j = (i.toLong * blocks / n).toInt
      val v = (bytes(i) & 0xFF).toLong
      sums(j) += v
      cnts(j) += 1
      total += v
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < blocks) {
      if (sums(j) * n > total * cnts(j)) fp |= 1L << j
      j += 1
    }
    fp
  }
}

/** `blockhash(payload, B)`: B-bit perceptual fingerprint (long) of a
  * binary column — see [[BlockhashUtil.blockhash]]. One O(n) codegen pass
  * per row, no shuffle, no UDF. */
case class BlockhashExpr(child: Expression, blocks: Int)
    extends UnaryExpression {

  require(blocks >= 2 && blocks <= 62,
    s"blocks must be in [2, 62] (bit j = 1L << j must stay positive " +
      s"in a signed long), got $blocks")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("blockhash requires a binary column")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    BlockhashUtil.blockhash(input.asInstanceOf[Array[Byte]], blocks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BlockhashUtil.blockhash($c, $blocks);")

  override protected def withNewChildInternal(newChild: Expression)
      : BlockhashExpr = copy(child = newChild)
}

object Blockhash {
  def blockhash(payload: Column, blocks: Int): Column =
    shim.toColumn(BlockhashExpr(shim.toExpression(payload), blocks))
}
