package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve key: interleaves the low `bits` of two
  * non-negative integer columns so that rows close in BOTH dimensions
  * land close on the 1-D sort key — the standard lakehouse layout trick
  * for multi-column min/max data skipping (sorting by (a, b) clusters
  * only on `a`; sorting by z(a, b) clusters on both, so per-file min/max
  * ranges stay tight for predicates on either column).
  *
  * Built as a plain codegen expression tree (2·bits shift/mask/or terms —
  * no UDF, no loop): `zValue` stays inside WholeStageCodegen. At scale
  * the layout op is `repartitionByRange(z).sortWithinPartitions(z)` +
  * write: range partitioning gives equal-sized files, the within-file
  * sort gives tight per-file z ranges.
  */
object ZOrder {

  /** Morton key of `x`, `y` using their low `bits` bits each (caller
    * clamps/normalizes; values must be non-negative). Inputs are cast to
    * long BEFORE shifting: on an int column, bits ≥ 16 would shift past
    * 31 (Java wraps shift counts mod 32) and overflow the sum — the key
    * would silently collide across distant points. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { i =>
      val xb = shiftleft(shiftright(xl, i).bitwiseAND(1L), 2 * i)
      val yb = shiftleft(shiftright(yl, i).bitwiseAND(1L), 2 * i + 1)
      xb + yb
    }.reduce(_ + _)
  }
}
