package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch as a mergeable
  * `TypedImperativeAggregate` — the third sketch family next to HLL
  * (distinct, q56) and GK (quantiles, q43): a fixed `k`-counter summary
  * whose candidate set is guaranteed to contain EVERY item with frequency
  * > n/(k+1), in one pass and O(k) memory per partial.
  *
  * Mergeability (the 100 TB property): partials combine pointwise, then
  * subtracting the (k+1)-th largest count restores the size bound while
  * keeping the additive-error guarantee ≤ n/(k+1) (Agarwal et al.,
  * "Mergeable Summaries", PODS 2012 — public). Map-side partials are
  * therefore exact-size KB blobs regardless of input rows, the same
  * contract as Spark's own datasketches aggregates.
  *
  * The candidate SET depends on merge order (counts are estimates), so
  * the sketch output itself is not oracle-stable — the registered query
  * (q90) recounts the ≤ k candidates exactly in a second pass and filters
  * by true count, making the final heavy-hitter list EXACT and
  * partitioning-invariant (the standard sketch-prefilter → exact-recount
  * top-k pattern).
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0, s"misra_gries capacity must be positive, got $k")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("misra_gries requires a string argument")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf // nulls carry no frequency mass
    val key = v.asInstanceOf[UTF8String].toString
    buf.get(key) match {
      case Some(c) => buf(key) = c + 1L
      case None if buf.size < k => buf(key) = 1L
      case None =>
        // classic decrement-all: each pass retires ≥ k units of count
        // mass while the stream adds 1/row, so across n rows this O(k)
        // branch runs ≤ n/k times — amortized O(1) per row
        val keys = buf.keysIterator.toArray
        var i = 0
        while (i < keys.length) {
          val c = buf(keys(i))
          if (c == 1L) buf.remove(keys(i)) else buf(keys(i)) = c - 1L
          i += 1
        }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (key, c) =>
      buf(key) = buf.getOrElse(key, 0L) + c
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from every counter: ≤ k
      // survive (only counts strictly above the pivot stay positive) and
      // the total error stays ≤ (n₁+n₂)/(k+1) — Mergeable Summaries §3
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val pivot = counts(counts.length - 1 - k)
      val keys = buf.keysIterator.toArray
      var i = 0
      while (i < keys.length) {
        val c = buf(keys(i)) - pivot
        if (c <= 0L) buf.remove(keys(i)) else buf(keys(i)) = c
        i += 1
      }
    }
    buf
  }

  /** Candidates sorted lexically — deterministic for a GIVEN buffer; the
    * set itself is merge-order-dependent (see class doc). */
  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keysIterator.toArray.sorted.map(UTF8String.fromString))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) =>
      val b = key.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf(new String(b, StandardCharsets.UTF_8)) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
}

object FreqItems {

  /** Column wrapper: Misra–Gries candidate set (`array<string>`, ≤ k
    * items, superset of all items with frequency > n/(k+1)). */
  def mg_candidates(c: Column, k: Int): Column =
    shim.toColumn(MisraGriesAgg(shim.toExpression(c), k).toAggregateExpression())
}
