package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Band (interval-containment) join WITHOUT an equi-key — `point ∈
  * [lo, hi]` — via bucketing: Spark plans a raw non-equi join as a
  * BroadcastNestedLoopJoin (or cartesian), the classic 100 TB
  * scale-killer. Quantizing the value axis into `width`-sized buckets
  * turns it into an equi-join: each interval explodes to the buckets it
  * overlaps (≈ (hi−lo)/width + 1 rows), each point maps to exactly ONE
  * bucket, so every qualifying pair meets in exactly one bucket — the
  * exact range predicate then filters, and no dedupe is needed.
  *
  * Pick `width` ≈ the typical interval length: wider wastes the exact
  * filter on non-matches, narrower multiplies the interval side's
  * explode factor. Skew note: a bucket holding f_p points and f_i
  * interval rows joins f_p·f_i — bucket width is also the skew dial, and
  * AQE skew-join splitting applies to the shuffled join as usual.
  *
  * A bloom prefilter (built over the exploded interval buckets, probed
  * by each point's bucket) drops points whose bucket matches no interval
  * BEFORE the shuffle — at high point:interval ratios that is most of
  * the fact table. Exactness is unaffected (bloom has no false
  * negatives; false positives fall to the inner join).
  */
object BandJoin {

  /** Join `points` (value column `pointCol`) to `intervals` (columns
    * `loCol`, `hiCol`) where `pointCol ∈ [loCol, hiCol]`. Column names
    * must be unambiguous across the two sides. Intervals with
    * `lo > hi` match nothing (BETWEEN semantics).
    *
    * `bloomItems`/`bloomBits` size the prefilter sketch and MUST track
    * the interval side's distinct-bucket count: an undersized sketch
    * saturates (false-positive rate → 1) and the prefilter degrades to
    * pure overhead — it also costs one extra scan+explode of the
    * interval side (the scalar-subquery aggregate), so turn
    * `bloomPrune` off when the interval side is broadcast-small (the
    * join then prunes map-side for free). */
  def join(points: DataFrame, pointCol: String, intervals: DataFrame,
      loCol: String, hiCol: String, width: Double,
      bloomPrune: Boolean = true, bloomItems: Long = 1000000L,
      bloomBits: Long = 1L << 23): DataFrame = {
    require(width > 0, s"band width must be positive, got $width")
    val iv = intervals.filter(col(loCol) <= col(hiCol))
      .withColumn("__bucket", explode(sequence(
        floor(col(loCol) / width).cast("long"),
        floor(col(hiCol) / width).cast("long"))))
    val pts0 = points.withColumn("__bucket",
      floor(col(pointCol) / width).cast("long"))
    val pts =
      if (bloomPrune) {
        val bf = graft.functions.Bloom.bloomOf(
          iv.select("__bucket"), "__bucket", bloomItems, bloomBits)
        pts0.filter(graft.functions.Bloom.might_contain(bf, col("__bucket")))
      } else pts0
    pts.join(iv, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
