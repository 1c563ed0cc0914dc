package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SURVEY.md scale contract): salting
  * splits each hot key into `saltFactor` sub-keys — the left (large, skewed)
  * side gets a random-but-deterministic salt from a row hash, the right
  * side is replicated once per salt value. Result set is identical to the
  * unsalted join; the shuffle partitions carrying hot keys shrink by
  * ~saltFactor.
  *
  * AQE's runtime skew-join splitting (`spark.sql.adaptive.skewJoin`)
  * handles most cases without code changes; explicit salting remains the
  * tool when a single logical key exceeds what one task can hold (e.g. a
  * null-heavy or celebrity key at 100 TB). */
object Skew {

  /** Scale-adaptive map fan-out (round-18 optimization; guide §2.5
    * "input skew — one huge unsplittable file: repartition immediately
    * after the read", §2 "derive partitioning from input size"): when a
    * frame's planned partition count is BELOW the session's default
    * parallelism — the single-row-group/unsplittable-input case, where
    * every downstream map operator (shingle explode, fingerprint
    * codec, replicate explode, deletion-neighborhood generation) runs
    * on one core regardless of cluster width — insert one round-robin
    * repartition to the default parallelism. At production scale the
    * scan has orders of magnitude more splits than cores, the
    * condition is false, and this is a NO-OP (no exchange added): the
    * knob derives from input shape at plan time, it is not a constant
    * tuned for any one deployment. Callers project to the needed
    * columns FIRST (guide §2.3: project before the exchange) so the
    * fan-out shuffle carries only what the map work consumes.
    * Row-level results are order-independent at every call site
    * (grouped/sorted/exact-decimal downstream), so the repartition
    * cannot move a hash. */
  def fanOut(df: DataFrame): DataFrame = {
    // dev A/B switch (also the production escape hatch the
    // optimization-round contract asks for: scale-dependent behavior
    // stays parameterised rather than hard-coded)
    if (sys.env.contains("SPARK_GRAFT_FANOUT_DISABLE")) return df
    // a streaming frame has no planned partition count to probe (.rdd
    // is illegal on it) and its micro-batch parallelism is the source
    // rate's concern — pass it through untouched so shared kernels
    // (mediaTable, postings) stay usable from the streaming twins
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Inner equi-join `left ⋈ right` on `key` with the left side salted.
    * `right` must be the smaller side (it is replicated ×saltFactor). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    // salt from a row hash rather than rand(): any salt value yields the
    // same join result (right side is replicated for every salt), and a
    // hash keeps task retries idempotent where rand() would not
    val salted = left.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()),
        lit(saltFactor)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Key-skew diagnostic: the `topK` heaviest keys with each key's count
    * and its skew factor (count / mean count over all keys) — the number
    * that decides whether a join needs [[saltedJoin]] or AQE's skew split
    * suffices. One hash-agg on the key (|keys| rows out), a broadcast
    * scalar for the mean, TakeOrdered for the top-K. */
  def skewProfile(df: DataFrame, keyCol: String, topK: Int): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val mean = counts.agg(
      (sum(col("n")).cast("double") / count(lit(1))).as("mean_n"))
    counts.crossJoin(broadcast(mean))
      .withColumn("skew", round(col("n") / col("mean_n"), 6))
      .select(col(keyCol), col("n"), col("skew"))
      .orderBy(col("n").desc, col(keyCol))
      .limit(topK)
  }
}
