package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** q58 runs MLlib MinHashLSH purely as a stock-library comparison point
    * for the hand-rolled relational LSH (q32, ~16× faster); it is timed and
    * reported, but under its own key so the headline engine total tracks
    * engine queries. */
  private val ComparisonQueries = Set("q58_minhash_ml")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // noop sink: materializes EVERY output column (count() lets Catalyst
    // prune unreferenced projections, under-measuring projection-heavy
    // queries like string ops / casts / quantization)
    //
    // post-run cleanup: localCheckpoint-based operators (jaccard postings,
    // dup clusters, prefix index, curation pipeline) pin RDD blocks that
    // outlive their query — across 2×|queries| executions they accumulate
    // until the whole JVM degrades into GC/spill (measured: ~3× uniform
    // slowdown by the tail of the suite). A real pipeline runs one job per
    // JVM; the bench must not charge query N for query N−1's blocks.
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Unit =
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      finally {
        // in finally: a FAILED query must also release its blocks, or
        // the leak this cleanup exists to prevent comes back for the
        // remaining ~115 queries of both passes
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    // warm-up pass: codegen compilation, parquet footer caches, JIT — so
    // the recorded numbers reflect steady-state query cost
    SparkEntry.queries.foreach { case (_, fn) =>
      try run(fn) catch { case _: Throwable => }
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a failed query must NOT record its elapsed-to-crash as a normal
      // (smaller!) timing — mark it -1 so regressions can't read as wins
      val ok = try { run(fn); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // The harness keeps only a short tail of stdout, so the JSON line must
    // stay compact: per-query keys are shortened to their stable qNN prefix
    // (full-name mapping lives in SparkEntry.queries / BASELINE.md) and
    // timings rounded to ms. A 79-query map at full precision + full names
    // is ~2.5 KB and falls outside a 2 KB tail window — unparseable.
    def short(k: String): String = k.takeWhile(_ != '_')
    val collision = results.keys.groupBy(short).exists(_._2.size > 1)
    def keyOf(k: String): String = if (collision) k else short(k)
    // Locale.ROOT: f"%.3f" uses the JVM default locale, and a comma
    // decimal separator would corrupt the JSON line
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + keyOf(k) + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val failed = results.values.count(_ < 0)
    val engine = results
      .filter { case (k, v) => v >= 0 && !ComparisonQueries.contains(k) }
      .values.sum
    val comparison = results
      .filter { case (k, v) => v >= 0 && ComparisonQueries.contains(k) }
      .values.sum
    // "value" stays the engine-query total (the BASELINE.md anchor);
    // total_sec is the inclusive wall total so round-over-round consumers
    // comparing against pre-split totals aren't misled by q58's move to
    // mllib_comparison_sec.
    println(s"""{"metric":"engine_total","value":${fmt(engine)},"unit":"sec","queries":$qs,"mllib_comparison_sec":${fmt(comparison)},"total_sec":${fmt(engine + comparison)},"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
