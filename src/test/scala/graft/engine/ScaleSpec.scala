package graft.engine

import graft.SparkSpec
import graft.functions.WeightedMedian
import org.apache.spark.sql.functions._

/** Scale-mechanics specs: salted skew joins, bucketed co-located joins,
  * partition-pruned writes, the typed weighted-median Aggregator, and
  * persist/repartition surfaces (SURVEY.md §2.9, §7.3). */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin result set equals plain join (skew mitigation is " +
    "result-transparent)") {
    val left = (1 to 1000).map(i => (if (i % 10 == 0) 1L else i.toLong, i))
      .toDF("k", "v") // key 1 is hot
    val right = Seq((1L, "hot"), (2L, "a"), (3L, "b")).toDF("k", "name")
    val plain = left.join(right, Seq("k")).select("k", "v", "name")
      .collect().toSet
    val salted = Skew.saltedJoin(left, right, "k", 8)
      .select("k", "v", "name").collect().toSet
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("bucketed tables join without an exchange (co-located join)") {
    // warehouse dir is a static conf — set via javaOptions in build.sbt
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // clear orphaned locations from earlier aborted runs
    Seq("b_orders", "b_lineitem").foreach { t =>
      val p = java.nio.file.Paths.get(s"/tmp/graft-warehouse/$t")
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    Tables.orders(spark, sf0001)
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.lineitem(spark, sf0001)
      .withColumnRenamed("l_orderkey", "o_orderkey")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    // force the shuffle-join path (tiny test tables would broadcast and
    // bypass bucketing entirely) to show buckets replace the exchange
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), Seq("o_orderkey"))
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), p) // bucketing co-locates both sides
      assert(p.contains("SortMergeJoin"), p)
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partitionBy write enables partition pruning (PartitionFilters)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part")
      .toString + "/orders_by_status"
    Tables.orders(spark, sf0001)
      .write.partitionBy("o_orderstatus").mode("overwrite").parquet(dir)
    val pruned = spark.read.parquet(dir)
      .filter(col("o_orderstatus") === "F")
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(o_orderstatus"), p)
    assert(pruned.count() ==
      Tables.orders(spark, sf0001)
        .filter(col("o_orderstatus") === "F").count())
  }

  test("dynamic partition pruning fires on partitioned fact ⋈ filtered dim") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp")
      .toString + "/li_by_rf"
    Tables.lineitem(spark, sf0001)
      .write.partitionBy("l_returnflag").mode("overwrite").parquet(dir)
    val fact = spark.read.parquet(dir)
    // dim filtered on a NON-join column: the prunable partition set is only
    // known at runtime, so static filter propagation can't pre-empt DPP
    val dim = Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag").as("rf"), col("l_linestatus")).distinct()
      .filter(col("l_linestatus") === "F")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-join shape where DPP subqueries kick in
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
        "false")
      val joined = fact.join(dim, fact("l_returnflag") === dim("rf"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("dynamicpruningexpression"), p)
      val expected = Tables.lineitem(spark, sf0001).as("x")
        .join(dim, col("x.l_returnflag") === dim("rf")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
        "true")
    }
  }

  test("bloom semi-join pruning: no false negatives, real pruning, " +
    "exact result") {
    val keys = (1L to 100L).map(k => k * 7).toDF("k")
    val facts = (1L to 5000L).map(v => (v, v % 1000)).toDF("fk", "payload")
    val bf = graft.functions.Bloom.bloomOf(keys, "k", 1000L, 8192L)
    val pruned = facts
      .filter(graft.functions.Bloom.might_contain(bf, col("fk")))
    val exact = facts.join(keys, col("fk") === col("k"), "left_semi")
      .select("fk").as[Long].collect().toSet
    val prunedKeys = pruned.select("fk").as[Long].collect().toSet
    // the sketch may keep extra rows (false positives) but NEVER drops a
    // true match — the verifying join then restores exactness
    assert(exact.subsetOf(prunedKeys))
    assert(prunedKeys.size < 5000, "bloom pruned nothing")
    val verified = pruned.join(keys, col("fk") === col("k"), "left_semi")
      .select("fk").as[Long].collect().toSet
    assert(verified == exact)
  }

  test("bloom sketch and verifying join over the SAME DataFrame: " +
    "shared expression IDs across the subquery boundary stay legal") {
    // Regression guard for the Bloom.bloomOf invariant: the sketch
    // subquery embeds the analyzed plan of `keys` while the SAME `keys`
    // instance is also the right side of the verifying semi-join, so both
    // plans share attribute IDs and only analyzer deduplication keeps the
    // query well-formed. If a Spark upgrade stops re-instancing them this
    // test fails at analysis time.
    val keys = (1L to 100L).map(k => k * 7).toDF("k")
    val facts = (1L to 5000L).map(v => (v, v % 1000)).toDF("fk", "payload")
    val bf = graft.functions.Bloom.bloomOf(keys, "k", 1000L, 8192L)
    val verified = facts
      .filter(graft.functions.Bloom.might_contain(bf, col("fk")))
      .join(keys, col("fk") === col("k"), "left_semi")
      .select("fk").as[Long].collect().toSet
    val exact = facts.join(keys, col("fk") === col("k"), "left_semi")
      .select("fk").as[Long].collect().toSet
    assert(verified == exact)
  }

  test("WeightedMedian Aggregator: exact, weight-aware, merge-stable") {
    // unweighted: lower median of 1..4 = 2
    val unweighted = Seq((1.0, 1.0), (2.0, 1.0), (3.0, 1.0), (4.0, 1.0))
      .toDS().repartition(3).select(WeightedMedian.asColumn).head()
    assert(unweighted == 2.0)
    // heavy weight drags the median
    val weighted = Seq((1.0, 1.0), (2.0, 1.0), (10.0, 10.0))
      .toDS().repartition(3).select(WeightedMedian.asColumn).head()
    assert(weighted == 10.0)
    // matches percentile_approx-free exact check on larger data
    val vals = (1 to 101).map(i => (i.toDouble, 1.0))
    val med = vals.toDS().repartition(7)
      .select(WeightedMedian.asColumn).head()
    assert(med == 51.0)
  }

  test("persist/unpersist and repartition surfaces (C1-C4)") {
    val df = Tables.lineitem(spark, sf0001)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assert(df.count() == df.count()) // second count hits the cache
    assert(df.storageLevel.useMemory)
    val rep = df.repartition(4)
    assert(rep.rdd.getNumPartitions == 4)
    df.unpersist(blocking = true)
    assert(!df.storageLevel.useMemory)
  }

  test("skewProfile: heaviest keys first, skew = count/mean by hand") {
    // keys: a×6, b×2, c×1 → mean 3; skew(a)=2, ties broken by key
    val d = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq("c")).toDF("k")
    val out = Skew.skewProfile(d, "k", topK = 2)
      .as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(("a", 6L, 2.0), ("b", 2L, BigDecimal(2.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }
}
