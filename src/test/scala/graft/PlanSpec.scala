package graft

import graft.engine.Tables
import org.apache.spark.sql.functions._

/** Physical-plan shape assertions (SURVEY.md §4.1): the optimizations the
  * engine relies on at 100 TB must actually appear in the plan — pushdown,
  * pruning, broadcast joins, distributed top-k, partial aggregation,
  * whole-stage codegen — so a regression that silently de-optimizes a
  * query fails CI, not a cluster run. */
class PlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter + projection push into the parquet scan") {
    val df = Tables.lineitem(spark, sf0001)
      .filter(col("l_quantity") > 30)
      .select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), " +
      "GreaterThan(l_quantity,30.0)]"), scan)
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint," +
      "l_quantity:double>"), scan)
  }

  test("flagship q01: dim join is broadcast, no shuffle of the fact side") {
    val p = plan(Queries.flagshipCategoryTopK(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("orderBy + limit compiles to distributed TakeOrderedAndProject") {
    val df = Tables.lineitem(spark, sf0001)
      .groupBy("l_suppkey").count()
      .orderBy(col("count").desc).limit(5)
    assert(plan(df).contains("TakeOrderedAndProject"), plan(df))
  }

  test("groupBy count uses partial (map-side) aggregation") {
    val df = Tables.lineitem(spark, sf0001).groupBy("l_returnflag").count()
    val p = plan(df)
    assert(p.contains("HashAggregate"), p)
    // partial + final pair around the exchange
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("count-encode left join broadcasts the count side") {
    val cust = Tables.customer(spark, sf0001)
    val ords = Tables.orders(spark, sf0001)
      .select(col("o_custkey").as("c_custkey"))
    val p = plan(graft.engine.Density.attachCount(cust, ords,
      "c_custkey", "n_orders"))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("ANN brute force: no CartesianProduct, query side broadcast") {
    val emb = Tables.embeddings(spark, sf0001)
    val p = plan(graft.ext.SimSearch.bruteForceTopK(
      emb, emb.filter(col("vec_id") < 3), 5))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("native expressions run inside WholeStageCodegen") {
    val emb = Tables.embeddings(spark, sf0001)
    val df = emb.select(graft.functions.expressions
      .cosine_sim(col("embedding"), col("embedding")).as("c"))
    // "*(n)" marks operators inside a WholeStageCodegen stage
    val p = plan(df)
    assert(p.contains("*(1) Project [cosinesimexpr"), p)
  }

  test("rollup computes all granularities in one Expand, not N scans") {
    val p = plan(graft.engine.Aggregates.rollupCounts(
      Tables.lineitem(spark, sf0001), Seq("l_returnflag", "l_linestatus")))
    assert(p.contains("Expand"), p)
    assert("FileScan".r.findAllIn(p).length == 1, p)
  }

  test("bloom semi-join: might_contain filters the fact BEFORE the join") {
    val li = Tables.lineitem(spark, sf0001)
    val hot = Tables.part(spark, sf0001).filter(col("p_size") >= 45)
      .select("p_partkey")
    val bf = graft.functions.Bloom.bloomOf(hot, "p_partkey", 1000L, 8192L)
    val pruned = li.filter(graft.functions.Bloom.might_contain(bf,
        col("l_partkey")))
      .join(hot, li("l_partkey") === hot("p_partkey"), "left_semi")
    val p = plan(pruned)
    // the probe must sit on the scan side, below the join
    val joinIdx = p.indexOf("Join")
    val probeIdx = p.indexOf("might_contain")
    assert(probeIdx >= 0, p)
    assert(joinIdx >= 0 && joinIdx < probeIdx,
      s"probe not below the join:\n$p") // plan prints top-down
  }

  test("q127 priority sample runs through GroupTopK bounded heaps, " +
    "not a full-corpus window sort") {
    val p = plan(graft.ext.PipelineOps.prioritySample(
      Tables.documents(spark, sf0001), "source", "doc_id", "n_chars", 5))
    // selection = partial/final bounded heaps; the Window (printed ABOVE
    // its child in the tree) only ranks the ≤ (k+1)-per-group survivors
    // that GroupTopKFinal emits
    assert(p.contains("GroupTopKPartial"), p)
    assert(p.contains("GroupTopKFinal"), p)
    val windowAt = p.indexOf("+- Window")
    val finalAt = p.indexOf("GroupTopKFinal")
    assert(windowAt >= 0 && finalAt > windowAt,
      s"Window should consume GroupTopKFinal output\n$p")
  }

  test("q128 unigram scoring broadcasts the model back; the token " +
    "stream never shuffles on the token") {
    val p = plan(graft.ext.TextOps.unigramNll(
      Tables.documents(spark, sf0001), "doc_id", "text"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q60 pair dedupe is a hash aggregate over scalars, not a sort " +
    "aggregate over arrays") {
    val p = plan(graft.ext.SimSearch.cosineNearDupPairsLsh(
      Tables.embeddings(spark, sf0001).select("vec_id", "embedding"),
      threshold = 0.25, bits = 16, tables = 4))
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("SortAggregate"), p)
  }

  test("time-split filters prune via the pushed predicate") {
    val (train, _) = graft.engine.Sampling.timeSplit(
      Tables.orders(spark, sf0001), col("o_orderdate"), 1998)
    assert(plan(train).contains("PushedFilters"), plan(train))
  }

  test("global orderBy is a distributed range-partitioned sort") {
    // total order must come from RangePartitioning (sampled bounds,
    // parallel sort), never a single-partition sort
    val df = Tables.lineitem(spark, sf0001).orderBy("l_extendedprice")
    val p = plan(df)
    assert(p.contains("rangepartitioning(l_extendedprice"), p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("partitioned sink read-back prunes to the filtered partition") {
    // the q92 shape: a partition-key equality must become a
    // PartitionFilter (directory pruning), NOT a data filter
    val tmpDir = java.nio.file.Files.createTempDirectory("graft_part_spec")
    val tmp = tmpDir.toAbsolutePath.toString
    try {
      Tables.documents(spark, sf0001)
        .write.mode("overwrite").partitionBy("source").parquet(tmp)
      val df = spark.read.parquet(tmp).filter(col("source") === "src3")
        .groupBy("lang").count()
      val p = plan(df)
      assert(p.contains("PartitionFilters") &&
        p.replaceAll("\\s+", " ").matches(
          "(?s).*PartitionFilters: \\[[^\\]]*src3[^\\]]*\\].*"), p)
      // the key filter must not appear as a pushed DATA filter
      assert(!p.contains("PushedFilters: [IsNotNull(source)"), p)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmpDir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("prefix-filter jaccard: every join is an equi-join (no " +
    "nested-loop/cartesian), pair candidates hash-aggregate") {
    val p = plan(graft.ext.Dedup.prefixJaccardPairs(
      Tables.documents(spark, sf0001), "doc_id", "text", 4, 0.8))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("sourceOverlap: distinct runs BEFORE the self-join (the join " +
    "input is the deduplicated key space)") {
    val p = plan(graft.ext.PipelineOps.sourceOverlap(
      Tables.documents(spark, sf0001), "source",
      graft.ext.Dedup.simhash32(col("text"))))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // two distinct aggregates (one per join side) below the join
    assert(p.split("HashAggregate").length - 1 >= 2, p)
  }

  test("fuzzy edit-distance join: deletion-variant equi-join, never a " +
    "cartesian/nested-loop; pair dedupe is a hash aggregate") {
    val p = plan(graft.ext.Dedup.editDistancePairs(
      Tables.supplier(spark, sf0001), "s_suppkey", "s_name"))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("levenshtein"), p) // verify stays in the plan
  }

  test("payload near-dup (q237): blockhash is a codegen projection, " +
    "banding is an equi-join — never a cartesian/nested-loop on the " +
    "payloads; the Hamming verify survives in the plan") {
    val p = plan(ExtQueries.all("q237_payload_neardup")(spark, sf0001))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("blockhash"), p) // the native kernel, not a UDF
    // the round-13 REAL container decode composes as a second codegen
    // scalar in the same projection — no UDF, no typed round-trip, no
    // extra exchange anywhere in the plan
    assert(p.contains("wavsamples"), p)
    assert(p.contains("bit_count"), p) // exact verify stays in-plan
  }

  test("upsert-delta feed (q261): MAP-ONLY — blockhash + the postings " +
    "explode live in scan-stage projections with no join and no " +
    "aggregate anywhere; the only exchange is the output sort (what " +
    "makes the streaming twin stateless end to end)") {
    val p = plan(ExtQueries.all("q261_stream_upsert_feed")(spark, sf0001))
    assert(!p.contains("Join"), p)
    assert(!p.contains("HashAggregate"), p)
    assert(p.contains("blockhash"), p) // the native kernel, not a UDF
    // exactly one HASH/RANGE exchange: the deterministic output
    // ordering. A conditional round-robin fan-out below the container
    // encode (round-18, Skew.fanOut in mediaTable — absent at
    // production scan widths) is tolerated: it carries no key, no
    // state, and does not change the map-only/stateless claim under
    // test
    assert(p.sliding("Exchange range".length)
      .count(_ == "Exchange range") == 1, p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("incremental dedup (q238): the batch merge is ONE sh-keyed join " +
    "against the PERSISTED index scratch (corpus text never rescanned); " +
    "no cartesian anywhere") {
    val df = ExtQueries.all("q238_incremental_dedup")(spark, sf0001)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // since round 10 the index comes from the sharedExactState family's
    // parquet (q238 owns the build); the corpus-side documents scan is
    // gone from the per-query plan — only the scratch read remains
    assert(p.contains("graft_exidx_"), p)
    // the former column-pruning pin (documents scan reads only
    // (doc_id, text)) still holds where an index IS built inline —
    // asserted on q247's plan below
  }

  test("CDC dedup (q241): chunking is the native cdc_chunks kernel in " +
    "the scan stage; candidates come from the grouped index — no " +
    "cartesian/nested-loop anywhere") {
    val p = plan(ExtQueries.all("q241_cdc_dedup")(spark, sf0001))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the full query's plan truncates at keyCandidates' localCheckpoint
    // (Scan ExistingRDD), so pin the native kernel on the chunking
    // projection itself: one scan-stage expression, no UDF
    val chunk = plan(graft.ext.Multimodal.mediaTable(
        Tables.documents(spark, sf0001))
      .select(graft.ext.Multimodal.cdcChunks(col("payload")).as("c")))
    assert(chunk.toLowerCase.contains("cdcchunks"), chunk)
    assert(!chunk.contains("BatchEvalPython") &&
      !chunk.toLowerCase.contains("udf"), chunk)
  }

  test("incremental LSH (q242): band-key and shingle joins are all " +
    "equi-joins — no cartesian/nested-loop anywhere") {
    val p = plan(ExtQueries.all("q242_incremental_lsh")(spark, sf0001))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("cluster upsert (q243): all joins equi — no cartesian/" +
    "nested-loop anywhere (the iterative part ran on the contracted " +
    "label graph before this plan; its output enters as a checkpoint " +
    "scan)") {
    val p = plan(ExtQueries.all("q243_cluster_upsert")(spark, sf0001))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("ingestion flags (q244): batch plan is relational (two " +
    "hash-aggs, no per-row array math) with no cartesian/nested-loop; " +
    "the STREAMING variant carries the sorted-runs projection that " +
    "keeps its plan single-stateful") {
    val df = ExtQueries.all("q244_streaming_flags")(spark, sf0001)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("array_sort"), p) // bulk path: aggs, not arrays
    // the streaming variant's plan (built on a static frame with a ts
    // column — grouping keys and counting strategy are what differ):
    // ONE aggregation between the index join and the candidate
    // explode, candidate counts via array_sort runs. The wide Project
    // truncates in toString, so check formatted mode.
    val docs = Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 5 === 3)
      .withColumn("ts", timestamp_seconds(lit(1704067200L) +
        col("doc_id")))
    val index = graft.ext.Dedup.corpusShingleIndex(
      Tables.documents(spark, sf0001).filter(col("doc_id") % 5 =!= 3),
      "doc_id", "text", k = 3, maxDf = 100)
    val sdf = graft.ext.Dedup.incrementalFlags(docs, index, "doc_id",
      "text", k = 3, threshold = 0.1, maxDf = 100, streaming = true)
    val full = sdf.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(full.contains("array_sort"), full.take(4000))
    assert(!full.contains("CartesianProduct"), full.take(4000))
  }

  test("incremental embedding dedup (q245): bucket joins are equi-joins " +
    "on the (table, bk) struct — no cartesian/nested-loop; the cosine " +
    "verify is the native kernel, map-side before the pair dedupe") {
    val df = ExtQueries.all("q245_incremental_embed")(spark, sf0001)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    val full = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(full.toLowerCase.contains("cosinesim") ||
      full.contains("cosine"), full.take(4000))
  }

  test("cluster retraction (q246): scratch-in, scratch-out — all joins " +
    "equi (semi/anti on the label key), no cartesian/nested-loop") {
    val p = plan(ExtQueries.all("q246_cluster_retract")(spark, sf0001))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("index retraction (q247): ONE sh-keyed left join of deleted " +
    "postings against the index, map-side list subtraction — no " +
    "cartesian/nested-loop, and the documents scan reads only " +
    "(doc_id, text)") {
    val p = plan(ExtQueries.all("q247_index_retract")(spark, sf0001))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("quantized-ANN recall (q132): ONE corpus scan scores both " +
    "precisions — a single q_id exchange feeds both ranking windows " +
    "and the recall aggregate (round-10 plan bound)") {
    val df = ExtQueries.all("q132_quantized_ann")(spark, sf0001)
    df.collect()
    // count in the FINAL plan only — the adaptive plan's toString
    // repeats the tree under "== Initial Plan ==" after execution
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the broadcast of 3 query rows fans out a non-equi join (BNLJ is
    // the expected shape there); everything downstream — both windows
    // and the groupBy — rides ONE q_id hash exchange
    assert(p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") == 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("incremental payload dedup (q250): slice-key joins are all " +
    "equi-joins, no cartesian/nested-loop, and the persisted " +
    "fingerprint table is semi-join-pruned before the Hamming verify") {
    val p = plan(ExtQueries.all("q250_incremental_payload")(spark,
      sf0001))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the corpus fps reach the verify only through the candidate-id
    // semi-join (the media scan itself sits behind the shared
    // fingerprint checkpoint — q237's plan pins its column pruning)
    assert(p.contains("LeftSemi"), p)
  }

  test("fingerprint-index maintenance (q251/q252): (sl, sv)-keyed " +
    "equi-joins only — left-merge + keys-only anti for upsert (round " +
    "19: the old full-outer shape was broadcast-ineligible and " +
    "re-sorted the whole index; the decomposition lets the delta " +
    "broadcast so the posting lists never shuffle), left + map-side " +
    "array_except for retract — no cartesian/nested-loop, corpus " +
    "payloads never rescanned (the index side is the persisted scratch)") {
    val up = plan(ExtQueries.all("q251_fp_upsert")(spark, sf0001))
    assert(!up.contains("CartesianProduct"), up)
    assert(!up.contains("BroadcastNestedLoopJoin"), up)
    assert(!up.contains("FullOuter"), up)
    assert(up.contains("LeftAnti"), up)
    val ret = plan(ExtQueries.all("q252_fp_retract")(spark, sf0001))
    assert(!ret.contains("CartesianProduct"), ret)
    assert(!ret.contains("BroadcastNestedLoopJoin"), ret)
    assert(ret.contains("array_except"), ret)
  }

  test("band-index maintenance (q253/q254): the generic operators keep " +
    "the same shape on the MinHash modality — one (bk)-keyed join " +
    "each, no cartesian/nested-loop; q254's deltas come from the " +
    "persisted postings (state-only takedown)") {
    val up = plan(ExtQueries.all("q253_lsh_upsert")(spark, sf0001))
    assert(!up.contains("CartesianProduct"), up)
    assert(!up.contains("BroadcastNestedLoopJoin"), up)
    assert(!up.contains("FullOuter"), up) // round 19: left + anti merge
    assert(up.contains("LeftAnti"), up)
    val ret = plan(ExtQueries.all("q254_lsh_retract")(spark, sf0001))
    assert(!ret.contains("CartesianProduct"), ret)
    assert(!ret.contains("BroadcastNestedLoopJoin"), ret)
    assert(ret.contains("array_except"), ret)
  }

  test("lifecycle integration (q248): the chained plan stays all-equi " +
    "— no cartesian/nested-loop anywhere in the five-stage composition") {
    val p = plan(ExtQueries.all("q248_lifecycle")(spark, sf0001))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("embedding-index maintenance (q255/q256): ONE vec_id-keyed " +
    "anti-join each (exploded-row state needs no set algebra) — no " +
    "cartesian/nested-loop, corpus embeddings never rescanned (the " +
    "index side is the persisted scratch)") {
    val up = plan(ExtQueries.all("q255_emb_upsert")(spark, sf0001))
    assert(!up.contains("CartesianProduct"), up)
    assert(!up.contains("BroadcastNestedLoopJoin"), up)
    assert(up.contains("LeftAnti"), up)
    val ret = plan(ExtQueries.all("q256_emb_retract")(spark, sf0001))
    assert(!ret.contains("CartesianProduct"), ret)
    assert(!ret.contains("BroadcastNestedLoopJoin"), ret)
    assert(ret.contains("LeftAnti"), ret)
  }

  test("lifecycle integration on the banded path (q257): the chained " +
    "plan stays all-equi — no cartesian/nested-loop through pairs + " +
    "index upsert + cluster upsert + retraction + survivor report") {
    val p = plan(ExtQueries.all("q257_lsh_lifecycle")(spark, sf0001))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("lifecycle integration on the embedding and payload paths " +
    "(q259/q260): both chained plans stay all-equi — the four-modality " +
    "lifecycle symmetry carries no cartesian/nested-loop anywhere") {
    val e = plan(ExtQueries.all("q259_emb_lifecycle")(spark, sf0001))
    assert(!e.contains("CartesianProduct"), e)
    assert(!e.contains("BroadcastNestedLoopJoin"), e)
    val f = plan(ExtQueries.all("q260_fp_lifecycle")(spark, sf0001))
    assert(!f.contains("CartesianProduct"), f)
    assert(!f.contains("BroadcastNestedLoopJoin"), f)
  }

  test("bucketed join (q161): sort-merge join with NO exchange on the " +
    "join key — the bucketBy layout carries the partitioning") {
    val df = ExtQueries.all("q161_bucketed_join")(spark, sf0001)
    // materialize so AQE finalizes the executed plan
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), p)
    // the only exchanges are the post-join aggregate's (mktsegment);
    // NEITHER side shuffles on the join key — that is what bucketing buys
    assert(!p.contains("Exchange hashpartitioning(o_custkey"), p)
    assert(!p.contains("Exchange hashpartitioning(c_custkey"), p)
    assert(p.contains("Bucketed: true"), p)
    assert(p.contains("SelectedBucketsCount: 8 out of 8"), p)
    // the residual per-bucket Sort is partition-local (sortBy guarantees
    // per-file order only; multi-file buckets merge-sort locally)
  }

  test("rank statistics (q174/q175): ranks derive from DISTINCT-value " +
    "cells (round 19) — every rank window sorts |distinct values| " +
    "rows fed by the cells aggregate, never the raw fact stream") {
    import spark.implicits._
    val d = Seq(("g", 1.0, 2.0, true), ("g", 1.0, 3.0, false),
      ("g", 2.0, 1.0, true)).toDF("grp", "x", "y", "a")
    val pMwu = plan(graft.engine.Aggregates
      .mannWhitneyU(d, "grp", "x", col("a")))
    // exactly TWO exchanges: the (grp, __v) cells aggregate and the
    // group-key window; the final statistic agg reuses the window's
    // group partitioning
    assert(pMwu.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") == 2, pMwu)
    // the rank window's sort child is the cells aggregate's output
    // (keys grp, __v) — no Window consumes fact rows
    assert(pMwu.contains("HashAggregate(keys=[grp"), pMwu)
    // spearman keeps the per-row two-window form (round 19: two cells
    // rewrites measured slower at sf0.1 and reverted — the
    // near-continuous y axis does not collapse): it sorts twice
    // (x-ranks, y-ranks) but exchanges once — the y-axis window reuses
    // the group-hash partitioning
    val pSp = plan(graft.engine.Aggregates.spearman(d, "grp", "x", "y"))
    assert(pSp.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") == 1, pSp)
  }

  test("concurrency: the running sum is a PARTITIONED window over the " +
    "range-partitioned boundaries, not a single-partition global window") {
    import spark.implicits._
    val intervals = Seq((1L, 5L), (3L, 7L)).toDF("s", "e")
    val p = plan(graft.ext.EventOps.concurrency(intervals, "s", "e"))
    // the Window node must carry a partition spec (__pid)
    val winLines = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(winLines.nonEmpty, p)
    assert(winLines.forall(_.contains("__pid")), p)
  }

  test("dedup cascade (q180): no cartesian product anywhere — every " +
    "stage is a window or hash-agg/join on a key") {
    val p = plan(ExtQueries.all("q180_dedup_cascade")(spark, sf0001))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("RFM (q183): the tertile stat frames broadcast onto the customer " +
    "aggregate — no shuffle of the fact side for the score join") {
    val p = plan(ExtQueries.all("q183_rfm_segments")(spark, sf0001))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p) // 1-row frames broadcast
    assert(!p.contains("CartesianProduct"), p)
  }

  test("catalog statistics (ANALYZE TABLE) feed the planner: the " +
    "analyzed row count reaches the optimized plan under CBO — the " +
    "stats-driven complement to q230's sketch-priced choice") {
    val t = "graft_stats_probe"
    val loc = new java.io.File(
      s"target/scratch/graft_statsprobe_${ProcessHandle.current().pid()}")
      .getAbsolutePath
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t USING parquet LOCATION '$loc' AS " +
      s"SELECT id FROM RANGE(1234)")
    val cboKey = "spark.sql.cbo.enabled"
    val prev = spark.conf.get(cboKey)
    try {
      spark.conf.set(cboKey, "true")
      // before ANALYZE: no catalog row count — the planner only has the
      // file-size estimate
      assert(spark.table(t).queryExecution.optimizedPlan.stats
        .rowCount.isEmpty)
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS")
      val st = spark.table(t).queryExecution.optimizedPlan.stats
      assert(st.rowCount.contains(BigInt(1234)), st)
    } finally {
      spark.conf.set(cboKey, prev)
      spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }

  test("CMS-planned join (q230): the physical plan honors the synopsis-" +
    "priced choice on BOTH branches") {
    // threshold far above any estimate → the planner buys the broadcast
    val bPlan = plan(ExtQueries.cmsPlannedJoin(spark, sf0001,
      threshold = Long.MaxValue))
    assert(bPlan.contains("BroadcastHashJoin"), bPlan)
    // threshold 0 → the estimate (always ≥ 1 here) prices the join too
    // big to broadcast; the engine must NOT force one. Spark's own
    // size-based autoBroadcast may still pick a broadcast at this tiny
    // test scale — the contract under test is that OUR hint is absent,
    // so the logical plan carries no join hint.
    val sPlan = ExtQueries.cmsPlannedJoin(spark, sf0001, threshold = 0L)
      .queryExecution.optimizedPlan.toString
    assert(!sPlan.contains("hints=[broadcast]"), sPlan)
    // and the strategy column tells the truth on both branches
    import org.apache.spark.sql.functions.col
    assert(ExtQueries.cmsPlannedJoin(spark, sf0001, Long.MaxValue)
      .select(col("strategy")).head().getString(0) == "broadcast")
    assert(ExtQueries.cmsPlannedJoin(spark, sf0001, 0L)
      .select(col("strategy")).head().getString(0) == "shuffle")
  }

  test("rolling anomaly (q184): trailing window rides ONE exchange on " +
    "the event-type key after the daily aggregate") {
    val df = ExtQueries.all("q184_rolling_anomaly")(spark, sf0001)
    val p = plan(df)
    // exchanges: daily agg (event_type, day), window re-key (event_type),
    // final output sort — and nothing else
    assert(p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") == 2, p)
    val winLines = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(winLines.forall(_.contains("event_type")), p)
  }
}
