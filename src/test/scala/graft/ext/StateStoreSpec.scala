package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The transactional commit protocol itself (round-12 verdict item 1):
  * crash-anywhere recoverability, the atomic manifest swap, garbage
  * collection, compaction, and the commit-contract checks the old
  * dynamic-overwrite protocol could not even express. */
class StateStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix)
      .toFile.getAbsolutePath + "/state"

  private def fpRows(df: org.apache.spark.sql.DataFrame) =
    df.select("pid", "fp").as[(Long, Long)].collect().toSet

  test("CRASH INJECTION between generation write and manifest swap: " +
    "the old snapshot stays fully readable (state == pre-maintenance), " +
    "vacuum reclaims the orphan generation, and the retried cycle " +
    "succeeds and passes its audits — the round-12 item-1 contract") {
    val nb = 8
    val dir = tmp("graft_ss_crash")
    val fps0 = (1L to 20L).map(i => (i, i * 7L)).toDF("pid", "fp")
    Dedup.writeIdKeyedStatePartitioned(fps0, dir, "pid", nb)
    val v0 = StateStore.current(spark, dir).version
    val before = fpRows(StateStore.readAll(spark, dir))
    val batch = Seq((2L, 999L), (100L, 111L)).toDF("pid", "fp")
    // inject the crash in the exact window the old protocol died in:
    // data fully written, commit not yet published
    StateStore.FailPoints.beforeManifestSwap = true
    val e =
      try intercept[RuntimeException] {
        Dedup.upsertIdKeyedStatePartitioned(dir, batch, "pid", nb)
      } finally StateStore.FailPoints.beforeManifestSwap = false
    assert(e.getMessage.contains("FAILPOINT"))
    // the crashed cycle is invisible: same version, same rows
    assert(StateStore.current(spark, dir).version == v0)
    assert(fpRows(StateStore.readAll(spark, dir)) == before)
    // the retried cycle lands WITHOUT any manual cleanup — the commit
    // clears the crashed attempt's orphaned generation itself (review
    // fix: errorifexists on the stale dir used to block every retry)
    Dedup.upsertIdKeyedStatePartitioned(dir, batch, "pid", nb)
    assert(fpRows(StateStore.readAll(spark, dir)) ==
      before.filterNot(_._1 == 2L) + (2L -> 999L) + (100L -> 111L))
    assert(StateStore.current(spark, dir).version == v0 + 1)
    // vacuum afterwards reclaims the superseded manifest; reads stable
    val removed = StateStore.vacuum(spark, dir)
    assert(removed.exists(_.startsWith("manifest-")))
    assert(fpRows(StateStore.readAll(spark, dir)) ==
      before.filterNot(_._1 == 2L) + (2L -> 999L) + (100L -> 111L))
  }

  test("CRASH INJECTION on the two-table cluster state: primary AND " +
    "projection roll back together (no snapshot where they disagree), " +
    "and the retried upsert converges to the in-memory merge") {
    val nb = 8
    val dir = tmp("graft_ss_crash2")
    val pairs0 = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val ids0 = (1L to 6L).toDF("id")
    val clusters0 = Dedup.dupClusters(pairs0, ids0, "id")
    Dedup.writeClustersPartitioned(clusters0, dir, "id", nb)
    def rows(t: String) = StateStore.readAll(spark, dir, t)
      .select("id", "cluster").as[(Long, Long)].collect().toSet
    val before = rows(Dedup.ClustersByLabel)
    assert(rows(Dedup.ClustersById) == before)
    val newPairs = Seq((2L, 3L), (100L, 5L)).toDF("id_a", "id_b")
    val newIds = Seq(100L, 101L).toDF("id")
    StateStore.FailPoints.beforeManifestSwap = true
    try intercept[RuntimeException] {
      Dedup.upsertClustersPartitioned(dir, newPairs, newIds, "id", nb)
    } finally StateStore.FailPoints.beforeManifestSwap = false
    assert(rows(Dedup.ClustersByLabel) == before)
    assert(rows(Dedup.ClustersById) == before)
    // retry directly — no vacuum needed (the commit clears the orphan)
    Dedup.upsertClustersPartitioned(dir, newPairs, newIds, "id", nb)
    val expected = Dedup.upsertClusters(clusters0, newPairs, newIds,
      "id").select("id", "cluster").as[(Long, Long)].collect().toSet
    assert(rows(Dedup.ClustersByLabel) == expected)
    assert(rows(Dedup.ClustersById) == expected)
  }

  test("commit REJECTS a merge that writes outside its declared " +
    "touched set — the mis-partitioned-merge caller bug the old " +
    "dynamic overwrite silently applied") {
    val nb = 8
    val dir = tmp("graft_ss_reject")
    val df = (1L to 10L).map(i => (i, i)).toDF("id", "v")
      .withColumn("pbucket", pmod(hash(col("id")), lit(nb)))
    StateStore.create(spark, dir, df, nb)
    val rogue = (1L to 10L).map(i => (i, -i)).toDF("id", "v")
      .withColumn("pbucket", pmod(hash(col("id")), lit(nb)))
    val e = intercept[IllegalArgumentException] {
      StateStore.commit(spark, dir, rogue, touched = Seq(0))
    }
    assert(e.getMessage.contains("outside its declared touched set"))
    // nothing published: the rejected generation is vacuumable garbage
    assert(StateStore.current(spark, dir).version == 1L)
    StateStore.vacuum(spark, dir)
    assert(StateStore.readAll(spark, dir).select("v")
      .as[Long].collect().toSet == (1L to 10L).toSet)
  }

  test("vacuum keeps every generation the current manifest references " +
    "(older generations still serve untouched buckets) and deletes " +
    "the rest; reads are identical before and after") {
    val nb = 8
    val dir = tmp("graft_ss_vac")
    val fps0 = (1L to 40L).map(i => (i, i)).toDF("pid", "fp")
    Dedup.writeIdKeyedStatePartitioned(fps0, dir, "pid", nb)
    // three cycles, each touching a few buckets
    Seq(1L, 2L, 3L).foreach { k =>
      Dedup.upsertIdKeyedStatePartitioned(dir,
        Seq((k, k * 100L)).toDF("pid", "fp"), "pid", nb)
    }
    val expect = fpRows(StateStore.readAll(spark, dir))
    val live = StateStore.current(spark, dir)
      .buckets(StateStore.T).values.toSet
    assert(live.size > 1) // untouched buckets still live in gen 1
    val removed = StateStore.vacuum(spark, dir)
    assert(removed.count(_.startsWith("manifest-")) == 3) // old manifests
    assert(!removed.exists(live.contains))
    assert(fpRows(StateStore.readAll(spark, dir)) == expect)
    // a second vacuum is a no-op
    assert(StateStore.vacuum(spark, dir).isEmpty)
  }

  test("LAYOUT INVARIANT: create and commit land each held bucket as " +
    "exactly ONE parquet file regardless of input partitioning — the " +
    "round-14 file-count fix (an un-shuffled partitionBy write fans " +
    "out one part-file per upstream task per bucket)") {
    val nb = 4
    val dir = tmp("graft_ss_layout")
    // 4-way-parallel input: the pre-fix write left up to 4 files/bucket
    val df = (1L to 400L).map(i => (i, i)).toDF("pid", "fp")
      .repartition(4)
      .withColumn("pbucket", pmod(hash(col("pid")), lit(nb)))
    StateStore.create(spark, dir, df, nb)
    val created = StateStore.leafFiles(spark, dir)
    assert(created.keySet == (0 until nb).toSet)
    created.foreach { case (_, fs) => assert(fs.size == 1) }
    // a commit whose merged frame spans many partitions: same invariant
    val expect = fpRows(StateStore.readAll(spark, dir))
    val touched = Seq(0, 1)
    val merged = StateStore.readBuckets(spark, dir, StateStore.T, touched)
      .repartition(8) // deliberately scatter before the commit
    StateStore.commit(spark, dir, merged, touched)
    val after = StateStore.leafFiles(spark, dir)
    touched.foreach(b => assert(after(b).size == 1))
    (created.keySet -- touched).foreach(o => assert(after(o) == created(o)))
    assert(fpRows(StateStore.readAll(spark, dir)) == expect)
  }

  test("LAYOUT INVARIANT composes with the fat-bucket escape: " +
    "spark.sql.files.maxRecordsPerFile splits a bucket's single task " +
    "into bounded files, reads stay exact, and clearing the conf " +
    "restores one file per bucket") {
    val nb = 4
    val dir = tmp("graft_ss_maxrec")
    val df = (1L to 400L).map(i => (i, i)).toDF("pid", "fp")
      .withColumn("pbucket", pmod(hash(col("pid")), lit(nb)))
    val key = "spark.sql.files.maxRecordsPerFile"
    spark.conf.set(key, 30L)
    try {
      StateStore.create(spark, dir, df, nb)
      val created = StateStore.leafFiles(spark, dir)
      // ~100 rows per bucket at max 30/file: several files, bounded
      created.foreach { case (_, fs) =>
        assert(fs.size > 1 && fs.size <= 5)
      }
      assert(fpRows(StateStore.readAll(spark, dir)) ==
        (1L to 400L).map(i => i -> i).toSet)
    } finally spark.conf.unset(key)
    // next commit without the conf: back to one file per bucket
    val touched = Seq(0, 1)
    StateStore.commit(spark, dir,
      StateStore.readBuckets(spark, dir, StateStore.T, touched), touched)
    val after = StateStore.leafFiles(spark, dir)
    touched.foreach(b => assert(after(b).size == 1))
    assert(fpRows(StateStore.readAll(spark, dir)) ==
      (1L to 400L).map(i => i -> i).toSet)
  }

  test("compactBuckets RE-HOMES buckets under ONE commit so vacuum " +
    "can reclaim partially-superseded generations: a generation with " +
    "any live bucket strands its dead files (pinned), re-homing all " +
    "its buckets frees it whole; row set identical throughout") {
    val nb = 4
    val dir = tmp("graft_ss_compN")
    def parquetOnDisk(): Int = {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala
          .count(_.getFileName.toString.endsWith(".parquet"))
      } finally walk.close()
    }
    val df = (1L to 400L).map(i => (i, i)).toDF("pid", "fp")
      .withColumn("pbucket", pmod(hash(col("pid")), lit(nb)))
    StateStore.create(spark, dir, df, nb) // gen-1: nb single files
    val expect = fpRows(StateStore.readAll(spark, dir))
    // supersede ONE bucket (content-identical rewrite) -> gen-2
    val b = 0
    StateStore.commit(spark, dir,
      StateStore.readBuckets(spark, dir, StateStore.T, Seq(b)), Seq(b))
    StateStore.vacuum(spark, dir)
    // gen-1 still holds 3 live buckets, so vacuum CANNOT delete it and
    // bucket b's dead gen-1 file stays on disk: nb live + 1 stranded
    assert(parquetOnDisk() == nb + 1)
    val v0 = StateStore.current(spark, dir).version
    // re-home EVERY bucket (unheld ids ignored) -> ONE commit
    StateStore.compactBuckets(spark, dir, (0 until nb) :+ (nb + 9))
    assert(StateStore.current(spark, dir).version == v0 + 1)
    val after = StateStore.leafFiles(spark, dir)
    (0 until nb).foreach(b => assert(after(b).size == 1))
    StateStore.vacuum(spark, dir)
    // old generations now fully unreferenced: disk == the live files
    assert(parquetOnDisk() == nb)
    assert(fpRows(StateStore.readAll(spark, dir)) == expect)
    // nothing held: no-op, no commit
    StateStore.compactBuckets(spark, dir, Seq(nb + 7, nb + 8))
    assert(StateStore.current(spark, dir).version == v0 + 1)
  }

  test("a mismatched numBuckets is REJECTED before any data moves — " +
    "the wrong-modulus pruning bug that would silently duplicate keys") {
    val dir = tmp("graft_ss_nb")
    val fps0 = (1L to 20L).map(i => (i, i)).toDF("pid", "fp")
    Dedup.writeIdKeyedStatePartitioned(fps0, dir, "pid", 8)
    val e = intercept[IllegalArgumentException] {
      Dedup.upsertIdKeyedStatePartitioned(dir,
        Seq((1L, 2L)).toDF("pid", "fp"), "pid", 16)
    }
    assert(e.getMessage.contains("numBuckets=8"))
    // nothing changed
    assert(fpRows(StateStore.readAll(spark, dir)) ==
      (1L to 20L).map(i => i -> i).toSet)
    assert(StateStore.current(spark, dir).version == 1L)
  }

  test("rollbackTo: a later maintenance cycle is abandoned CHEAPLY " +
    "(manifest deletes + vacuum, no data copied) and the earlier " +
    "snapshot reads back exactly; vacuumed history refuses rollback") {
    val nb = 8
    val dir = tmp("graft_ss_rb")
    val fps0 = (1L to 20L).map(i => (i, i)).toDF("pid", "fp")
    Dedup.writeIdKeyedStatePartitioned(fps0, dir, "pid", nb)
    val v1Rows = fpRows(StateStore.readAll(spark, dir))
    Dedup.upsertIdKeyedStatePartitioned(dir,
      Seq((1L, 999L), (50L, 5L)).toDF("pid", "fp"), "pid", nb)
    assert(fpRows(StateStore.readAll(spark, dir)) != v1Rows)
    StateStore.rollbackTo(spark, dir, 1L)
    assert(StateStore.current(spark, dir).version == 1L)
    assert(fpRows(StateStore.readAll(spark, dir)) == v1Rows)
    // the abandoned generation is gone; the store keeps working
    Dedup.upsertIdKeyedStatePartitioned(dir,
      Seq((2L, 222L)).toDF("pid", "fp"), "pid", nb)
    assert(fpRows(StateStore.readAll(spark, dir)) ==
      v1Rows.filterNot(_._1 == 2L) + (2L -> 222L))
    // vacuum drops manifest v1 -> rolling back to it must refuse
    StateStore.vacuum(spark, dir)
    val e = intercept[IllegalArgumentException] {
      StateStore.rollbackTo(spark, dir, 1L)
    }
    assert(e.getMessage.contains("manifest missing"))
  }

  test("TORN newest manifest (crashed rename on a weaker filesystem): " +
    "reads fall back LOUDLY to the previous committed snapshot, the " +
    "next commit self-heals by republishing the version, and vacuum " +
    "deletes the torn file") {
    val nb = 8
    val dir = tmp("graft_ss_torn")
    val fps0 = (1L to 20L).map(i => (i, i)).toDF("pid", "fp")
    Dedup.writeIdKeyedStatePartitioned(fps0, dir, "pid", nb)
    val before = fpRows(StateStore.readAll(spark, dir))
    // simulate the torn write a non-atomic rename can leave: a
    // higher-numbered manifest file with garbage content
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "manifest-000000002.txt"),
      "version=2\nnumBuck") // truncated mid-line
    assert(StateStore.current(spark, dir).version == 1L) // fallback
    assert(fpRows(StateStore.readAll(spark, dir)) == before)
    // the retried cycle publishes v2 OVER the torn leftover
    Dedup.upsertIdKeyedStatePartitioned(dir,
      Seq((2L, 999L)).toDF("pid", "fp"), "pid", nb)
    assert(StateStore.current(spark, dir).version == 2L)
    assert(fpRows(StateStore.readAll(spark, dir)) ==
      before.filterNot(_._1 == 2L) + (2L -> 999L))
    // a torn file that is NOT the retried version: vacuum deletes it
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "manifest-000000009.txt"), "junk")
    assert(StateStore.current(spark, dir).version == 2L)
    val removed = StateStore.vacuum(spark, dir)
    assert(removed.contains("manifest-000000009.txt"))
    assert(fpRows(StateStore.readAll(spark, dir)) ==
      before.filterNot(_._1 == 2L) + (2L -> 999L))
  }

  test("rollbackTo(retain = K) preserves the retention window its " +
    "trailing vacuum would otherwise collapse: history below the " +
    "target stays rollback-able to depth K (review finding)") {
    val nb = 8
    val dir = tmp("graft_ss_rbretain")
    val fps0 = (1L to 20L).map(i => (i, i)).toDF("pid", "fp")
    Dedup.writeIdKeyedStatePartitioned(fps0, dir, "pid", nb) // v1
    (2L to 4L).foreach { v =>
      Dedup.upsertIdKeyedStatePartitioned(dir,
        Seq((v, v * 111L)).toDF("pid", "fp"), "pid", nb) // v2..v4
    }
    // abandon v4 but KEEP a 2-deep window: v3 (target) + v2
    StateStore.rollbackTo(spark, dir, 3L, retain = 2)
    assert(StateStore.current(spark, dir).version == 3L)
    // v2 survived the trailing vacuum — a second rollback reaches it
    StateStore.rollbackTo(spark, dir, 2L)
    assert(StateStore.current(spark, dir).version == 2L)
    assert(fpRows(StateStore.readAll(spark, dir)) ==
      (1L to 20L).map(i => i -> i).toSet
        .filterNot(_._1 == 2L) + (2L -> 222L))
    // contrast: the default retain=1 forfeits everything below the
    // target (v1 gone after the v2 rollback above used the default)
    val e = intercept[IllegalArgumentException] {
      StateStore.rollbackTo(spark, dir, 1L)
    }
    assert(e.getMessage.contains("manifest missing"))
  }

  test("rollbackTo REFUSES a torn target before deleting anything: " +
    "the exists check alone would pass, the trailing vacuum would " +
    "discard the torn target, and the store would land SILENTLY " +
    "below the requested version (review finding)") {
    val nb = 8
    val dir = tmp("graft_ss_rbtorn")
    val fps0 = (1L to 20L).map(i => (i, i)).toDF("pid", "fp")
    Dedup.writeIdKeyedStatePartitioned(fps0, dir, "pid", nb)
    Dedup.upsertIdKeyedStatePartitioned(dir,
      Seq((2L, 999L)).toDF("pid", "fp"), "pid", nb) // v2
    Dedup.upsertIdKeyedStatePartitioned(dir,
      Seq((3L, 888L)).toDF("pid", "fp"), "pid", nb) // v3
    val v3 = fpRows(StateStore.readAll(spark, dir))
    // tear v2 IN PLACE (its file still exists). The stale Hadoop CRC
    // sidecar must go too: with it, the checksummed local FS throws
    // ChecksumException at READ time — an I/O-phase failure, which
    // correctly PROPAGATES rather than classifying as torn (the
    // conservative side of the round-14 torn-vs-I/O split).
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "manifest-000000002.txt"),
      "version=2\nnumBuck")
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(dir, ".manifest-000000002.txt.crc"))
    val e = intercept[StateStore.TornManifestException] {
      StateStore.rollbackTo(spark, dir, 2L)
    }
    assert(e.getMessage.contains("torn"))
    // NOTHING was deleted: v3 is still current and fully readable
    assert(StateStore.current(spark, dir).version == 3L)
    assert(fpRows(StateStore.readAll(spark, dir)) == v3)
    // rolling back PAST the torn version still works
    StateStore.rollbackTo(spark, dir, 1L)
    assert(StateStore.current(spark, dir).version == 1L)
    assert(fpRows(StateStore.readAll(spark, dir)) ==
      (1L to 20L).map(i => i -> i).toSet)
  }

  test("RACING COMMITTERS on one version (single-writer contract " +
    "breach, interleaved deterministically in the TOCTOU window): " +
    "exactly one publishes, the loser fails loudly with the winner's " +
    "snapshot intact, and the loser's retry lands on the next version") {
    val nb = 8
    val dir = tmp("graft_ss_race")
    val fps0 = (1L to 20L).map(i => (i, i)).toDF("pid", "fp")
    Dedup.writeIdKeyedStatePartitioned(fps0, dir, "pid", nb)
    val base = fpRows(StateStore.readAll(spark, dir))
    // writer B slips its ENTIRE commit of v2 into writer A's window
    // between the destination-existence check and the rename — the
    // exact interleaving the no-overwrite rename exists to lose safely
    StateStore.FailPoints.beforeSwapHook = () => {
      StateStore.FailPoints.beforeSwapHook = null // B publishes plainly
      Dedup.upsertIdKeyedStatePartitioned(dir,
        Seq((7L, 777L)).toDF("pid", "fp"), "pid", nb)
      ()
    }
    val e =
      try intercept[RuntimeException] {
        Dedup.upsertIdKeyedStatePartitioned(dir,
          Seq((3L, 333L)).toDF("pid", "fp"), "pid", nb)
      } finally StateStore.FailPoints.beforeSwapHook = null
    assert(e.getMessage.contains("manifest swap") ||
      e.getMessage.contains("concurrent writer"), e.getMessage)
    // the winner's snapshot is current and intact; the loser's
    // generation is unreferenced garbage
    assert(StateStore.current(spark, dir).version == 2L)
    assert(fpRows(StateStore.readAll(spark, dir)) ==
      base.filterNot(_._1 == 7L) + (7L -> 777L))
    // the losing writer's retry re-reads current state and lands on v3
    Dedup.upsertIdKeyedStatePartitioned(dir,
      Seq((3L, 333L)).toDF("pid", "fp"), "pid", nb)
    assert(StateStore.current(spark, dir).version == 3L)
    assert(fpRows(StateStore.readAll(spark, dir)) ==
      base.filterNot(x => x._1 == 7L || x._1 == 3L) +
        (7L -> 777L) + (3L -> 333L))
  }

  test("vacuum RETENTION window: retain=K keeps the newest K " +
    "snapshots' manifests and generations (rollback inside the window " +
    "still works; beyond it refuses), and retained reads are stable") {
    val nb = 8
    val dir = tmp("graft_ss_retain")
    val fps0 = (1L to 40L).map(i => (i, i)).toDF("pid", "fp")
    Dedup.writeIdKeyedStatePartitioned(fps0, dir, "pid", nb) // v1
    Seq(1L, 2L, 3L).foreach { k => // v2, v3, v4
      Dedup.upsertIdKeyedStatePartitioned(dir,
        Seq((k, k * 100L)).toDF("pid", "fp"), "pid", nb)
    }
    val atV4 = fpRows(StateStore.readAll(spark, dir))
    val removed = StateStore.vacuum(spark, dir, retain = 2)
    // v1 and v2 leave; v3 and v4 stay
    assert(removed.count(_.startsWith("manifest-")) == 2)
    assert(!removed.contains("manifest-000000003.txt"))
    assert(StateStore.current(spark, dir).version == 4L)
    assert(fpRows(StateStore.readAll(spark, dir)) == atV4)
    // rollback INSIDE the window works and reads exactly v3's state
    StateStore.rollbackTo(spark, dir, 3L)
    assert(StateStore.current(spark, dir).version == 3L)
    assert(fpRows(StateStore.readAll(spark, dir)) ==
      (1L to 40L).map(i => i -> i).toSet
        .filterNot(x => x._1 <= 2L) + (1L -> 100L) + (2L -> 200L))
    // beyond the window: forfeited
    val e = intercept[IllegalArgumentException] {
      StateStore.rollbackTo(spark, dir, 2L)
    }
    assert(e.getMessage.contains("manifest missing"))
  }

  test("a table whose every bucket empties stays READABLE with its " +
    "schema (manifest carries the schema, not the files), and a " +
    "subsequent upsert repopulates it") {
    val nb = 4
    val dir = tmp("graft_ss_empty")
    val fps0 = Seq((1L, 10L), (2L, 20L)).toDF("pid", "fp")
    Dedup.writeIdKeyedStatePartitioned(fps0, dir, "pid", nb)
    Dedup.retractIdKeyedStatePartitioned(dir,
      Seq(1L, 2L).toDF("pid"), "pid", nb)
    val empty = StateStore.readAll(spark, dir)
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("pid", "fp", "pbucket"))
    Dedup.upsertIdKeyedStatePartitioned(dir,
      Seq((3L, 30L)).toDF("pid", "fp"), "pid", nb)
    assert(fpRows(StateStore.readAll(spark, dir)) == Set(3L -> 30L))
  }
}
