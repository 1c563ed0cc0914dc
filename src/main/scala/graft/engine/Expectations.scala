package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations: declarative checks evaluated as ordinary
  * aggregates, one result row per check (name, violation count, pass) —
  * the validation gate a production pipeline runs before data is allowed
  * downstream.
  *
  * Scale shape: ALL column checks against one table share a single scan
  * and a single 1-row aggregate (each check is a conditional sum — no
  * per-check pass); uniqueness is one distinct-vs-count aggregate; FK
  * orphan checks are left-anti joins that broadcast the parent when it
  * fits and shuffle on the key otherwise. The report is a union of
  * 1-row frames — constant output size at any corpus scale.
  */
object Expectations {

  /** A named row-level violation predicate (true = row violates). */
  final case class Check(name: String, violation: Column)

  /** Evaluate row-level checks against `df` in ONE pass. */
  def columnChecks(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    // check names become aggregate column names: duplicates would collide
    // (ambiguous resolution / silently wrong counts), so reject them here
    require(checks.map(_.name).distinct.size == checks.size,
      "check names must be distinct: " +
        checks.groupBy(_.name).filter(_._2.size > 1).keys.mkString(", "))
    // backtick-quote when re-resolving: a name containing a dot would
    // otherwise parse as a nested-field reference and fail resolution
    def quoted(name: String): Column =
      col("`" + name.replace("`", "``") + "`")
    // coalesce: sum over an EMPTY table is null, and a null violation
    // count makes pass = (null === 0) = null — the gate would neither
    // pass nor fail; an empty input must read as zero violations
    val aggs = checks.map(c =>
      coalesce(sum(when(c.violation, 1).otherwise(0)), lit(0))
        .cast("long").as(c.name))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    wide.select(explode(array(checks.map(c =>
        struct(lit(c.name).as("check"), quoted(c.name).as("n_violations"))
      ): _*)).as("r"))
      .select(col("r.check"), col("r.n_violations"))
  }

  /** Duplicate-key count for a uniqueness expectation. */
  def uniqueCheck(df: DataFrame, name: String, key: String): DataFrame =
    df.agg((count(col(key)) - countDistinct(col(key)))
        .cast("long").as("n_violations"))
      .select(lit(name).as("check"), col("n_violations"))

  /** Orphaned-foreign-key count (child rows with no parent). */
  def fkCheck(child: DataFrame, name: String, key: String,
      parent: DataFrame, pkey: String): DataFrame =
    child.join(parent.select(col(pkey).as(key)), Seq(key), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check"), col("n_violations"))

  /** Union per-check frames into the final report with pass flags. */
  def report(parts: Seq[DataFrame]): DataFrame =
    parts.reduce(_.unionByName(_))
      .withColumn("pass", col("n_violations") === 0)

  /** Order-invariant content digest of a table slice: each row hashes
    * to a scrambled polynomial hash of its '|'-joined column values
    * (NULL → the literal 'NULL'); the digest is the exact decimal SUM
    * of row hashes mod 1000000007. Addition commutes, so the digest is
    * independent of row order, partitioning, and file layout — equal
    * bytes ⇒ equal digest no matter how the table was written. The
    * cheap end-to-end validation for incremental pipelines: recompute
    * after a rewrite/compaction/migration and compare two longs
    * instead of re-diffing 100 TB. (A checksum, not cryptography:
    * collisions are possible, tampering is out of scope. Callers pick
    * columns whose string form is canonical — strings/integers;
    * avoid raw doubles, whose formatting is engine-specific.)
    *
    * Scale shape: pure map (hash) + one partial-aggregated decimal
    * sum — no shuffle wider than one row per partition. */
  def tableDigest(df: DataFrame, cols: Seq[String]): DataFrame = {
    val rowStr = concat_ws("|",
      cols.map(c => coalesce(col(c).cast("string"), lit("NULL"))): _*)
    df.select(
        graft.ext.TextOps.scrambledHash(rowStr).as("__h"))
      .agg(count(lit(1)).as("n_rows"),
        (sum(col("__h").cast("decimal(38,0)")) % lit(1000000007L))
          .cast("long").as("digest"))
  }
}
