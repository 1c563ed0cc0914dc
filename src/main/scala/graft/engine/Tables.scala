package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Explicit-schema loaders for the driver-generated fixture tables
  * (`/root/testdata/sf*`; see FIXTURES.md §1).
  *
  * Mirrors the reference's explicit-typing philosophy: never trust schema
  * inference for correctness-bearing columns (reference `Preprocessing.py:20`,
  * `Preprocessing.py:103-116` loads string-first and casts explicitly).
  * Parquet already carries types, so here "explicit" means the schema is
  * declared and asserted — a silent upstream type change fails fast instead of
  * propagating.
  *
  * Scale note: plain `spark.read.parquet` keeps the scan columnar and lets
  * Catalyst push filters/column pruning into the parquet reader; at 100 TB the
  * same loader works unchanged over a partitioned directory tree (Spark plans
  * one task per row-group split).
  */
object Tables {

  // Fixture parquet stores naive (not UTC-adjusted) timestamps; Spark 4
  // surfaces those as TIMESTAMP_NTZ, which matches DuckDB's TIMESTAMP for
  // oracle parity. The session timezone is pinned to UTC anyway.
  val lineitemSchema: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampNTZType)))

  val ordersSchema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampNTZType),
    StructField("o_orderpriority", StringType)))

  val customerSchema: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplierSchema: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val partSchema: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val nationSchema: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val regionSchema: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private[graft] val schemas: Map[String, StructType] = Map(
    "lineitem" -> lineitemSchema, "orders" -> ordersSchema,
    "customer" -> customerSchema, "supplier" -> supplierSchema,
    "part" -> partSchema, "nation" -> nationSchema, "region" -> regionSchema,
    "documents" -> documentsSchema,
    "embeddings" -> embeddingsSchema)

  /** Load a fixture table with its declared schema asserted against the
    * parquet footer (names + types, ignoring nullability). */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    normalize(name, schemas(name), spark.read.parquet(s"$dir/$name.parquet"))

  /** Physical-encoding drifts a fixture regeneration may legitimately
    * introduce without changing logical content: tz-variant timestamps,
    * date-stored timestamps, and lossless numeric widenings. Anything else
    * (renames, narrowings, reorderings) still fails fast. */
  private def widens(a: DataType, e: DataType): Boolean = (a, e) match {
    case (TimestampType, TimestampNTZType) => true // session tz pinned UTC,
    case (TimestampNTZType, TimestampType) => true // so the cast is value-exact
    case (DateType, TimestampNTZType) => true
    case (DateType, TimestampType) => true
    case (IntegerType, LongType) => true
    case (FloatType, DoubleType) => true
    case _ => false
  }

  /** Assert `df` against `expected` field-by-field. Exact match returns the
    * scan untouched (no Project — filters/pruning reach the reader directly);
    * a tolerated drift (see [[widens]]) is repaired with a normalizing cast so
    * downstream code always sees the declared types; anything else throws. */
  private[engine] def normalize(name: String, expected: StructType,
      df: DataFrame): DataFrame = {
    val actual = df.schema
    require(actual.length == expected.length &&
      actual.map(_.name) == expected.map(_.name),
      s"schema drift in $name: got ${actual.simpleString}, " +
        s"expected ${expected.simpleString}")
    val pairs = actual.zip(expected)
    pairs.foreach { case (a, e) =>
      require(a.dataType == e.dataType || widens(a.dataType, e.dataType),
        s"schema drift in $name: field ${a.name} is " +
          s"${a.dataType.simpleString}, expected ${e.dataType.simpleString}")
    }
    if (pairs.forall { case (a, e) => a.dataType == e.dataType }) df
    else df.select(pairs.map { case (a, e) =>
      if (a.dataType == e.dataType) col(a.name)
      else col(a.name).cast(e.dataType).as(a.name)
    }: _*)
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** events.ts has shipped under two physical encodings across fixture
    * regenerations: parquet INT64 TIMESTAMP(NANOS) — which Spark's vectorized
    * reader rejects unless the legacy nanosAsLong flag surfaces it as raw
    * bigint — and TIMESTAMP(MICROS, isAdjustedToUTC=false), which surfaces
    * directly as `timestamp_ntz` (the type [[eventsSchema]] declares). The
    * loader must accept both, so it sets the flag (scope note: the flag ONLY
    * changes how TIMESTAMP(NANOS) columns surface — micros files are
    * untouched — and `events` is the only nanos-risk table here; it stays set
    * for the session because task-side re-reads re-resolve the conf per
    * execution) and branches on the observed `ts` type:
    *
    *  - `timestamp_ntz`/`timestamp` → the plain asserted path, like every
    *    other table ([[normalize]] handles tz-variant drift).
    *  - `bigint` → legacy nanos: convert with integer division (ns → µs) —
    *    `div`, not `/`, because double division would lose precision on
    *    ~1.7e18 nano values.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampNTZType) | Some(TimestampType) =>
        normalize("events", eventsSchema, raw)
      case Some(LongType) =>
        val expectedRaw = "struct<event_id:bigint,ts:bigint,user_id:bigint," +
          "event_type:string,value:double,props:string>"
        require(raw.schema.simpleString == expectedRaw,
          s"schema drift in events: got ${raw.schema.simpleString}")
        raw.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
      case other =>
        throw new IllegalArgumentException(
          s"schema drift in events: ts is $other, expected timestamp_ntz " +
            s"(micros encoding) or bigint (legacy nanos encoding); " +
            s"got ${raw.schema.simpleString}")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
