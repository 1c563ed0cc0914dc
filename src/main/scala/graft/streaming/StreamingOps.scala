package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.engine.Tables

/** Structured Streaming surface over the `events` table (SURVEY.md §7.4):
  * tumbling / sliding / session windows with watermarked event time.
  *
  * Each aggregation is defined ONCE as a batch-visible transform; the
  * streaming entry points apply the same transform to a `readStream`
  * source, so batch oracle results and streaming results are provably the
  * same query (event-time windows are deterministic on static input).
  * Watermarks bound state at scale: late data beyond the watermark is
  * dropped instead of growing executor state without bound.
  */
object StreamingOps {

  /** Tumbling 5-minute counts per event_type. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.engine.Aggregates.sumExact(col("value")).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"),
        col("sum_value"))
      .orderBy("w_start", "event_type")

  /** Sliding 10-minute window, 5-minute slide, per event_type. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))
      .orderBy("w_start", "event_type")

  /** Session windows per user with a 30-minute gap. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes").as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("s_start"),
        col("w.end").as("s_end"), col("n"))
      .orderBy("user_id", "s_start")

  /** Run any of the above transforms as a real watermarked streaming query
    * over the events parquet, drained synchronously into a memory sink.
    * Returns the sink contents (complete mode). */
  def runStreaming(spark: SparkSession, dir: String,
      transform: DataFrame => DataFrame, queryName: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batchSchema = spark.read
      .parquet(s"$dir/events.parquet").schema
    // readStream needs a directory source; select just the events file
    val src = spark.readStream.schema(batchSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    // watermarks require TIMESTAMP (with local tz); session tz is pinned
    // UTC, so wall-clock values match the NTZ batch path exactly
    val events = src.withColumn("ts",
      timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
    val q = transform(events).writeStream
      .outputMode("complete")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.table(queryName)
    // normalize LTZ → NTZ so results compare 1:1 with the batch transform
    out.select(out.schema.fields.map { f =>
      if (f.dataType == org.apache.spark.sql.types.TimestampType)
        col(f.name).cast(org.apache.spark.sql.types.TimestampNTZType)
          .as(f.name)
      else col(f.name)
    }: _*)
  }
}
