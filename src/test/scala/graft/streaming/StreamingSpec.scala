package graft.streaming

import graft.SparkSpec
import graft.engine.Tables

/** Event-time windows are deterministic on static input, so the watermarked
  * streaming query must equal its batch twin exactly (SURVEY.md §7.4). */
class StreamingSpec extends SparkSpec {

  test("streaming tumbling counts == batch tumbling counts") {
    val batch = StreamingOps.tumblingCounts(Tables.events(spark, sf0001))
      .collect().toSet
    val streamed = StreamingOps.runStreaming(spark, sf0001,
      StreamingOps.tumblingCounts, "t_tumbling").collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("flatMapGroupsWithState sessionizer == declarative session_window") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val events = Tables.events(spark, sf0001)
      .select(col("user_id"),
        col("ts").cast("timestamp").as("ts")).as[StreamingOps.Ev]
    val custom = StreamingOps.sessionize(events,
      org.apache.spark.sql.streaming.OutputMode.Append,
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .select(col("user_id"), col("s_start").cast("timestamp_ntz"),
        col("s_end").cast("timestamp_ntz"), col("n"))
      .collect().toSet
    val declarative = StreamingOps
      .sessionCounts(Tables.events(spark, sf0001)).collect().toSet
    assert(custom == declarative)
    assert(custom.nonEmpty)
  }

  test("streaming sliding counts == batch sliding counts") {
    val batch = StreamingOps.slidingCounts(Tables.events(spark, sf0001))
      .collect().toSet
    val streamed = StreamingOps.runStreaming(spark, sf0001,
      StreamingOps.slidingCounts, "t_sliding").collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("streaming session windows == batch session windows") {
    val batch = StreamingOps.sessionCounts(Tables.events(spark, sf0001))
      .collect().toSet
    val streamed = StreamingOps.runStreaming(spark, sf0001,
      StreamingOps.sessionCounts, "t_session").collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }
}
