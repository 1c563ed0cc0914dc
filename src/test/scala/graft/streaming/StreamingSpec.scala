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

  test("streaming session windows == batch session windows") {
    val batch = StreamingOps.sessionCounts(Tables.events(spark, sf0001))
      .collect().toSet
    val streamed = StreamingOps.runStreaming(spark, sf0001,
      StreamingOps.sessionCounts, "t_session").collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }
}
