package graft.ext

import graft.SparkSpec

class EventOpsSpec extends SparkSpec {
  import spark.implicits._
  import java.sql.Timestamp

  private def ts(d: Int, h: Int) =
    Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")

  test("funnel: stage order enforced — events BEFORE the prior stage's " +
    "first touch do not count") {
    val events = Seq(
      // u1 completes in order: view(d1) click(d2) purchase(d3)
      (1L, "view", ts(1, 9)), (1L, "click", ts(2, 9)),
      (1L, "purchase", ts(3, 9)),
      // u2: click BEFORE first view → stage2 not reached
      (2L, "click", ts(1, 8)), (2L, "view", ts(1, 9)),
      (2L, "purchase", ts(1, 10)),
      // u3: view+click, purchase before click → stage3 not reached
      (3L, "view", ts(1, 9)), (3L, "purchase", ts(1, 10)),
      (3L, "click", ts(1, 11)),
      // u4: never views (click+purchase only) → not even stage1
      (4L, "click", ts(1, 9)), (4L, "purchase", ts(1, 10)))
      .toDF("user_id", "event_type", "ts")
    val out = EventOps.funnel(events, "user_id", "event_type", "ts",
        "view", "click", "purchase")
      .as[(Long, Long, Long)].collect().head
    assert(out == ((3L, 2L, 1L))) // u1,u2,u3 viewed; u1,u3 clicked after;
                                  // only u1 purchased after the click
  }

  test("funnel: same-timestamp stage events count (>= threshold)") {
    val events = Seq(
      (1L, "view", ts(1, 9)), (1L, "click", ts(1, 9)),
      (1L, "purchase", ts(1, 9)))
      .toDF("user_id", "event_type", "ts")
    val out = EventOps.funnel(events, "user_id", "event_type", "ts",
        "view", "click", "purchase")
      .as[(Long, Long, Long)].collect().head
    assert(out == ((1L, 1L, 1L)))
  }

  test("weeklyRetention: cohorts at week starts, offsets count from the " +
    "user's first week, distinct weeks only") {
    val events = Seq(
      // u1 first active Mon Jan 1 week, returns twice in week +2
      (1L, ts(2, 9)), (1L, ts(16, 9)), (1L, ts(17, 9)),
      // u2 first active week of Jan 8, active next week too
      (2L, ts(9, 9)), (2L, ts(15, 9)))
      .toDF("user_id", "ts")
    val out = EventOps.weeklyRetention(events, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .as[(Timestamp, Int, Long)].collect().toSeq
    val w1 = Timestamp.valueOf("2024-01-01 00:00:00")
    val w2 = Timestamp.valueOf("2024-01-08 00:00:00")
    assert(out == Seq(
      (w1, 0, 1L), (w1, 2, 1L),   // u1: week 0 and week +2 (once)
      (w2, 0, 1L), (w2, 1, 1L)))  // u2: consecutive weeks
  }
}
