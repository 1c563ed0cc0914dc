package graft.plans

import graft.SparkSpec
import graft.engine.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of semantics: latest right row with time <= left time, per key") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"),
      (2L, 10L, "d"), (3L, 10L, "e"))
      .toDF("k", "t", "tag").repartition(5) // scrambled on purpose
    val right = Seq((1L, 4L, "r4"), (1L, 10L, "r10"), (1L, 15L, "r15"),
      (2L, 11L, "r11"))
      .toDF("k", "rt", "rv").repartition(3)
    val out = AsOf.join(left, right, ("k", "k"), ("t", "rt"))
      .select("tag", "rv").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out == Map(
      "a" -> Some("r10"),  // t=10: right at 10 (ties included)
      "b" -> Some("r15"),  // t=20: latest ≤ 20
      "c" -> Some("r4"),   // t=5: only r4 qualifies
      "d" -> None,         // k=2: right row is at 11 > 10
      "e" -> None))        // k=3: no right rows
  }

  test("null right-time rows are skipped, not stalled on (regression)") {
    val left = Seq((1L, 10L, "a"), (1L, 3L, "b")).toDF("k", "t", "tag")
    val right = Seq((1L, Option.empty[Long], "rnull"),
      (1L, Some(5L), "r5")).toDF("k", "rt", "rv")
    val out = AsOf.join(left, right, ("k", "k"), ("t", "rt"))
      .select("tag", "rv").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    // the null-time row sorts first within the key; it must be consumed so
    // r5 is still reachable for t=10, and never matched itself
    assert(out == Map("a" -> Some("r5"), "b" -> None))
  }

  test("equivalent to the composed window formulation on real events") {
    val ev = Tables.events(spark, sf0001)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id").as("c_user"), col("ts").as("click_ts"))
      .agg(count(lit(1)).as("n_clicks"))
    val got = AsOf.join(purchases, clicks,
      ("user_id", "c_user"), ("ts", "click_ts"))
      .select(col("event_id"), col("click_ts"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // reference formulation: join all prior clicks, keep the latest
    val w = Window.partitionBy("event_id").orderBy(col("click_ts").desc)
    val expected = purchases
      .join(clicks, col("user_id") === col("c_user") &&
        col("click_ts") <= col("ts"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("click_ts"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got.size == purchases.count())
    assert(got == expected)
    assert(got.values.exists(_.isDefined))
  }

  test("string keys across many key groups (buffered-key copy regression)") {
    // non-primitive keys: rKey.eval on the sort iterator's reused buffer
    // returned a VIEW — alternating matched/unmatched keys caught the old
    // `lastKey` silently mutating under the buffered row
    val keys = (0 until 26).map(i => ('a' + i).toChar.toString)
    val left = keys.zipWithIndex.map { case (k, i) => (k, 10L, i.toLong) }
      .toDF("k", "t", "lid").repartition(4)
    val right = keys.zipWithIndex.flatMap { case (k, i) =>
      // even keys: usable rows (latest at t=2 must win);
      // odd keys: only a future row — must yield NO match even though the
      // buffered row from the preceding key is still held
      if (i % 2 == 0) Seq((k, 1L, s"$k-early"), (k, 2L, s"$k-late"))
      else Seq((k, 99L, s"$k-future"))
    }.toDF("rk", "rt", "rv").repartition(3)
    val out = AsOf.join(left, right, ("k", "rk"), ("t", "rt"))
      .select("k", "rv").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    keys.zipWithIndex.foreach { case (k, i) =>
      if (i % 2 == 0) assert(out(k) == Some(s"$k-late"), s"key $k")
      else assert(out(k).isEmpty, s"key $k")
    }
  }

  test("plan: AsOfJoinExec with one exchange + sort per side") {
    val ev = Tables.events(spark, sf0001)
    val l = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val r = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val p = AsOf.join(l, r, ("user_id", "cu"), ("ts", "cts"))
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin "), p) // exec prints as nodeName "AsOfJoin"
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 2, p)
    assert("Sort \\[".r.findAllIn(p).length == 2, p)
  }

  test("AsOfFilterPushdown: left-key filter reaches BOTH parquet scans; " +
    "results unchanged") {
    val ev = Tables.events(spark, sf0001)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    val joined = AsOf.join(purchases, clicks,
      ("user_id", "c_user"), ("ts", "click_ts"))
    val someUser = purchases.select("user_id").head().getLong(0)
    val filtered = joined.filter(col("user_id") === someUser)
    val p = filtered.queryExecution.executedPlan.toString
    // the key predicate must appear as a pushed scan filter on the left
    // side AND (key-substituted) on the right side — without the rule,
    // Catalyst cannot see through the custom node and both sides scan fully
    assert(s"PushedFilters: \\[.*EqualTo\\(user_id,$someUser\\)".r
      .findFirstIn(p).isDefined, p)
    assert("EqualTo\\(user_id,".r.findAllIn(p).length >= 2, p)
    // semantics: pushed == filter applied after an unpushed join
    val unpushed = joined.collect()
      .filter(r => r.getLong(1) == someUser).map(_.toString).sorted.toSeq
    val pushed = filtered.collect().map(_.toString).sorted.toSeq
    assert(pushed == unpushed)
    assert(pushed.nonEmpty)
  }

  test("AsOfFilterPushdown: deterministic conjunct AFTER a " +
    "non-deterministic one stays above the join (span semantics)") {
    // Same contract as Spark's PushPredicateThroughNonJoin: pushing
    // `user_id = k` below `rand() < p AND user_id = k` would let rand()
    // draw over a smaller row set and change sampling semantics. Only the
    // deterministic PREFIX may move; here the prefix is empty.
    val ev = Tables.events(spark, sf0001)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    val joined = AsOf.join(purchases, clicks,
      ("user_id", "c_user"), ("ts", "click_ts"))
    val someUser = purchases.select("user_id").head().getLong(0)
    // NB: a trivially-true guard like rand() < 2.0 won't do — Spark's own
    // optimizer folds it to `true` (rand ∈ [0,1)) and the equality then
    // legitimately becomes the deterministic prefix and pushes.
    val filtered = joined
      .filter(rand(7) < lit(0.5) && col("user_id") === someUser)
    val opt = filtered.queryExecution.optimizedPlan.toString
    // the key equality must NOT move below the join: no pushed EqualTo on
    // either child, and the full conjunction stays in a Filter ABOVE the
    // AsOfJoinPlan node
    val joinIdx = opt.indexOf("AsOfJoinPlan")
    assert(joinIdx >= 0, opt)
    assert(!opt.substring(joinIdx).contains(s"= $someUser)"), opt)
    val above = opt.substring(0, joinIdx)
    assert(above.contains("rand(7)") && above.contains(s"= $someUser)"), opt)
  }

  test("builder-time extension registration works (GraftExtensions)") {
    val ext = new GraftExtensions
    val e = new org.apache.spark.sql.SparkSessionExtensions
    ext(e) // must not throw; strategy injection is exercised via AsOf.join
    assert(true)
  }

  test("kernels are SQL-callable in a withExtensions session") {
    import org.apache.spark.sql.SparkSession
    val base = spark
    // getOrCreate honors withExtensions only when building a NEW session:
    // clear the active/default handles (the shared SparkContext is reused)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s.sql(
        "SELECT poly_hash('abc') AS h, cosine_sim(array(1.0f, 0.0f), " +
          "array(1.0f, 0.0f)) AS c").head()
      // polyHash('abc') = ((97*31+98)*31+99) mod 1e9+7
      assert(r.getLong(0) == ((97L * 31 + 98) * 31 + 99) % 1000000007L)
      assert(r.getDouble(1) == 1.0)
      val sd = s.sql(
        "SELECT sq_dist(array(0.0f, 3.0f), array(4.0f, 0.0f)) AS d")
        .head()
      assert(sd.getDouble(0) == 25.0)
      val mg = s.sql(
        "SELECT misra_gries(t, 4) FROM VALUES ('a'),('a'),('b') AS v(t)")
        .head().getSeq[String](0).toSet
      assert(mg == Set("a", "b"))
      // raw-AggregateFunction registration ⇒ DISTINCT and FILTER resolve
      val mgFiltered = s.sql(
        "SELECT misra_gries(t, 4) FILTER (WHERE t <> 'b') " +
          "FROM VALUES ('a'),('a'),('b') AS v(t)")
        .head().getSeq[String](0).toSet
      assert(mgFiltered == Set("a"))
      val mgDistinct = s.sql(
        "SELECT misra_gries(DISTINCT t, 4) " +
          "FROM VALUES ('a'),('a'),('b') AS v(t)")
        .head().getSeq[String](0).toSet
      assert(mgDistinct == Set("a", "b"))
      // literal-parameter validation surfaces as an analysis error
      val err = intercept[Exception] {
        s.sql("SELECT simhash(array(1L), rand())").head()
      }
      assert(err.getMessage.contains("literal"), err.getMessage)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
