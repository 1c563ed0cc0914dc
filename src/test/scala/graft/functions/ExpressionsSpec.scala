package graft.functions

import graft.SparkSpec
import graft.engine.Tables
import graft.ext.{Dedup, SimSearch, TextOps}
import org.apache.spark.sql.functions._

/** Native codegen expressions must be bit-identical to the lambda
  * compositions they replace (oracle parity depends on it). */
class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine_sim == lambda cosine, bit-for-bit, on real embeddings") {
    val emb = Tables.embeddings(spark, sf0001).limit(200)
    val pairs = emb.select(col("vec_id").as("ia"), col("embedding").as("a"))
      .crossJoin(
        emb.select(col("vec_id").as("ib"), col("embedding").as("b")))
      .filter(col("ia") < col("ib")).limit(500)
    val bad = pairs.select(
      SimSearch.cosine(col("a"), col("b")).as("native"),
      SimSearch.cosineLambda(col("a"), col("b")).as("lambda"))
      .filter(col("native") =!= col("lambda")).count()
    assert(bad == 0)
  }

  test("cosine_sim: null on length mismatch and zero vectors") {
    val df = Seq(
      (Array(1f, 2f), Array(1f, 2f, 3f)),
      (Array(0f, 0f), Array(1f, 2f)))
      .toDF("a", "b")
    val out = df.select(SimSearch.cosine(col("a"), col("b")))
      .collect().map(r => r.isNullAt(0))
    assert(out.toSeq == Seq(true, true))
  }

  test("cosine_sim: null ELEMENT → null, same as the lambda form") {
    val df = spark.range(1).select(
      array(lit(1f), lit(null).cast("float")).as("a"),
      array(lit(1f), lit(2f)).as("b"))
    val r = df.select(SimSearch.cosine(col("a"), col("b")).as("n"),
      SimSearch.cosineLambda(col("a"), col("b")).as("l")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("sq_dist == lambda sqDist, bit-for-bit, on real embeddings") {
    val emb = Tables.embeddings(spark, sf0001).limit(200)
    val pairs = emb.select(col("vec_id").as("ia"), col("embedding").as("a"))
      .crossJoin(
        emb.select(col("vec_id").as("ib"), col("embedding").as("b")))
      .filter(col("ia") < col("ib")).limit(500)
    val bad = pairs.select(
      SimSearch.sqDist(col("a"), col("b")).as("native"),
      SimSearch.sqDistLambda(col("a"), col("b")).as("lambda"))
      .filter(col("native") =!= col("lambda")).count()
    assert(bad == 0)
  }

  test("sq_dist: mixed float/double sides (Lloyd centroids), null " +
      "element, length mismatch, empty arrays") {
    val mixed = Seq((Array(1f, 2f), Array(1.5, 0.0))).toDF("a", "b")
    val m = mixed.select(SimSearch.sqDist(col("a"), col("b")).as("d"))
      .as[Double].head()
    assert(m == 0.25 + 4.0)
    val edge = spark.range(1).select(
      SimSearch.sqDist(array(lit(1f), lit(null).cast("float")),
        array(lit(1f), lit(2f))).as("nullElem"),
      SimSearch.sqDist(array(lit(1f)), array(lit(1f), lit(2f)))
        .as("lenMismatch"),
      SimSearch.sqDist(array().cast("array<float>"),
        array().cast("array<float>")).as("empty")).head()
    assert(edge.isNullAt(0) && edge.isNullAt(1))
    assert(edge.getDouble(2) == 0.0)
  }

  test("poly_hash == lambda polyHash on real document words") {
    val words = Tables.documents(spark, sf0001)
      .select(explode(TextOps.tokens(col("text"))).as("w")).limit(5000)
    val bad = words.select(
      TextOps.polyHash(col("w")).as("native"),
      TextOps.polyHashLambda(col("w")).as("lambda"))
      .filter(col("native") =!= col("lambda")).count()
    assert(bad == 0)
  }

  test("poly_hash: empty string → 0, deterministic") {
    val out = Seq("", "a", "a").toDF("s")
      .select(TextOps.polyHash(col("s"))).as[Long].collect()
    assert(out(0) == 0L && out(1) == out(2) && out(1) == 97L)
  }

  test("shingle_hash (native) == lambda shingleHashes on real docs") {
    val docs = Tables.documents(spark, sf0001)
    val bad = docs.select(
      Dedup.shingleHashes(col("text"), 3).as("native"),
      Dedup.shingleHashesLambda(col("text"), 3).as("lambda"))
      .filter(col("native") =!= col("lambda")).count()
    assert(bad == 0)
    // short docs: both empty
    val short = Seq("one two").toDF("text")
      .select(size(Dedup.shingleHashes(col("text"), 3))).as[Int].head()
    assert(short == 0)
  }

  test("minhashSigAggs (agg form) == minhashSignature (array form)") {
    val docs = Tables.documents(spark, sf0001).limit(50)
    val arrForm = docs.select(col("doc_id"),
        Dedup.shingleHashes(col("text"), 3).as("shs"))
      .select(col("doc_id") +: Dedup.minhashSignature(col("shs"), 12): _*)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val aggForm = Dedup.postings(docs, "doc_id", "text", 3)
      .groupBy("pid").agg(Dedup.minhashSigAggs(col("sh"), 12).head,
        Dedup.minhashSigAggs(col("sh"), 12).tail: _*)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(arrForm == aggForm)
  }

  test("array_top_count == quadratic lambda form on real document bigrams") {
    val docs = Tables.documents(spark, sf0001).limit(200)
    val bigrams = ShingleHash.shingle_hash(
      graft.ext.TextOps.tokens(col("text")), 2)
    val lambdaTop = coalesce(array_max(transform(array_distinct(bigrams),
      x => size(filter(bigrams, y => y === x)))), lit(0)).cast("long")
    val bad = docs.select(
        graft.functions.expressions.array_top_count(bigrams).as("native"),
        lambdaTop.as("lambda"))
      .filter(col("native") =!= col("lambda")).count()
    assert(bad == 0)
  }

  test("array_top_count: null elements are ignored, not counted as 0") {
    val got = spark.sql(
      "SELECT ARRAY(0L, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)) AS a")
      .select(graft.functions.expressions.array_top_count(col("a")))
      .head().getLong(0)
    assert(got == 1L) // one real 0; the two nulls must not merge with it
  }

  test("array_top_count: empty array → 0, uniform array → size") {
    val out = Seq(
      (Array.empty[Long], 0L),
      (Array(7L, 7L, 7L), 3L),
      (Array(1L, 2L, 3L), 1L),
      (Array(5L, 1L, 5L, 2L, 5L, 1L), 3L))
      .toDF("a", "expected")
      .select(graft.functions.expressions.array_top_count(col("a"))
        .as("got"), col("expected"))
      .filter(col("got") =!= col("expected")).count()
    assert(out == 0)
  }

  test("zValue: Morton interleave matches a reference implementation " +
    "and preserves 2-D locality ordering basics") {
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.sum
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 9L),
      (1023L, 0L), (0L, 1023L), (1023L, 1023L), (512L, 511L))
    val got = cases.toDF("x", "y")
      .select(graft.functions.ZOrder.zValue(col("x"), col("y"), 10))
      .as[Long].collect().toSeq
    assert(got == cases.map { case (x, y) => ref(x, y, 10) })
    // interleave basics: z(0,0)=0, z(1,0)=1, z(0,1)=2, z(1,1)=3
    assert(got.take(4) == Seq(0L, 1L, 2L, 3L))
  }

  test("zValue: INT columns with bits >= 16 do not overflow 32-bit " +
    "shift/add (inputs widen to long before shifting)") {
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.sum
    val cases = Seq((65536, 0), (0, 65536), (1 << 19, 1 << 19), (3, 1 << 17))
    val got = cases.toDF("x", "y") // IntegerType columns
      .select(graft.functions.ZOrder.zValue(col("x"), col("y"), 20))
      .as[Long].collect().toSeq
    assert(got == cases.map { case (x, y) => ref(x.toLong, y.toLong, 20) })
    assert(got.head == (1L << 32)) // would be 1 under int shift-wrap
  }
}
