package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §7.4): image/audio/video as opaque
  * `binary` columns + typed metadata, with decode/feature-extract as
  * partition-wise batch transforms.
  *
  * The actual media decode is STUBBED (no image/audio libs in this
  * container): [[fakeDecode]] is a deterministic stand-in that computes a
  * byte histogram "feature vector". Everything around it — the schema
  * (binary payload + metadata struct), the `mapPartitions` batch shape
  * (executor-local, no driver round-trip, amortized per-partition setup
  * exactly where a real codec would load its native context), and the
  * output contract (`Array[Float]` features) — is real and tested.
  *
  * At 100 TB: payloads stay columnar in parquet; the scan prunes metadata
  * columns without touching payload bytes; decode parallelism = partition
  * count; a real decoder would be swapped in per-partition with zero plan
  * changes.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, payload: Array[Byte],
      media_type: String, n_bytes: Int)

  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
      features: Array[Float])

  /** Build an opaque-binary media table from documents (payload = UTF-8
    * bytes standing in for an encoded image/audio blob). */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      (when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video")).as("media_type"))
      .withColumn("n_bytes", length(col("payload")))

  /** STUB decoder: deterministic 16-bin byte histogram, L1-normalized.
    * A real implementation would decode the codec here (???); the
    * signature, batching and schema are the production shape. */
  private[ext] def fakeDecode(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xFF) / 16) += 1f
      i += 1
    }
    val total = math.max(payload.length, 1).toFloat
    hist.map(_ / total)
  }

  /** Frame-sampling plumbing (video-style): split the opaque payload into
    * fixed-size byte frames, keep every `stride`-th frame, explode to one
    * row per sampled frame. Pure Catalyst (SQL substring on binary), so
    * the frame fan-out happens executor-side with no driver involvement —
    * the shape a real frame-decoder would slot into. */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int)
      : DataFrame = {
    require(frameBytes > 0 && stride > 0)
    // guard empty payloads: sequence(0, -1) flips to a descending range
    // (same trap as Dedup.shingleHashes) and would emit a phantom frame
    val framed = media.withColumn("frames",
      expr(s"CASE WHEN n_bytes > 0 THEN " +
        s"transform(sequence(0, int(ceil(n_bytes / ${frameBytes}D)) - 1), " +
        s"i -> substring(payload, i * $frameBytes + 1, $frameBytes)) " +
        s"ELSE array() END"))
    framed.select(col("doc_id"), col("media_type"),
        posexplode(col("frames")).as(Seq("frame_idx", "frame")))
      .filter(col("frame_idx") % stride === 0)
      .withColumn("frame_bytes", length(col("frame")))
  }

  /** Perceptual fingerprints for payload NEAR-dup detection: the
    * [[graft.functions.Blockhash]] 1-D blockhash (fixed grid of `blocks`
    * byte ranges, bit j = block-j mean > payload mean — see
    * [[graft.functions.BlockhashUtil]]) over the opaque payload, the
    * next rung of the multimodal dedup ladder above byte-identical
    * [[exactDedup]]-style payload hashing: it catches re-encoded /
    * lightly-edited copies that no exact hash groups. Returns (pid, fp)
    * ready for [[graft.ext.Dedup.fingerprintNearDupPairs]]' Hamming
    * bit-slice banding.
    *
    * Scale shape: one map-only codegen pass over the payload bytes (the
    * same cost class as any decode), then banding turns candidate
    * generation into per-slice-bucket equi-joins — never |payloads|².
    * The integer-only bit rule makes the fingerprint bit-replicable in
    * the DuckDB oracle from hex(payload). */
  def blockhashFingerprints(media: DataFrame, idCol: String,
      blocks: Int = 32): DataFrame =
    media.select(col(idCol).as("pid"),
      graft.functions.Blockhash.blockhash(col("payload"), blocks)
        .as("fp"))

  /** Content-defined chunk list of the opaque payload
    * ([[graft.functions.CdcChunkUtil]] — rolling-Horner boundaries,
    * expected chunk length = `divisor` bytes): the shift-resistant
    * partial-content primitive — an insert/delete re-chunks only the
    * edit's neighborhood, so every later chunk keeps its hash, where
    * fixed-offset frames ([[sampleFrames]]) lose everything after the
    * shift. */
  def cdcChunks(payload: Column, window: Int = 8, divisor: Int = 64)
      : Column =
    graft.functions.CdcChunks.cdc_chunks(payload, window, divisor)

  /** Partial-content payload dedup over content-defined chunks — the
    * storage-dedup rung of the multimodal ladder (q241): byte-identical
    * payloads (q226) ⊂ perceptually-similar payloads (q237) ⊂ payloads
    * SHARING CONTENT (this — a clip embedded in a longer recording, a
    * document with a boilerplate block, a re-muxed file with one edited
    * region). Each payload becomes its DISTINCT chunk-hash set; pair
    * overlap = |shared chunks| / min(|A|, |B|) ≥ `threshold` — the
    * containment form, so a short payload swallowed by a long one still
    * scores 1.0.
    *
    * Scale shape: chunking is one codegen pass per payload (same cost
    * class as a decode); candidates come from the df-capped grouped
    * inverted index over chunk hashes ([[Dedup.keyCandidates]] — the
    * q31 machinery over a different key), so cost is |postings|·maxDf
    * bounded, never |payloads|². The whole pipeline is exact integer
    * arithmetic, so the oracle replays every stage — boundaries, chunk
    * hashes, candidates — from hex(payload) bytes in SQL. */
  def cdcDedupPairs(media: DataFrame, idCol: String, window: Int = 8,
      divisor: Int = 64, threshold: Double = 0.5,
      maxDf: Int = 100): DataFrame = {
    require(threshold > 0, "containment threshold must be positive")
    val post = media.select(col(idCol).as("pid"),
      explode(array_distinct(transform(
        cdcChunks(col("payload"), window, divisor),
        c => c.getField("hash")))).as("key"))
    val (sizes, shared) = Dedup.keyCandidates(post, maxDf)
    shared
      .join(sizes.select(col("pid").as("id_a"), col("n_sh").as("n_a")),
        Seq("id_a"))
      .join(sizes.select(col("pid").as("id_b"), col("n_sh").as("n_b")),
        Seq("id_b"))
      .withColumn("overlap", col("n_shared").cast("double") /
        least(col("n_a"), col("n_b")))
      .filter(col("overlap") >= threshold)
      .select(col("id_a"), col("id_b"), col("n_shared"), col("n_a"),
        col("n_b"), col("overlap"))
      .orderBy("id_a", "id_b")
  }

  /** Partition-wise feature extraction: one "codec context" per partition
    * (the println-free stand-in for loading a native decoder), then a
    * streaming map over the partition's records. */
  def extractFeatures(spark: SparkSession, media: DataFrame)
      : Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { records =>
      // per-partition setup site (real codec init would go here)
      records.map { r =>
        MediaFeatures(r.doc_id, r.media_type, r.n_bytes,
          fakeDecode(r.payload))
      }
    }
  }
}
