package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.sources.Tables

/** Multimodal-column pipeline: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, decoded/feature-extracted via a
  * per-partition batch operator.
  *
  * The container has no codec libraries, so [[FakeCodec.decode]] is a
  * clearly-marked deterministic STUB — it stands in for a real JNI/FFmpeg
  * decode. Everything around it is the real at-scale plumbing:
  *
  *  - schema: `content: BinaryType` + metadata columns, the layout a
  *    100 TB media lake would use (payload column stays opaque to
  *    Catalyst; metadata columns stay prunable/filterable);
  *  - partitioning: feature extraction repartitions by `media_id` so
  *    decode parallelism is independent of the source file layout;
  *  - batch shape: `mapPartitions` hands the codec an iterator per
  *    partition (the JVM analogue of `mapInPandas` batches) so a real
  *    codec could amortize init per-partition, not per-row.
  *
  * A production codec would not be SQL-expressible, but the stub is — so
  * every query here carries a full DuckDB oracle pinning the pipeline
  * around the codec seam (see [[oracleSql]]); TextMultimodalSpec pins the
  * codec itself.
  */
object Multimodal {

  /** Opaque media payload + typed metadata. */
  final case class MediaBlob(
      media_id: Long,
      kind: String, // image | audio | video
      content: Array[Byte],
      meta_width: Int,
      meta_height: Int,
      meta_duration_ms: Long
  )

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      feature: Array[Double],
      feature_norm: Double
  )

  /** STUB CODEC — deterministic fake standing in for a real decoder.
    * A production build replaces the body (e.g. javacv / libjpeg via JNI)
    * without touching the signature or the surrounding pipeline: input is
    * the raw payload, output a fixed-width feature vector.
    */
  object FakeCodec {
    val FeatureDim = 8

    def decode(content: Array[Byte], kind: String): Array[Double] = {
      // Deterministic "features": banded byte statistics — stands in for
      // decoded-pixel / waveform features.
      val f = new Array[Double](FeatureDim)
      var i = 0
      while (i < content.length) {
        f(i % FeatureDim) += (content(i) & 0xff) / 255.0
        i += 1
      }
      val scale = math.max(1, content.length / FeatureDim)
      (0 until FeatureDim).foreach(j => f(j) = f(j) / scale)
      f
    }
  }

  /** Synthesize a deterministic media table from `documents`: the text
    * bytes play the role of an opaque encoded payload.
    */
  def synthesize(spark: SparkSession, sfDir: String): Dataset[MediaBlob] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id").as("media_id"),
        element_at(typedLit(Seq("image", "audio", "video")), (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("content"),
        (col("n_chars") % 640).cast("int").as("meta_width"),
        (col("n_chars") % 480).cast("int").as("meta_height"),
        (col("n_chars") * 100).as("meta_duration_ms")
      )
      .as[MediaBlob]
  }

  /** Per-partition batch decode: repartition by media_id (decode
    * parallelism decoupled from file layout), then stream each partition
    * through the codec.
    */
  def extractFeatures(blobs: Dataset[MediaBlob]): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs
      .repartition(col("media_id"))
      .mapPartitions { iter =>
        // per-partition codec init would go here (amortized, not per-row)
        iter.map { b =>
          val f = FakeCodec.decode(b.content, b.kind)
          MediaFeatures(b.media_id, b.kind, b.content.length, f,
            math.sqrt(f.map(x => x * x).sum))
        }
      }
  }

  /** Stub resize: the metadata is rewritten and the payload re-encoded
    * (here: deterministically truncated to the new dims' byte budget — a
    * real build swaps the body for an image scaler without touching the
    * signature or plumbing).
    */
  def resize(blobs: Dataset[MediaBlob], w: Int, h: Int): Dataset[MediaBlob] = {
    import blobs.sparkSession.implicits._
    blobs
      .repartition(col("media_id"))
      .mapPartitions { iter =>
        iter.map { b =>
          val outLen = math.min(b.content.length, w * h / 64)
          b.copy(content = java.util.Arrays.copyOf(b.content, outLen),
            meta_width = w, meta_height = h)
        }
      }
  }

  final case class MediaFrame(
      media_id: Long,
      frame_idx: Int,
      t_ms: Long,
      frame_fp: Int
  )

  /** Frame sampling: one output row per `stepMs` of video duration, each
    * carrying a fingerprint "decoded" from the payload (stub: the byte at
    * a frame-dependent offset). The row-explosion shape — filter on the
    * prunable `kind` metadata column BEFORE touching payload bytes, then
    * flatMap per partition — is exactly how a real frame extractor would
    * run; only the decode body is fake.
    */
  def sampleFrames(blobs: Dataset[MediaBlob], stepMs: Long = 5000L): Dataset[MediaFrame] = {
    import blobs.sparkSession.implicits._
    blobs
      .filter(col("kind") === "video")
      .repartition(col("media_id"))
      .mapPartitions { iter =>
        iter.flatMap { b =>
          // Guard the degenerate blob (nonzero duration, empty payload):
          // the modulo below would divide by zero. Unreachable with the
          // synthetic corpus (empty text ⇒ zero duration) but a real
          // corpus can carry truncated payloads with intact metadata.
          if (b.content.isEmpty) Iterator.empty
          else (0L until b.meta_duration_ms by stepMs).zipWithIndex.iterator.map {
            case (t, idx) =>
              MediaFrame(b.media_id, idx, t,
                b.content(((idx * 997) % b.content.length).toInt) & 0xff)
          }
        }
      }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_features" -> ((s, d) => {
      extractFeatures(synthesize(s, d))
        .toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          round(col("feature_norm"), 4).as("feature_norm"))
    }),
    "multimodal_resize" -> ((s, d) => {
      resize(synthesize(s, d), 224, 224)
        .toDF()
        .select(col("media_id"), col("kind"), col("meta_width"),
          col("meta_height"), length(col("content")).cast("int").as("out_bytes"))
    }),
    "multimodal_frames" -> ((s, d) => {
      sampleFrames(synthesize(s, d)).toDF()
        .select("media_id", "frame_idx", "t_ms", "frame_fp")
    }),
    "multimodal_dedup" -> ((s, d) => {
      // binary-payload exact dedup — the image/audio dedup step of a
      // multimodal ingest pipeline, and it runs BEFORE any decode
      // (hashing bytes is free next to a codec, so duplicate payloads
      // never reach the expensive stage). Same canonicalization contract
      // as dedup_exact, over the opaque `content` binary column; md5 of
      // the bytes is portable because the stub payload is the document's
      // ASCII bytes (the same seam every other multimodal oracle uses).
      val byHash = org.apache.spark.sql.expressions.Window
        .partitionBy(col("content_hash"))
      synthesize(s, d).toDF()
        .withColumn("content_hash", md5(col("content")))
        .withColumn("dup_count", count(lit(1)).over(byHash))
        .withColumn("is_canonical",
          col("media_id") === min("media_id").over(byHash))
        .select("media_id", "kind", "content_hash", "dup_count", "is_canonical")
    })
  )

  /** The production codec is not SQL-expressible, but the deterministic
    * STUB is (the corpus is pure ASCII, so `ascii(substr(text, i, 1))`
    * reads payload byte i-1) — which lets the oracle pin the ENTIRE
    * pipeline around the codec seam: synthesis, partitioning, batch
    * iteration, row explosion, output schema. Double summation uses
    * explicitly-ordered folds; zero terms interleave exactly (x + 0.0 is
    * an identity in IEEE), matching the codec's sequential accumulation.
    */
  def oracleSql: Map[String, String] = Map(
    "multimodal_features" ->
      s"""WITH m AS (SELECT doc_id media_id,
         |    (['image','audio','video'])[(doc_id % 3 + 1)::INT] kind,
         |    text, length(text)::INT n_bytes FROM documents),
         |f AS (SELECT media_id, kind, n_bytes,
         |    list_transform(range(0, ${FakeCodec.FeatureDim}), j ->
         |      list_reduce(list_prepend(0.0::DOUBLE,
         |        list_transform(range(1, n_bytes + 1), i ->
         |          CASE WHEN (i - 1) % ${FakeCodec.FeatureDim} = j
         |               THEN ascii(substr(text, i::INT, 1)) / 255.0
         |               ELSE 0.0::DOUBLE END)),
         |        (a, x) -> a + x) / greatest(1, n_bytes // ${FakeCodec.FeatureDim})) feat
         |  FROM m)
         |SELECT media_id, kind, n_bytes,
         |  round(sqrt(list_reduce(list_prepend(0.0::DOUBLE,
         |    list_transform(feat, x -> x * x)), (a, b) -> a + b)), 4) feature_norm
         |FROM f""".stripMargin,
    "multimodal_resize" ->
      """SELECT doc_id media_id,
        |  (['image','audio','video'])[(doc_id % 3 + 1)::INT] kind,
        |  224 meta_width, 224 meta_height,
        |  least(length(text), 224 * 224 // 64)::INT out_bytes
        |FROM documents""".stripMargin,
    "multimodal_frames" ->
      """WITH m AS (SELECT doc_id media_id,
        |    (['image','audio','video'])[(doc_id % 3 + 1)::INT] kind,
        |    text, length(text)::INT n_bytes, n_chars * 100 dur
        |  FROM documents),
        |fr AS (SELECT media_id, t // 5000 frame_idx, t t_ms, n_bytes, text
        |       FROM m, unnest(range(0, dur, 5000)) u(t) WHERE kind = 'video')
        |SELECT media_id, frame_idx::INT frame_idx, t_ms,
        |  ascii(substr(text, ((frame_idx * 997) % n_bytes + 1)::INT, 1)) frame_fp
        |FROM fr""".stripMargin,
    // content bytes ARE the ASCII text bytes (the codec-seam contract
    // above), so md5 over the binary column equals DuckDB's md5(text)
    "multimodal_dedup" ->
      """WITH m AS (SELECT doc_id media_id,
        |    (['image','audio','video'])[(doc_id % 3 + 1)::INT] kind, text
        |  FROM documents)
        |SELECT media_id, kind, md5(text) content_hash,
        |  count(*) OVER (PARTITION BY md5(text)) dup_count,
        |  media_id = min(media_id) OVER (PARTITION BY md5(text)) is_canonical
        |FROM m""".stripMargin
  )
}
