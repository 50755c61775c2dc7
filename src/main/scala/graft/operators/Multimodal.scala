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
  * No DuckDB oracle (binary feature extraction is not SQL-expressible);
  * the driver records a rows-only check and MultimodalSpec pins the
  * deterministic output.
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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_features" -> ((s, d) => {
      extractFeatures(synthesize(s, d))
        .toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          round(col("feature_norm"), 4).as("feature_norm"))
    })
  )

  /** Not SQL-expressible (binary decode) → no oracle entries. */
  def oracleSql: Map[String, String] = Map.empty
}
