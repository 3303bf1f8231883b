package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque `binary` columns
  * with typed metadata, plus the decode / feature-extract / frame-sample
  * plumbing a training-data pipeline needs.
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): `StubDecoder` produces deterministic fake features from the
  * bytes. Everything around it — schema, partition sizing, batch-shaped
  * `mapPartitions` signature, feature column layout — is real and tested;
  * a production decoder drops in by replacing one function.
  *
  * Scale design: media blobs dominate partition size, so `repartitionForMedia`
  * targets a byte budget per partition instead of a row budget; decode is a
  * narrow per-partition pass (no shuffle), and downstream feature ops join on
  * the compact (id, features) projection — never re-shuffling the blobs.
  */
object Multimodal {

  final case class MediaMeta(
      width: Int,
      height: Int,
      sampleRate: Int,
      durationMs: Int,
      format: String
  )

  final case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      bytes: Array[Byte],
      meta: MediaMeta
  )

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      features: Array[Float]
  )

  /** The decode seam. A real implementation would batch-decode per
    * partition (JNI codec, ONNX encoder, ...). The stub derives
    * deterministic pseudo-features from the payload bytes so tests and
    * benchmarks exercise the full data path with realistic shapes.
    */
  object StubDecoder {
    def decode(record: MediaRecord, dim: Int): Array[Float] = {
      // ??? <- real codec goes here; deterministic fake below.
      val out = new Array[Float](dim)
      var h = 1125899906842597L // FNV-ish rolling seed
      val bs = record.bytes
      var i = 0
      while (i < bs.length) { h = h * 31 + bs(i); i += 1 }
      var j = 0
      while (j < dim) {
        val x = h * (j * 2654435761L + 1)
        out(j) = ((x >>> 40).toInt % 1000) / 1000.0f
        j += 1
      }
      out
    }
  }

  /** Deterministic synthetic media table derived from `documents` (the
    * container has no real media files): payload bytes from the text,
    * kind/meta from the id. Exercises binary columns + nested struct schema.
    */
  def synthesizeFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        to_binary(md5(col("text")), lit("hex")).as("bytes"),
        struct(
          (col("doc_id") % 1920 + 1).cast("int").as("width"),
          (col("doc_id") % 1080 + 1).cast("int").as("height"),
          element_at(array(lit(16000), lit(44100), lit(48000)),
            (col("doc_id") % 3 + 1).cast("int")).as("sampleRate"),
          (col("doc_id") % 300000 + 1000).cast("int").as("durationMs"),
          element_at(array(lit("jpeg"), lit("wav"), lit("mp4")),
            (col("doc_id") % 3 + 1).cast("int")).as("format")
        ).as("meta")
      )
      .as[MediaRecord]
  }

  /** Size partitions by a byte budget (blob-aware), not a row count. */
  def repartitionForMedia(
      ds: Dataset[MediaRecord],
      totalBytes: Long,
      targetBytesPerPartition: Long = 128L * 1024 * 1024
  ): Dataset[MediaRecord] = {
    val parts = math.max(1, (totalBytes / targetBytesPerPartition).toInt)
    ds.repartition(parts, col("media_id"))
  }

  /** Batch decode: one pass per partition, stub codec per record. The
    * mapPartitions shape is what a real vectorized decoder needs (amortized
    * codec init per partition, streaming iterator, no materialized batch).
    */
  def decodeFeatures(ds: Dataset[MediaRecord], dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      // real impl: initialize codec/encoder once per partition here
      it.map { rec =>
        MediaFeatures(rec.media_id, rec.kind, rec.bytes.length,
          StubDecoder.decode(rec, dim))
      }
    }
  }

  /** Frame-sample offsets for video rows: every `everyMs` within duration
    * (pure expression — the frame *extraction* would live in the decoder).
    */
  def frameOffsets(df: DataFrame, everyMs: Int = 10000): DataFrame =
    df.withColumn(
      "frame_offsets_ms",
      when(col("kind") === "video",
        sequence(lit(0), col("meta.durationMs"), lit(everyMs)))
        .otherwise(array().cast("array<int>"))
    )

  /** Resized target dims preserving aspect ratio (metadata-level resize). */
  def resizeMeta(df: DataFrame, maxSide: Int = 512): DataFrame = {
    val w = col("meta.width"); val h = col("meta.height")
    val scale = when(greatest(w, h) > maxSide,
      lit(maxSide).cast("double") / greatest(w, h).cast("double")).otherwise(lit(1.0))
    df.withColumn("resized_width", floor(w * scale).cast("int"))
      .withColumn("resized_height", floor(h * scale).cast("int"))
  }
}
