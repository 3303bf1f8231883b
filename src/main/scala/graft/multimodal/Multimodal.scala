package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque `binary` columns
  * with typed metadata, plus the decode / feature-extract / frame-sample
  * plumbing a training-data pipeline needs.
  *
  * The codec is REAL: [[Codec]] parses actual container bytes — PPM (P6)
  * images, BMP 24-bit keyframes for the video lane, RIFF/WAVE PCM16 audio —
  * all decodable with the JVM stdlib alone (this container has no native
  * image/audio libraries, so formats needing external codecs — JPEG, MP4 —
  * would slot in behind the same seam). Features come from the DECODED
  * pixels/samples: a luminance histogram for rasters, a mean-|amplitude|
  * time profile for audio.
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

  /** The decode step: sniff the container from the BYTES, parse it with
    * [[Codec]], and compute `dim` feature lanes from the decoded content —
    * luminance histogram for rasters (PPM images, BMP video keyframes),
    * mean-|amplitude| time profile for PCM audio. Malformed bytes throw;
    * a corrupt blob must fail the job, not emit garbage features.
    */
  def decodeOne(record: MediaRecord, dim: Int): Array[Float] =
    Codec.sniffFormat(record.bytes) match {
      case "ppm" => Codec.lumaHistogram(Codec.decodePpm(record.bytes), dim)
      case "bmp" => Codec.lumaHistogram(Codec.decodeBmp(record.bytes), dim)
      case _     => Codec.energyProfile(Codec.decodeWav(record.bytes), dim)
    }

  /** Deterministic synthetic media corpus derived from `documents` ids (the
    * container ships no real media files): REAL encoded containers — PPM
    * image / WAV audio / BMP "keyframe" for the video lane — whose pixel and
    * sample values are pure integer functions of (doc_id, position), so the
    * decoded features are replayable by the DuckDB oracle without parsing
    * bytes. Meta is honest: raster dims and sample rates describe the actual
    * payload; the video lane carries a container-declared durationMs (the
    * frame-sampling target) alongside its decoded keyframe dims.
    */
  def synthesizeOne(id: Long): MediaRecord = (id % 3) match {
    case 0 =>
      val w = (id % 13 + 4).toInt; val h = (id % 7 + 4).toInt
      val img = Codec.ImagePixels(w, h, rasterPixels(id, w, h))
      MediaRecord(id, "image", Codec.encodePpm(img), MediaMeta(w, h, 0, 0, "ppm"))
    case 1 =>
      val n = (id % 50 + 40).toInt
      val samples = Array.tabulate(n)(i => (((id * 31 + i * 997L) % 65536L) - 32768L).toShort)
      MediaRecord(id, "audio", Codec.encodeWav(Codec.AudioPcm(16000, 1, samples)),
        MediaMeta(0, 0, 16000, (n * 1000L / 16000L).toInt, "wav"))
    case _ =>
      val w = (id % 11 + 4).toInt; val h = (id % 5 + 4).toInt
      val img = Codec.ImagePixels(w, h, rasterPixels(id, w, h))
      MediaRecord(id, "video", Codec.encodeBmp(img),
        MediaMeta(w, h, 0, (id % 300000 + 1000).toInt, "bmp"))
  }

  /** The shared synthetic pixel formula (also replayed by the oracle):
    * r,g,b at (x,y) are small affine functions of (id, x, y) mod 256.
    */
  private def rasterPixels(id: Long, w: Int, h: Int): Array[Byte] = {
    val rgb = new Array[Byte](3 * w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = 3 * (y * w + x)
        rgb(p) = ((id * 7 + x * 13 + y * 101) % 256).toByte
        rgb(p + 1) = ((id * 11 + x * 17 + y * 31) % 256).toByte
        rgb(p + 2) = ((id * 13 + x * 19 + y * 61) % 256).toByte
        x += 1
      }
      y += 1
    }
    rgb
  }

  def synthesizeFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map(synthesizeOne)
  }

  /** Multi-keyframe synthetic video for the video lane (doc_id % 3 = 2):
    * a REAL YUV4MPEG2 `Cmono` container carrying every keyframe on the
    * declared 10s frame grid — `nFrames = durationMs/10000 + 1`, exactly
    * [[frameOffsets]]' sequence — not just the first frame. Videos in
    * the same FAMILY (`media_id % 23`) share dims and the per-frame
    * pixel formula, with frame counts family-anchored plus a small
    * per-id jitter (`(id/3) % 3` extra frames — a trim/truncation
    * stand-in), so a shorter video's keyframes are a prefix of a longer
    * family-mate's and family-mates overlap heavily (near-dups at 2/3)
    * while 3-frame families and cross-family hash coincidences exercise
    * the reject side. Frame `f`'s luma at (x, y) is
    * `(family*7 + f*131 + x*13 + y*101) % 256` — integer-replayable by
    * the DuckDB oracle without parsing container bytes, the
    * [[synthesizeOne]] convention.
    */
  def synthesizeVideoOne(id: Long): MediaRecord = {
    val family = (id % 23).toInt
    val w = family % 11 + 4
    val h = family % 5 + 4
    val nFrames = (family % 24 + 3 + (id / 3) % 3).toInt
    val frames = Array.tabulate(nFrames) { f =>
      val plane = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          plane(y * w + x) =
            ((family * 7 + f * 131 + x * 13 + y * 101) % 256).toByte
          x += 1
        }
        y += 1
      }
      plane
    }
    MediaRecord(id, "video", Codec.encodeY4mMono(Codec.VideoFrames(w, h, frames)),
      MediaMeta(w, h, 0, (nFrames - 1) * 10000, "y4m"))
  }

  def synthesizeVideos(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .filter(_ % 3 == 2)
      .map(synthesizeVideoOne)
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

  /** Batch decode: one pass per partition, real [[Codec]] parse per record.
    * The mapPartitions shape is what a heavier decoder needs too (amortized
    * codec init per partition, streaming iterator, no materialized batch) —
    * a JNI/JPEG decoder would initialize here and reuse across the
    * partition's records.
    */
  def decodeFeatures(ds: Dataset[MediaRecord], dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { rec =>
        MediaFeatures(rec.media_id, rec.kind, rec.bytes.length,
          decodeOne(rec, dim))
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
