package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.multimodal.Codec.ImagePixels

/** Perceptual image hashing — the multimodal half of the dedup story:
  * near-duplicate IMAGES (re-encodes, crops of the same raster, brightness
  * shifts) that byte-level exact dedup can never pair. Classic aHash /
  * dHash (the pHash-family baselines): sample the decoded pixel grid down
  * to a tiny fixed raster, reduce each cell to a bit, and compare hashes
  * by Hamming distance — two perceptually-close images agree on most
  * bits.
  *
  * Everything is EXACT integer arithmetic over the decoded grid
  * (nearest-neighbor grid sampling with floor division, (r+g+b)/3
  * luminance, integer mean) so the q_image_phash / q_image_near_dup
  * oracles replay the hashes bit-for-bit from the synthetic pixel
  * formulas without parsing container bytes — the
  * [[Multimodal.decodeFeatures]] convention.
  *
  * Pairing is the [[graft.dedup.SimHash64]] blocked pattern: by the
  * pigeonhole, Hamming distance <= 15 forces at least one equal 16-bit
  * quarter, so candidates join on (quarter index, quarter value) and the
  * full popcount verifies — never all-pairs. At 100 TB the decode is one
  * narrow mapPartitions pass over the media blobs (amortized codec init),
  * hashes are 8 bytes/image, and the pair join is bounded by quarter-
  * bucket sizes exactly like text SimHash.
  */
object PerceptualHash {

  /** Luminance at a nearest-neighbor-sampled grid cell: gx = i·w/8 (floor)
    * — duplicating pixels below 8px instead of skipping cells, so any
    * positive dims hash.
    */
  private def lumAt(img: ImagePixels, x: Int, y: Int): Int = {
    val p = 3 * (y * img.width + x)
    ((img.rgb(p) & 0xff) + (img.rgb(p + 1) & 0xff) + (img.rgb(p + 2) & 0xff)) / 3
  }

  /** Average hash: 8x8 sampled luminance grid, bit k = (k%8, k/8) cell
    * brighter than the integer mean of the 64 samples.
    */
  def aHash64(img: ImagePixels): Long = {
    val lums = new Array[Int](64)
    var sum = 0
    var k = 0
    while (k < 64) {
      val l = lumAt(img, (k % 8) * img.width / 8, (k / 8) * img.height / 8)
      lums(k) = l
      sum += l
      k += 1
    }
    val mean = sum / 64
    var h = 0L
    k = 0
    while (k < 64) {
      if (lums(k) > mean) h |= (1L << k)
      k += 1
    }
    h
  }

  /** Difference hash: 9x8 sampled luminance grid, bit k = cell (i, j)
    * brighter than its right neighbor (i+1, j) with i = k%8, j = k/8 —
    * gradient signs, robust to global brightness shifts where aHash is
    * robust to local noise; the pair catches more than either alone.
    */
  def dHash64(img: ImagePixels): Long = {
    var h = 0L
    var k = 0
    while (k < 64) {
      val i = k % 8
      val j = k / 8
      val y = j * img.height / 8
      val l0 = lumAt(img, i * img.width / 9, y)
      val l1 = lumAt(img, (i + 1) * img.width / 9, y)
      if (l0 > l1) h |= (1L << k)
      k += 1
    }
    h
  }

  /** Audio fingerprint — the WAV counterpart of [[dHash64]]: 64 equal
    * time segments of mean |amplitude|, bit k = segment k louder than
    * segment (k+1)%64. The comparison cross-multiplies sum·count instead
    * of dividing (exact rational compare, no FP), and clips shorter than
    * 64 samples leave empty segments (sum 0, count 0) whose compares are
    * deterministically false — any clip length hashes. Energy-envelope
    * signs survive volume scaling exactly like dHash survives brightness
    * shifts.
    */
  def audioHash64(pcm: Codec.AudioPcm): Long = {
    val n = pcm.samples.length
    require(n > 0, "audio fingerprint: empty clip")
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var i = 0
    while (i < n) {
      val seg = (i.toLong * 64 / n).toInt
      sums(seg) += math.abs(pcm.samples(i).toInt)
      cnts(seg) += 1
      i += 1
    }
    var h = 0L
    var k = 0
    while (k < 64) {
      val k2 = (k + 1) % 64
      if (sums(k) * cnts(k2) > sums(k2) * cnts(k)) h |= (1L << k)
      k += 1
    }
    h
  }

  final case class AudioHash(media_id: Long, fp: Long)

  /** Decode every WAV record and fingerprint it (raster rows drop) —
    * same one-pass mapPartitions shape as [[hashes]].
    */
  def audioHashes(ds: Dataset[Multimodal.MediaRecord]): Dataset[AudioHash] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.flatMap { rec =>
        Codec.sniffFormat(rec.bytes) match {
          case "wav" =>
            Some(AudioHash(rec.media_id, audioHash64(Codec.decodeWav(rec.bytes))))
          case _ => None
        }
      }
    }
  }

  final case class ImageHashes(media_id: Long, kind: String, ahash: Long, dhash: Long)

  /** Decode every raster record (PPM image / BMP keyframe; audio rows
    * drop) and hash it — one mapPartitions pass over the blobs, the
    * [[Multimodal.decodeFeatures]] shape (heavier codecs would init once
    * per partition here).
    */
  def hashes(ds: Dataset[Multimodal.MediaRecord]): Dataset[ImageHashes] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.flatMap { rec =>
        Codec.sniffFormat(rec.bytes) match {
          case "ppm" =>
            val img = Codec.decodePpm(rec.bytes)
            Some(ImageHashes(rec.media_id, rec.kind, aHash64(img), dHash64(img)))
          case "bmp" =>
            val img = Codec.decodeBmp(rec.bytes)
            Some(ImageHashes(rec.media_id, rec.kind, aHash64(img), dHash64(img)))
          case _ => None
        }
      }
    }
  }

  final case class KeyframeHash(media_id: Long, frame_idx: Int, dhash: Long)

  /** Decode every multi-keyframe video (YUV4MPEG2 records; other
    * containers drop) and dHash EVERY keyframe — the video leg stops
    * being first-frame-only: one mapPartitions pass over the blobs, one
    * 8-byte hash per keyframe on the container's frame grid
    * ([[Multimodal.frameOffsets]] declares the same grid from
    * durationMs). Mono planes expand to the shared RGB raster layout, so
    * the hash arithmetic is IDENTICAL to the image lane's.
    */
  def videoKeyframeHashes(ds: Dataset[Multimodal.MediaRecord]): Dataset[KeyframeHash] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.flatMap { rec =>
        Codec.sniffFormat(rec.bytes) match {
          case "y4m" =>
            val v = Codec.decodeY4mMono(rec.bytes)
            (0 until v.frames.length).iterator.map(f =>
              KeyframeHash(rec.media_id, f, dHash64(Codec.monoFrame(v, f))))
          case _ => Iterator.empty
        }
      }
    }
  }

  /** Near-duplicate videos by KEYFRAME-HASH-SET overlap — the
    * [[graft.dedup.SetSimJoin]] shape on 64-bit keys: two videos pair
    * when the Jaccard of their distinct keyframe-hash sets reaches
    * `num/den` (re-encodes, truncations, and trims share most
    * keyframes; the threshold compare is cross-multiplied integer
    * arithmetic, no FP). Candidates come from an equi-join on the hash
    * value itself — a 64-bit perceptual hash is its own blocking key, so
    * only videos SHARING a keyframe ever meet, never all-pairs; the
    * per-pair intersection count then verifies exactly.
    *
    * Skew guard: real corpora are full of DEGENERATE keyframes — black,
    * white, and constant frames all dHash to the same 64-bit value, so
    * one hash bucket can hold k videos and the self-join would emit k²
    * candidate pairs from content that matches nothing perceptually.
    * `maxBucket` applies the [[graft.dedup.Dedup.capBuckets]] convention
    * to the keyframe-hash buckets: each bucket contributes candidates
    * from its first `maxBucket` ids only (deterministic by id), bounding
    * any bucket's work at maxBucket² while the EMITTED pairs' inter /
    * union / jaccard stay EXACT — accepted candidates re-count their
    * intersection against the full uncapped sets. Recall degrades only
    * for pairs whose EVERY shared keyframe sits beyond a cap — with the
    * cap sized above the corpus's true near-dup cluster width, exactly
    * the degenerate-only pairs a perceptual matcher should not claim.
    *
    * The cap DEFAULTS ON at the image-query convention (64): a
    * production caller who forgets the parameter must inherit the skew
    * guard, not the k² hazard it closes — running uncapped (exhaustive
    * audits, oracle twins that replay the full join) is the explicit
    * `maxBucket = None` opt-out.
    *
    * Returns (id_a, id_b, inter, union_sz, jaccard), id_a < id_b.
    */
  def videoNearDupPairs(
      keyframes: Dataset[KeyframeHash],
      num: Int,
      den: Int,
      maxBucket: Option[Int] = Some(64)
  ): DataFrame = {
    require(num > 0 && den > 0 && num <= den, s"threshold $num/$den not in (0,1]")
    require(maxBucket.forall(_ >= 2),
      s"video near-dup: maxBucket below 2 can never emit a pair, got $maxBucket")
    val hs = keyframes.toDF()
      .select(col("media_id"), col("dhash")).distinct()
    val sizes = hs.groupBy(col("media_id")).agg(count(lit(1)).as("sz"))
    val inter = maxBucket match {
      case None =>
        hs.as("l")
          .join(hs.as("r"),
            col("l.dhash") === col("r.dhash") &&
              col("l.media_id") < col("r.media_id"))
          .groupBy(col("l.media_id").as("id_a"), col("r.media_id").as("id_b"))
          .agg(count(lit(1)).as("inter"))
      case Some(cap) =>
        val w = Window.partitionBy(col("dhash")).orderBy(col("media_id"))
        val capped = hs.withColumn("_bn", row_number().over(w))
          .filter(col("_bn") <= cap).drop("_bn")
        val candidates = capped.as("l")
          .join(capped.as("r"),
            col("l.dhash") === col("r.dhash") &&
              col("l.media_id") < col("r.media_id"))
          .select(col("l.media_id").as("id_a"), col("r.media_id").as("id_b"))
          .distinct()
        // exact re-count over the UNCAPPED sets: candidate pairs are few
        // post-cap, and each expands only by its videos' keyframe counts
        candidates
          .join(hs.select(col("media_id").as("id_a"), col("dhash").as("_ha")),
            "id_a")
          .join(hs.select(col("media_id").as("id_b"), col("dhash").as("_hb")),
            "id_b")
          .filter(col("_ha") === col("_hb"))
          .groupBy(col("id_a"), col("id_b"))
          .agg(count(lit(1)).as("inter"))
    }
    inter
      .join(sizes.withColumnRenamed("media_id", "id_a")
        .withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("media_id", "id_b")
        .withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("union_sz", col("sz_a") + col("sz_b") - col("inter"))
      .filter(col("inter") * den >= col("union_sz") * num)
      .select(col("id_a"), col("id_b"), col("inter"), col("union_sz"),
        (col("inter").cast("double") / col("union_sz").cast("double")).as("jaccard"))
  }

  /** Hamming-banded near-dup pairs over any 64-bit hash column — the
    * [[graft.dedup.Dedup.simhashNearDupPairs]] block join generalized to
    * a precomputed hash: quarter-block candidates, exact popcount verify,
    * `hamming <= maxHamming` accept. Exact (no missed pairs) for
    * maxHamming <= 15 by the pigeonhole on the four 16-bit quarters.
    */
  def nearDupPairs(
      hashed: DataFrame,
      idCol: String,
      hashCol: String,
      maxHamming: Int
  ): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 15,
      s"perceptual near-dup: quarter blocking is exact only for " +
        s"maxHamming in [0, 15], got $maxHamming")
    val blocks = hashed.select(
      col(idCol),
      col(hashCol).as("_h"),
      posexplode(
        array((0 until 4).map(q =>
          shiftright(col(hashCol), q * 16).bitwiseAND(lit(0xffffL))): _*)
      ).as(Seq("block", "key"))
    )
    blocks.as("l")
      .join(
        blocks.as("r"),
        col("l.block") === col("r.block") && col("l.key") === col("r.key") &&
          col(s"l.$idCol") < col(s"r.$idCol"))
      .select(
        col(s"l.$idCol").as("id_a"),
        col(s"r.$idCol").as("id_b"),
        graft.dedup.Dedup.hammingDistance(col("l._h"), col("r._h")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
