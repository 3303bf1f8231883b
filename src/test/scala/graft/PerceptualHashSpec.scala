package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{Codec, Multimodal, PerceptualHash}

class PerceptualHashSpec extends SparkSpec {
  import spark.implicits._

  private def solid(w: Int, h: Int, v: Int): Codec.ImagePixels =
    Codec.ImagePixels(w, h, Array.fill(3 * w * h)(v.toByte))

  private def gradient(w: Int, h: Int, shift: Int = 0): Codec.ImagePixels = {
    val rgb = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      rgb(3 * (y * w + x) + c) = math.min(255, x * 16 + shift).toByte
    Codec.ImagePixels(w, h, rgb)
  }

  test("aHash: flat image hashes to 0 (no cell beats the mean); half-split sets the bright half") {
    assert(PerceptualHash.aHash64(solid(8, 8, 100)) == 0L)
    // left half dark, right half bright: bright cells strictly above mean
    val rgb = new Array[Byte](3 * 8 * 8)
    for (y <- 0 until 8; x <- 0 until 8; c <- 0 until 3)
      rgb(3 * (y * 8 + x) + c) = (if (x < 4) 10 else 200).toByte
    val h = PerceptualHash.aHash64(Codec.ImagePixels(8, 8, rgb))
    // bits k with k%8 >= 4 set, others clear
    (0 until 64).foreach { k =>
      val expected = (k % 8) >= 4
      assert(((h >> k) & 1L) == (if (expected) 1L else 0L), s"bit $k")
    }
  }

  test("dHash: monotone gradient sets no bits; reversed gradient sets all (9x8 grid, w>=9)") {
    // increasing left->right: l0 > l1 never true
    assert(PerceptualHash.dHash64(gradient(16, 8)) == 0L)
    val rev = {
      val g = gradient(16, 8)
      val rgb = new Array[Byte](g.rgb.length)
      for (y <- 0 until 8; x <- 0 until 16; c <- 0 until 3)
        rgb(3 * (y * 16 + x) + c) = g.rgb(3 * (y * 16 + (15 - x)) + c)
      Codec.ImagePixels(16, 8, rgb)
    }
    // strictly decreasing ONLY where the sampled neighbor column differs;
    // with w=16 the 9-grid samples columns 0,1,3,5,7,8,10,12,14 — all
    // strictly decreasing pairs
    assert(PerceptualHash.dHash64(rev) == -1L, "all 64 gradient signs flip")
  }

  test("dHash is invariant to a global brightness shift; aHash to contrast-preserving ones") {
    val a = gradient(12, 10)
    val b = gradient(12, 10, shift = 30) // same gradients, brighter
    assert(PerceptualHash.dHash64(a) == PerceptualHash.dHash64(b))
  }

  test("tiny rasters (below the 8x8 grid) hash without error and deterministically") {
    val img = solid(4, 4, 7)
    assert(PerceptualHash.aHash64(img) == PerceptualHash.aHash64(img))
    assert(PerceptualHash.dHash64(img) == 0L, "flat image has no gradients")
  }

  test("blocked near-dup pairs equal brute force at maxHamming <= 15") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(120)
    val hashed = PerceptualHash
      .hashes(Multimodal.synthesizeFromDocuments(docs)).toDF().cache()
    val blocked = PerceptualHash
      .nearDupPairs(hashed, "media_id", "ahash", maxHamming = 12)
      .select("id_a", "id_b", "hamming")
      .collect().map(_.toSeq).toSet
    val rows = hashed.select("media_id", "ahash").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, ha) <- rows; (ib, hb) <- rows
      if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= 12
    } yield Seq(ia, ib, d)).toSet
    assert(blocked == brute,
      "quarter blocking must be pair-lossless at hamming <= 15")
    hashed.unpersist()
  }

  test("audio fingerprint: hand-built envelopes, volume invariance, short clips") {
    def pcm(samples: Seq[Int]) =
      Codec.AudioPcm(16000, 1, samples.map(_.toShort).toArray)
    // loud-quiet alternating 128-sample clip: 2 samples per segment, so
    // segment energies alternate high/low -> bit k set iff seg k loud
    val alt = pcm((0 until 128).map(i => if ((i / 2) % 2 == 0) 1000 else 10))
    val h = PerceptualHash.audioHash64(alt)
    (0 until 63).foreach { k =>
      assert(((h >> k) & 1L) == (if (k % 2 == 0) 1L else 0L), s"bit $k")
    }
    // volume scaling preserves every envelope sign
    val loud = pcm((0 until 128).map(i => if ((i / 2) % 2 == 0) 3000 else 30))
    assert(PerceptualHash.audioHash64(loud) == h)
    // clips shorter than 64 samples hash deterministically (empty segments)
    val short = pcm(Seq(5, -5, 100))
    assert(PerceptualHash.audioHash64(short) == PerceptualHash.audioHash64(short))
    // flat clip: no segment beats its successor
    assert(PerceptualHash.audioHash64(pcm(Seq.fill(128)(77))) == 0L)
  }

  test("audio rows drop from the hash stream; rasters keep kind labels") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(30)
    val out = PerceptualHash
      .hashes(Multimodal.synthesizeFromDocuments(docs)).toDF()
    assert(out.filter(col("kind") === "audio").isEmpty)
    assert(out.select("kind").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("image", "video")))
  }

  test("y4m mono container round-trips frames byte-for-byte; sniff and guards hold") {
    val frames = Array(
      Array.tabulate(5 * 3)(i => (i * 7 % 256).toByte),
      Array.tabulate(5 * 3)(i => (255 - i).toByte))
    val v = Codec.VideoFrames(5, 3, frames)
    val bytes = Codec.encodeY4mMono(v)
    assert(Codec.sniffFormat(bytes) == "y4m")
    val back = Codec.decodeY4mMono(bytes)
    assert(back.width == 5 && back.height == 3 && back.frames.length == 2)
    assert(back.frames(0).sameElements(frames(0)) &&
      back.frames(1).sameElements(frames(1)))
    // mono expansion: (r+g+b)/3 recovers the plane byte exactly
    val img = Codec.monoFrame(back, 1)
    assert((0 until 15).forall { i =>
      val p = 3 * i
      ((img.rgb(p) & 0xff) + (img.rgb(p + 1) & 0xff) + (img.rgb(p + 2) & 0xff)) / 3 ==
        (frames(1)(i) & 0xff)
    })
    intercept[IllegalArgumentException](
      Codec.decodeY4mMono("YUV4MPEG2 W4 H4 C420\nFRAME\n".getBytes ++ new Array[Byte](24)))
  }

  test("every keyframe on the declared grid hashes — count equals frameOffsets' sequence") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    val vids = Multimodal.synthesizeVideos(docs)
    val perVideo = PerceptualHash.videoKeyframeHashes(vids).toDF()
      .groupBy(col("media_id")).agg(count(lit(1)).as("n_hashes"))
    val declared = Multimodal.frameOffsets(
        vids.toDF().select(col("media_id"), col("kind"), col("meta")))
      .select(col("media_id"), size(col("frame_offsets_ms")).as("n_frames"))
    assert(perVideo.join(declared, "media_id")
      .filter(col("n_hashes") =!= col("n_frames")).isEmpty,
      "one dHash per keyframe on the 10s grid the metadata declares")
    // frame hashes vary across the grid (not first-frame-only replicated)
    assert(PerceptualHash.videoKeyframeHashes(vids).toDF()
      .groupBy(col("media_id"))
      .agg(countDistinct(col("dhash")).as("nd"), count(lit(1)).as("n"))
      .filter(col("nd") === 1 && col("n") > 2).count() <
      vids.count() / 2,
      "most multi-frame videos must carry more than one distinct keyframe hash")
  }

  test("video near-dup pairs equal brute-force jaccard over keyframe hash sets") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    val kf = PerceptualHash.videoKeyframeHashes(
      Multimodal.synthesizeVideos(docs)).cache()
    // explicit uncapped: this test pins the EXACT join semantics the
    // brute force replays; the default-on cap has its own case below
    val got = PerceptualHash.videoNearDupPairs(kf, 2, 3, maxBucket = None)
      .select("id_a", "id_b", "inter", "union_sz")
      .collect().map(_.toSeq).toSet
    // brute force over the collected hash sets
    val sets = kf.collect().groupBy(_.media_id)
      .map { case (id, rows) => id -> rows.map(_.dhash).toSet }
    val want = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size if inter * 3 >= (sa.size + sb.size - inter) * 2
    } yield Seq[Any](a, b, inter.toLong, (sa.size + sb.size - inter).toLong)).toSet
    assert(got == want, s"got ${got.size} pairs, want ${want.size}")
    assert(want.nonEmpty, "fixture must produce at least one accepted pair")
    // family structure dominates: most accepted pairs share the family
    // residue (tiny rasters CAN hash-collide across families — real
    // perceptual-hash behavior, and exactly why the verify step exists)
    val sameFamily = want.count { case Seq(a: Long, b: Long, _, _) => a % 23 == b % 23 }
    assert(sameFamily * 2 > want.size,
      s"only $sameFamily of ${want.size} accepted pairs share a family")
    kf.unpersist()
  }

  test("degenerate keyframes: the bucket cap bounds candidates; true dups keep exact values") {
    import spark.implicits._
    // adversarial corpus: 50 videos ALL sharing the constant-frame hash 0
    // (black frames), each with 3 unique hashes — and one TRUE near-dup
    // pair (900, 901) sharing 3 real keyframes on top of the black frame
    val degenerate = (1L to 50L).flatMap { id =>
      PerceptualHash.KeyframeHash(id, 0, 0L) +:
        (1 to 3).map(f => PerceptualHash.KeyframeHash(id, f, id * 1000 + f))
    }
    val dups = Seq(900L, 901L).flatMap { id =>
      PerceptualHash.KeyframeHash(id, 0, 0L) +:
        (1 to 3).map(f => PerceptualHash.KeyframeHash(id, f, 777000L + f))
    }
    val kf = spark.createDataset(degenerate ++ dups)

    // uncapped, a permissive threshold accepts every degenerate-only
    // pair: the shared black frame alone clears 1/8 — 50*49/2 pairs of
    // perceptually unrelated videos, the k^2 blow-up
    val uncapped = PerceptualHash.videoNearDupPairs(kf, 1, 8, maxBucket = None)
    assert(uncapped.count() > 1000L)

    // capped: the black-frame bucket contributes at most cap^2/2
    // candidates, so the output collapses to the capped bucket's pairs
    // plus the true dup — which keeps its EXACT inter/union (4 shared of
    // 4 each, jaccard 1.0) because accepted candidates re-count against
    // the full uncapped sets
    val capped = PerceptualHash.videoNearDupPairs(kf, 1, 8, maxBucket = Some(4))
    val rows = capped.collect()
    assert(rows.length <= 4 * 3 / 2 + 1,
      s"capped candidates must be bounded by the bucket cap, got ${rows.length}")
    val dup = rows.find(r => r.getAs[Long]("id_a") == 900L &&
      r.getAs[Long]("id_b") == 901L)
    assert(dup.isDefined, "the true near-dup must survive the cap")
    assert(dup.get.getAs[Long]("inter") == 4L &&
      dup.get.getAs[Long]("union_sz") == 4L,
      s"accepted pairs must keep exact uncapped counts: ${dup.get}")

    // at a REAL threshold the degenerate-only pairs never pass anyway —
    // capped and uncapped agree exactly (the production contract)
    def rowSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rowSet(PerceptualHash.videoNearDupPairs(kf, 2, 3, Some(4))) ==
      rowSet(PerceptualHash.videoNearDupPairs(kf, 2, 3, maxBucket = None)))

    // DEFAULT path: a caller who passes no cap inherits the skew guard.
    // The default equals an explicit Some(64) exactly...
    assert(rowSet(PerceptualHash.videoNearDupPairs(kf, 1, 8)) ==
      rowSet(PerceptualHash.videoNearDupPairs(kf, 1, 8, Some(64))))
    assert(rowSet(PerceptualHash.videoNearDupPairs(kf, 2, 3)) ==
      rowSet(PerceptualHash.videoNearDupPairs(kf, 2, 3, Some(64))))
    // ...and on a bucket WIDER than 64 it actually guards: 150 videos
    // sharing the constant-frame hash would emit 150*149/2 degenerate
    // pairs uncapped at the permissive threshold; the forgotten-parameter
    // default bounds them at 64*63/2 while the true dup survives with
    // exact counts (its real keyframes are unique, so its bucket is
    // never capped)
    val wide = spark.createDataset((1L to 150L).flatMap { id =>
      PerceptualHash.KeyframeHash(id, 0, 0L) +:
        (1 to 3).map(f => PerceptualHash.KeyframeHash(id, f, id * 1000 + f))
    } ++ dups)
    val byDefault = PerceptualHash.videoNearDupPairs(wide, 1, 8).collect()
    assert(byDefault.length.toLong <= 64L * 63 / 2 + 1,
      s"default cap must bound a 150-wide degenerate bucket, got ${byDefault.length}")
    val wideDup = byDefault.find(r => r.getAs[Long]("id_a") == 900L &&
      r.getAs[Long]("id_b") == 901L)
    assert(wideDup.exists(r => r.getAs[Long]("inter") == 4L &&
      r.getAs[Long]("union_sz") == 4L),
      "the true near-dup must survive the default cap with exact counts")
  }
}
