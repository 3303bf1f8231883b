package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Codec, Multimodal}

/** Pure-JVM codec specs: golden in-repo fixtures (byte-level, written by an
  * independent encoder), encode/decode roundtrips, malformed-input failure,
  * and the hand-computed feature values.
  */
class CodecSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  test("golden PPM: header comment tolerated, dims and pixels exact") {
    val img = Codec.decodePpm(fixture("golden.ppm"))
    assert(img.width == 4 && img.height == 2)
    // pixel (x,y): r=x*60, g=y*100, b=20 (written by the python generator)
    for (y <- 0 until 2; x <- 0 until 4) {
      val p = 3 * (y * 4 + x)
      assert((img.rgb(p) & 0xff) == x * 60, s"r($x,$y)")
      assert((img.rgb(p + 1) & 0xff) == y * 100, s"g($x,$y)")
      assert((img.rgb(p + 2) & 0xff) == 20, s"b($x,$y)")
    }
    // hand-computed 8-bin luminance histogram: lums 6,26,46,66,40,60,80,100
    // -> bins [2,3,2,1,0,0,0,0] of 8 pixels -> per-mille 250/375/250/125
    val hist = Codec.lumaHistogram(img, 8)
    assert(hist.toSeq == Seq(0.250f, 0.375f, 0.250f, 0.125f, 0f, 0f, 0f, 0f))
  }

  test("golden BMP: bottom-up rows and padding unwound, pixels exact") {
    val img = Codec.decodeBmp(fixture("golden.bmp"))
    assert(img.width == 3 && img.height == 3)
    for (y <- 0 until 3; x <- 0 until 3) {
      val p = 3 * (y * 3 + x)
      assert((img.rgb(p) & 0xff) == 10 * x, s"r($x,$y)")
      assert((img.rgb(p + 1) & 0xff) == 10 * y, s"g($x,$y)")
      assert((img.rgb(p + 2) & 0xff) == 200, s"b($x,$y)")
    }
  }

  test("golden WAV: chunk walk skips LIST, samples exact, energy profile hand-checked") {
    val a = Codec.decodeWav(fixture("golden.wav"))
    assert(a.sampleRate == 8000 && a.channels == 1)
    val expected = Seq[Short](0, 1000, -1000, 32767, -32768, 16384, -16384, 100,
      -100, 0, 500, -500, 8192, -8192, 32000, -32000)
    assert(a.samples.toSeq == expected)
    // 4 segments of 4: sumabs 34767/65636/1100/80384 over 4*32768
    val prof = Codec.energyProfile(a, 4)
    assert(prof.toSeq == Seq(0.265f, 0.500f, 0.008f, 0.613f))
  }

  test("roundtrips: encode/decode identity for PPM, BMP (with padding), WAV") {
    val rnd = new scala.util.Random(42)
    for (w <- Seq(1, 3, 4, 7); h <- Seq(1, 2, 5)) {
      val rgb = Array.fill(3 * w * h)(rnd.nextInt(256).toByte)
      val img = Codec.ImagePixels(w, h, rgb)
      assert(Codec.decodePpm(Codec.encodePpm(img)).rgb.toSeq == rgb.toSeq, s"ppm ${w}x$h")
      assert(Codec.decodeBmp(Codec.encodeBmp(img)).rgb.toSeq == rgb.toSeq, s"bmp ${w}x$h")
    }
    val samples = Array.fill(37)(rnd.nextInt(65536) - 32768).map(_.toShort)
    val back = Codec.decodeWav(Codec.encodeWav(Codec.AudioPcm(16000, 1, samples)))
    assert(back.samples.toSeq == samples.toSeq && back.sampleRate == 16000)
  }

  test("malformed inputs fail loudly, never decode to garbage") {
    val ppm = fixture("golden.ppm"); val bmp = fixture("golden.bmp"); val wav = fixture("golden.wav")
    def boom(bytes: Array[Byte]): Unit =
      intercept[IllegalArgumentException] {
        Codec.sniffFormat(bytes) match {
          case "ppm" => Codec.decodePpm(bytes)
          case "bmp" => Codec.decodeBmp(bytes)
          case _     => Codec.decodeWav(bytes)
        }
      }
    boom(ppm.take(ppm.length - 5))           // truncated raster
    boom(bmp.take(40))                        // truncated header
    boom(wav.take(wav.length - 3))            // truncated data chunk
    boom("totally not media".getBytes)        // unknown container
    val badMax = "P6\n2 2\n65535\n".getBytes ++ Array.fill(12)(0.toByte)
    boom(badMax)                              // 16-bit maxval unsupported
  }

  test("decode dispatch trusts bytes, not the declared kind") {
    // a WAV blob labelled "image" must still decode as audio (by sniffing)
    val samples = Array.tabulate(16)(i => (i * 1000).toShort)
    val bytes = Codec.encodeWav(Codec.AudioPcm(16000, 1, samples))
    val rec = Multimodal.MediaRecord(1L, "image", bytes,
      Multimodal.MediaMeta(0, 0, 16000, 1, "wav"))
    val feats = Multimodal.decodeOne(rec, 4)
    assert(feats.length == 4)
    assert(feats.toSeq == Codec.energyProfile(Codec.decodeWav(bytes), 4).toSeq)
  }

  test("synthesizeOne produces real containers that decode to the formula pixels") {
    for (id <- 0L until 12L) {
      val rec = Multimodal.synthesizeOne(id)
      val feats = Multimodal.decodeOne(rec, 8)
      assert(feats.length == 8)
      rec.kind match {
        case "image" =>
          val img = Codec.decodePpm(rec.bytes)
          assert(img.width == (id % 13 + 4).toInt && img.height == (id % 7 + 4).toInt)
          assert((img.rgb(0) & 0xff) == ((id * 7) % 256).toInt) // pixel (0,0) red lane
        case "video" =>
          val img = Codec.decodeBmp(rec.bytes)
          assert(img.width == (id % 11 + 4).toInt && img.height == (id % 5 + 4).toInt)
        case "audio" =>
          val a = Codec.decodeWav(rec.bytes)
          assert(a.sampleRate == 16000)
          assert(a.samples.length == (id % 50 + 40).toInt)
          assert(a.samples(0) == (((id * 31) % 65536) - 32768).toShort)
      }
    }
  }
}
