package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class MultimodalSpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {
  private lazy val spark = TestSpark.init()
  import spark.implicits._

  private val docs = Seq(
    (1L, "abcd", "en", "s", 4L),
    (2L, "zzzzzzzz", "en", "s", 8L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("media wrapping + payload metadata without decoding") {
    val meta = Multimodal.payloadMeta(Multimodal.fromDocuments(docs)).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    meta(1L).getAs[Long]("n_bytes") shouldBe 4L
    meta(2L).getAs[Long]("n_bytes") shouldBe 8L
    meta(1L).getAs[String]("magic") shouldBe "61626364" // 'abcd' hex
    meta(1L).getAs[String]("digest") should have length 64
  }

  test("frame sampling explodes byte-strided frames and drops empty tails") {
    val big = Seq((1L, "x" * 600, "en", "s", 600L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val frames = Multimodal.frameSample(Multimodal.fromDocuments(big)).collect()
    frames.map(_.getLong(1)).toSeq shouldBe Seq(0L, 1L, 2L) // 600 bytes / 256 stride
    frames(0).getAs[Array[Byte]]("frame_payload").length shouldBe 256
    frames(2).getAs[Array[Byte]]("frame_payload").length shouldBe 88
  }

  test("perceptual hash: mean-threshold bits over resampled bytes, hand-checked") {
    // 'abcd' -> 16 samples each of 97,98,99,100; total 6304; threshold
    // b*64 >= 6304 flips at 99 -> hi = 32 zero bits, lo = 32 one bits
    val out = Multimodal.perceptualHash(Multimodal.fromDocuments(docs)).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    out(1L).getAs[Long]("phash_hi") shouldBe 0L
    out(1L).getAs[Long]("phash_lo") shouldBe 4294967295L
    // constant payload: every byte equals the mean -> all ones
    out(2L).getAs[Long]("phash_hi") shouldBe 4294967295L
    // near-identical payloads stay near in Hamming distance
    val pair = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far away", "en", "s", 0L),
      (2L, "the quick brown fox jumps over the lazy cat and runs far away", "en", "s", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val h = Multimodal.perceptualHash(Multimodal.fromDocuments(pair)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val dist = java.lang.Long.bitCount(h(1L)._1 ^ h(2L)._1) +
      java.lang.Long.bitCount(h(1L)._2 ^ h(2L)._2)
    dist should be <= 12
  }

  test("resize: deterministic NN byte resample to exactly width*height bytes") {
    val out = Multimodal.resize(Multimodal.fromDocuments(docs), 2, 3).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    out(1L).getAs[Int]("width") shouldBe 2
    out(1L).getAs[Int]("height") shouldBe 3
    out(1L).getAs[String]("mime") shouldBe "application/x-graft-resampled"
    // 'abcd' (4 bytes) NN-resampled to 6: index map i*4/6 = 0,0,1,2,2,3
    out(1L).getAs[Array[Byte]]("payload") shouldBe "aabccd".getBytes("UTF-8")
    // upscale repeats samples; metadata passthrough keeps kind
    out(2L).getAs[Array[Byte]]("payload").length shouldBe 6
    out(2L).getAs[String]("kind") shouldBe "image"
  }

  test("resize rejects dimensions whose product overflows Int") {
    // 65536 x 65536 passes the positivity check but overflows Int to 0;
    // must fail loudly at the driver, not NegativeArraySize on executors
    val e = intercept[IllegalArgumentException] {
      Multimodal.resize(Multimodal.fromDocuments(docs), 65536, 65536)
    }
    e.getMessage should include("overflows")
  }

  test("resampleBytes edge cases: null stays null, empty zero-pads") {
    Multimodal.resampleBytes(null, 4) shouldBe null
    Multimodal.resampleBytes(Array.emptyByteArray, 3) shouldBe Array[Byte](0, 0, 0)
    // identity when target == input length
    Multimodal.resampleBytes("abcd".getBytes, 4) shouldBe "abcd".getBytes
  }

  test("PpmDecoder: parses a real binary PPM (header, comment, raster histogram)") {
    // 2x1 RGB raster: bytes 0x00 0x20 0x40 | 0xE0 0xFF 0x61 -> bins 0,1,2,7,7,3
    val raster = Array[Byte](0x00, 0x20, 0x40, 0xE0.toByte, 0xFF.toByte, 0x61)
    val ppm = "P6\n# a comment\n2 1\n255\n".getBytes("US-ASCII") ++ raster
    val Some((w, h, hist)) = Multimodal.PpmDecoder.decode(ppm)
    w shouldBe 2
    h shouldBe 1
    hist(0) shouldBe 1.0 / 6 +- 1e-12
    hist(7) shouldBe 2.0 / 6 +- 1e-12
    hist.sum shouldBe 1.0 +- 1e-12
    // trailing junk after the full raster is ignored (streams may pad)
    Multimodal.PpmDecoder.decode(ppm ++ Array[Byte](1, 2, 3)).map(_._1) shouldBe Some(2)
  }

  test("PpmDecoder: rejects malformed payloads (fallback contract)") {
    val d = Multimodal.PpmDecoder
    d.decode(null) shouldBe None
    d.decode("plain text that is not ppm".getBytes) shouldBe None
    d.decode("P6\n2 1\n255\n".getBytes ++ Array[Byte](1, 2, 3)) shouldBe None // short raster
    d.decode("P6\n2 1\n65535\n".getBytes ++ new Array[Byte](12)) shouldBe None // 2-byte samples
    d.decode("P6\n0 1\n255\n".getBytes) shouldBe None // zero dimension
  }

  test("extractFeatures: PPM payloads take the real decoder, others the stub") {
    import spark.implicits._
    val raster = new Array[Byte](6) // all zeros -> bin 0
    val ppm = "P6\n2 1\n255\n".getBytes("US-ASCII") ++ raster
    val mixed = Seq(
      (10L, ppm),
      (11L, "not an image at all, 24 b".getBytes("US-ASCII")))
      .toDF("media_id", "payload")
    val f = Multimodal.extractFeatures(mixed).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    // real path: header dims, histogram over the 6 raster bytes only
    f(10L).getAs[Int]("dec_width") shouldBe 2
    f(10L).getAs[Int]("dec_height") shouldBe 1
    f(10L).getSeq[Double](f(10L).fieldIndex("features"))(0) shouldBe 1.0 +- 1e-12
    // fallback path: FakeDecoder's n % 640 dims over all 25 bytes
    f(11L).getAs[Int]("dec_width") shouldBe 25
  }

  test("resizePpm: real 2-D NN resize on the pixel grid, PPM re-encoded") {
    import spark.implicits._
    // 2x2 raster with distinct per-pixel colors: p0=(1,2,3) p1=(4,5,6)
    // p2=(7,8,9) p3=(10,11,12); 1x1 NN resize keeps exactly p0
    val raster = Array.tabulate[Byte](12)(i => (i + 1).toByte)
    val ppm = Multimodal.PpmDecoder.encode(2, 2, raster)
    val df = Seq((1L, ppm), (2L, "not ppm at all".getBytes)).toDF("media_id", "payload")
    val out = Multimodal.resizePpm(df, 1, 1).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    val p1 = out(1L).getAs[Array[Byte]]("payload")
    p1 shouldBe Multimodal.PpmDecoder.encode(1, 1, Array[Byte](1, 2, 3))
    out(1L).getAs[String]("mime") shouldBe "image/x-portable-pixmap"
    // decode of the re-encoded output round-trips
    Multimodal.PpmDecoder.decodeRaster(p1).map(t => (t._1, t._2)) shouldBe Some((1, 1))
    // non-PPM payload takes the 1-D resample fallback
    out(2L).getAs[String]("mime") shouldBe "application/x-graft-resampled"
    out(2L).getAs[Array[Byte]]("payload").length shouldBe 1
  }

  test("pcmStats: little-endian int16 decode, peak/rms/crossings/silence") {
    import spark.implicits._
    // samples: +1, -32768, +32767, 0  (bytes little-endian)
    val pcm = Array[Byte](0x01, 0x00, 0x00, 0x80.toByte, 0xFF.toByte, 0x7F, 0x00, 0x00)
    val df = Seq((1L, pcm), (2L, Array.emptyByteArray)).toDF("media_id", "payload")
    val out = Multimodal.pcmStats(df).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    out(1L).getAs[Long]("n_samples") shouldBe 4L
    out(1L).getAs[Long]("peak") shouldBe 32768L
    // signs +,-,+,+(zero counts non-negative): two transitions
    out(1L).getAs[Long]("zero_crossings") shouldBe 2L
    out(1L).getAs[Long]("n_silent") shouldBe 2L // |1| and |0| under 512
    val expRms = math.round(math.sqrt(
      (1.0 + 32768.0 * 32768 + 32767.0 * 32767 + 0) / 4) * 1000)
    out(1L).getAs[Long]("rms_milli") shouldBe expRms
    // empty payload: zero samples, NULL stats
    out(2L).getAs[Long]("n_samples") shouldBe 0L
    out(2L).isNullAt(out(2L).fieldIndex("peak")) shouldBe true
  }

  /** A minimal valid 16-bit mono PCM WAV around `pcm` (the exact layout
    * SparkEntry's q_multimodal_wav synthesizes, plus an optional stray
    * chunk before `data` to exercise the chunk walk).
    */
  private def wav(pcm: Array[Byte], sampleRate: Int = 8000,
      channels: Int = 1, withJunkChunk: Boolean = false): Array[Byte] = {
    def le32(v: Int) = Array[Byte](
      v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val junk = if (withJunkChunk)
      "LIST".getBytes("US-ASCII") ++ le32(3) ++ Array[Byte](1, 2, 3, 0) // odd → pad
    else Array.emptyByteArray
    val body =
      "WAVE".getBytes("US-ASCII") ++
        "fmt ".getBytes("US-ASCII") ++ le32(16) ++
        le16(1) ++ le16(channels) ++ le32(sampleRate) ++
        le32(sampleRate * channels * 2) ++ le16(channels * 2) ++ le16(16) ++
        junk ++
        "data".getBytes("US-ASCII") ++ le32(pcm.length) ++ pcm
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  test("WavDecoder: parses fmt/data chunks, skips strays, pads odd sizes") {
    val pcm = Array[Byte](0x01, 0x00, 0x00, 0x80.toByte)
    val info = Multimodal.WavDecoder.parse(wav(pcm, sampleRate = 44100,
      withJunkChunk = true)).get
    info.sampleRate shouldBe 44100
    info.bitsPerSample shouldBe 16
    info.channels shouldBe 1
    info.dataLen shouldBe 4
    // the data chunk sits after the padded 3-byte LIST chunk
    val payload = wav(pcm, sampleRate = 44100, withJunkChunk = true)
    payload.slice(info.dataOffset, info.dataOffset + info.dataLen) shouldBe pcm
  }

  test("WavDecoder: rejects malformed containers (fallback contract)") {
    val pcm = Array[Byte](1, 0)
    Multimodal.WavDecoder.parse(null) shouldBe None
    Multimodal.WavDecoder.parse("RIFFxxxx".getBytes) shouldBe None
    // wrong magic
    Multimodal.WavDecoder.parse(
      "RIFX".getBytes ++ wav(pcm).drop(4)) shouldBe None
    // data chunk overruns the payload
    Multimodal.WavDecoder.parse(wav(pcm).dropRight(1)) shouldBe None
    // non-PCM format tag
    val w = wav(pcm); w(20) = 3 // audioFormat = IEEE float
    Multimodal.WavDecoder.parse(w) shouldBe None
    // 8-bit samples rejected (stats tier is 16-bit only)
    val w8 = wav(pcm); w8(34) = 8
    Multimodal.WavDecoder.parse(w8) shouldBe None
  }

  test("wavStats: header facts from parse, stats over the data chunk; raw fallback") {
    import spark.implicits._
    // samples: +1, -32768, +32767, 0 — same as the pcmStats test
    val pcm = Array[Byte](0x01, 0x00, 0x00, 0x80.toByte, 0xFF.toByte, 0x7F, 0x00, 0x00)
    val df = Seq(
      (1L, wav(pcm, sampleRate = 4)), // 4 samples @ 4 Hz → 1000 ms
      (2L, pcm),                      // not a container → raw-PCM fallback
      (3L, wav(Array.emptyByteArray)) // valid WAV, zero samples
    ).toDF("media_id", "payload")
    val out = Multimodal.wavStats(df).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    out(1L).getAs[Int]("sample_rate") shouldBe 4
    out(1L).getAs[Int]("bits") shouldBe 16
    out(1L).getAs[Int]("channels") shouldBe 1
    out(1L).getAs[Long]("duration_ms") shouldBe 1000L
    out(1L).getAs[Long]("n_samples") shouldBe 4L
    out(1L).getAs[Long]("peak") shouldBe 32768L
    out(1L).getAs[Long]("zero_crossings") shouldBe 2L
    out(1L).getAs[Long]("n_silent") shouldBe 2L
    // fallback: identical stats, NULL header facts
    out(2L).isNullAt(out(2L).fieldIndex("sample_rate")) shouldBe true
    out(2L).getAs[Long]("n_samples") shouldBe 4L
    out(2L).getAs[Long]("peak") shouldBe out(1L).getAs[Long]("peak")
    out(2L).getAs[Long]("rms_milli") shouldBe out(1L).getAs[Long]("rms_milli")
    // zero-sample WAV: header facts present, stats NULL
    out(3L).getAs[Int]("sample_rate") shouldBe 8000
    out(3L).getAs[Long]("n_samples") shouldBe 0L
    out(3L).getAs[Long]("duration_ms") shouldBe 0L
    out(3L).isNullAt(out(3L).fieldIndex("peak")) shouldBe true
  }

  test("feature extraction runs per-partition and is deterministic in the bytes") {
    val f = Multimodal.extractFeatures(Multimodal.fromDocuments(docs)).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    val feats1 = f(1L).getSeq[Double](f(1L).fieldIndex("features"))
    feats1.sum shouldBe 1.0 +- 1e-9 // histogram normalized
    f(1L).getAs[Int]("dec_width") shouldBe 4 // stub: n % 640
    // 'z' = 0x7a -> bin 3 for all bytes
    f(2L).getSeq[Double](f(2L).fieldIndex("features"))(3) shouldBe 1.0 +- 1e-9
  }

  // --- PNG/JPEG header tier (round-14) ---

  private def hexBytes(h: String): Array[Byte] =
    h.replaceAll("\\s", "").grouped(2)
      .map(s => Integer.parseInt(s, 16).toByte).toArray

  private def pngBytes(w: Int, h: Int, depth: Int = 8, color: Int = 6) =
    hexBytes("89504E470D0A1A0A" + "0000000D" + "49484452" +
      f"$w%08X" + f"$h%08X" + f"$depth%02X$color%02X" + "000000" + "00000000")

  private def jpegBytes(w: Int, h: Int, marker: String = "C0") =
    hexBytes("FFD8" +
      "FFE000104A46494600010100004800480000" + // APP0 JFIF
      "FFFE0004ABCD" +                         // COM with 2 content bytes
      s"FF${marker}001108" + f"$h%04X" + f"$w%04X" +
      "03012200021101031101" + "FFD9")

  test("PngHeader: IHDR dims/depth/color from real bytes; malformed rejected") {
    Multimodal.PngHeader.parse(pngBytes(640, 480)) shouldBe Some((640, 480, 8, 6))
    Multimodal.PngHeader.parse(pngBytes(1, 1, depth = 16, color = 0)) shouldBe
      Some((1, 1, 16, 0))
    Multimodal.PngHeader.channels(0) shouldBe 1
    Multimodal.PngHeader.channels(2) shouldBe 3
    Multimodal.PngHeader.channels(6) shouldBe 4
    // rejections: truncated, bad signature, wrong first chunk, zero dim,
    // invalid depth/color-type codes
    Multimodal.PngHeader.parse(null) shouldBe None
    Multimodal.PngHeader.parse(pngBytes(640, 480).take(20)) shouldBe None
    Multimodal.PngHeader.parse("not a png at all, just text".getBytes) shouldBe None
    val wrongChunk = pngBytes(640, 480)
    wrongChunk(12) = 'p'.toByte
    Multimodal.PngHeader.parse(wrongChunk) shouldBe None
    Multimodal.PngHeader.parse(pngBytes(0, 480)) shouldBe None
    Multimodal.PngHeader.parse(pngBytes(640, 480, depth = 7)) shouldBe None
    Multimodal.PngHeader.parse(pngBytes(640, 480, color = 5)) shouldBe None
  }

  test("JpegHeader: SOF walk over length-skipped segments; progressive " +
    "SOF2; fill bytes and RST standalone markers; malformed rejected") {
    Multimodal.JpegHeader.parse(jpegBytes(640, 480)) shouldBe Some((640, 480, 8, 3))
    // progressive (SOF2) and extended-sequential (SOF1) are frames too
    Multimodal.JpegHeader.parse(jpegBytes(31, 7, marker = "C2")) shouldBe
      Some((31, 7, 8, 3))
    Multimodal.JpegHeader.parse(jpegBytes(31, 7, marker = "C1")) shouldBe
      Some((31, 7, 8, 3))
    // fill bytes before a marker and a standalone RST are legal padding
    val padded = hexBytes("FFD8" + "FFFFFF" + "D0" +
      "FFC0001108" + "0010" + "0020" + "03012200021101031101FFD9")
    // (FF FF FF D0 = two fill bytes then RST0; then straight to SOF0)
    Multimodal.JpegHeader.parse(padded) shouldBe Some((32, 16, 8, 3))
    // rejections: DHT's C4 is NOT a frame (here with a frame-shaped body
    // but followed by EOI -> no SOF found); SOS before SOF; truncated
    // length; component-count/length mismatch
    Multimodal.JpegHeader.parse(hexBytes(
      "FFD8" + "FFC4001108" + "00100020" + "03012200021101031101" + "FFD9")) shouldBe None
    Multimodal.JpegHeader.parse(hexBytes("FFD8FFDA0002")) shouldBe None
    Multimodal.JpegHeader.parse(hexBytes("FFD8FFE0FFFF")) shouldBe None
    Multimodal.JpegHeader.parse(hexBytes(
      "FFD8" + "FFC0001008" + "00100020" + "0301220002110103" + "FFD9")) shouldBe None
    Multimodal.JpegHeader.parse(null) shouldBe None
    Multimodal.JpegHeader.parse("plain text".getBytes) shouldBe None
  }

  test("imageHeaderMeta: four-tier triage (ppm/png/jpeg/unknown) with " +
    "dims and bits-per-sample from the real parsers") {
    val ppm = ("P6\n4 3\n255\n".getBytes("US-ASCII") ++
      Array.fill(36)('a'.toByte))
    val rows = Seq(
      (1L, pngBytes(123, 45)),
      (2L, jpegBytes(77, 66)),
      (3L, ppm),
      (4L, "just some text".getBytes),
      (5L, null.asInstanceOf[Array[Byte]]))
    val media = spark.createDataFrame(rows).toDF("media_id", "payload")
    val out = Multimodal.imageHeaderMeta(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    def tup(id: Long) = {
      val r = out(id)
      (r.getString(1),
        if (r.isNullAt(2)) -1 else r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3),
        if (r.isNullAt(4)) -1 else r.getInt(4),
        if (r.isNullAt(5)) -1 else r.getInt(5))
    }
    tup(1L) shouldBe ("png", 123, 45, 8, 4)
    tup(2L) shouldBe ("jpeg", 77, 66, 8, 3)
    tup(3L) shouldBe ("ppm", 4, 3, 8, 3)
    tup(4L) shouldBe ("unknown", -1, -1, -1, -1)
    tup(5L) shouldBe ("unknown", -1, -1, -1, -1)
  }

  // --- GIF/WebP header tier (round-15) ---

  private def gifBytes(w: Int, h: Int, packed: Int = 0x70,
      magic: String = "GIF89a") =
    magic.getBytes("US-ASCII") ++ hexBytes(
      f"${w & 0xff}%02X${(w >> 8) & 0xff}%02X" +
        f"${h & 0xff}%02X${(h >> 8) & 0xff}%02X" + f"$packed%02X0000")

  private def riff(variant: String, data: Array[Byte]) =
    "RIFF".getBytes("US-ASCII") ++ hexBytes(
      f"${(data.length + 12) & 0xff}%02X${((data.length + 12) >> 8) & 0xff}%02X0000") ++
      "WEBP".getBytes("US-ASCII") ++ variant.getBytes("US-ASCII") ++
      hexBytes(f"${data.length & 0xff}%02X${(data.length >> 8) & 0xff}%02X0000") ++
      data

  private def vp8Bytes(w: Int, h: Int) = riff("VP8 ", hexBytes(
    "0000009D012A" + f"${w & 0xff}%02X${(w >> 8) & 0xff}%02X" +
      f"${h & 0xff}%02X${(h >> 8) & 0xff}%02X"))

  private def vp8lBytes(w: Int, h: Int, alpha: Boolean = false,
      version: Int = 0) = {
    val bits = (w - 1).toLong | ((h - 1).toLong << 14) |
      (if (alpha) 1L << 28 else 0L) | (version.toLong << 29)
    riff("VP8L", hexBytes("2F" + (0 until 4).map(i =>
      f"${(bits >> (8 * i)) & 0xff}%02X").mkString))
  }

  private def vp8xBytes(w: Int, h: Int, flags: Int = 0) =
    riff("VP8X", hexBytes(f"$flags%02X000000" +
      (0 until 3).map(i => f"${((w - 1) >> (8 * i)) & 0xff}%02X").mkString +
      (0 until 3).map(i => f"${((h - 1) >> (8 * i)) & 0xff}%02X").mkString))

  test("GifHeader: logical screen descriptor from real bytes " +
    "(little-endian dims, packed color resolution); malformed rejected") {
    Multimodal.GifHeader.parse(gifBytes(640, 480)) shouldBe Some((640, 480, 8))
    Multimodal.GifHeader.parse(gifBytes(300, 200, packed = 0x20,
      magic = "GIF87a")) shouldBe Some((300, 200, 3))
    Multimodal.GifHeader.parse(null) shouldBe None
    Multimodal.GifHeader.parse(gifBytes(640, 480).take(12)) shouldBe None
    Multimodal.GifHeader.parse(gifBytes(0, 480)) shouldBe None
    Multimodal.GifHeader.parse(
      gifBytes(640, 480, magic = "GIF88a")) shouldBe None
    Multimodal.GifHeader.parse("not a gif, just text".getBytes) shouldBe None
  }

  test("WebpHeader: VP8 sync-code dims, VP8L packed bits with the alpha " +
    "bit, VP8X u24le canvas with the alpha flag; malformed rejected") {
    Multimodal.WebpHeader.parse(vp8Bytes(640, 480)) shouldBe
      Some((640, 480, 8, 3))
    Multimodal.WebpHeader.parse(vp8lBytes(123, 45)) shouldBe
      Some((123, 45, 8, 3))
    Multimodal.WebpHeader.parse(vp8lBytes(123, 45, alpha = true)) shouldBe
      Some((123, 45, 8, 4))
    Multimodal.WebpHeader.parse(vp8xBytes(70000, 3)) shouldBe
      Some((70000, 3, 8, 3)) // u24 canvas dims exceed u16
    Multimodal.WebpHeader.parse(vp8xBytes(16, 9, flags = 0x10)) shouldBe
      Some((16, 9, 8, 4))
    // rejections: bad sync code, nonzero VP8L version, zero VP8 dim,
    // unknown variant fourcc, chunk size overrunning the payload,
    // truncated, not RIFF at all
    val badSync = vp8Bytes(640, 480); badSync(23) = 0x00
    Multimodal.WebpHeader.parse(badSync) shouldBe None
    Multimodal.WebpHeader.parse(vp8lBytes(123, 45, version = 1)) shouldBe None
    Multimodal.WebpHeader.parse(vp8Bytes(0, 480)) shouldBe None
    Multimodal.WebpHeader.parse(riff("ANMF", Array.fill(10)(0x00.toByte))) shouldBe None
    Multimodal.WebpHeader.parse(vp8Bytes(640, 480).dropRight(2)) shouldBe None
    Multimodal.WebpHeader.parse(vp8lBytes(123, 45).take(20)) shouldBe None
    Multimodal.WebpHeader.parse(null) shouldBe None
    Multimodal.WebpHeader.parse("RIFFxxxxNOTW".getBytes) shouldBe None
  }

  test("imageHeaderMeta: gif and webp tiers triage beside the others") {
    val rows = Seq(
      (1L, gifBytes(11, 22)),
      (2L, vp8Bytes(33, 44)),
      (3L, vp8lBytes(55, 66, alpha = true)),
      (4L, vp8xBytes(77, 88)))
    val media = spark.createDataFrame(rows).toDF("media_id", "payload")
    val out = Multimodal.imageHeaderMeta(media).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5)))
      .toMap
    out(1L) shouldBe ("gif", 11, 22, 8, 1)
    out(2L) shouldBe ("webp", 33, 44, 8, 3)
    out(3L) shouldBe ("webp", 55, 66, 8, 4)
    out(4L) shouldBe ("webp", 77, 88, 8, 3)
  }

  // --- audio container tier (round-15) ---

  private def flacBytes(rate: Int, ch: Int, bps: Int, total: Long,
      blockType: Int = 0, blockLen: Int = 34): Array[Byte] = {
    val packed = (rate.toLong << 44) | ((ch - 1).toLong << 41) |
      ((bps - 1).toLong << 36) | total
    "fLaC".getBytes("US-ASCII") ++
      Array(blockType.toByte, ((blockLen >> 16) & 0xff).toByte,
        ((blockLen >> 8) & 0xff).toByte, (blockLen & 0xff).toByte) ++
      hexBytes("10001000000000000000") ++
      (0 until 8).map(i => ((packed >>> (8 * (7 - i))) & 0xff).toByte) ++
      Array.fill(16)(0.toByte)
  }

  private def mp3Bytes(brIdx: Int, srIdx: Int, mono: Boolean,
      b1: Int = 0xFB, id3Size: Int = -1, tail: Int = 0): Array[Byte] = {
    val id3 = if (id3Size < 0) Array.emptyByteArray
      else "ID3".getBytes("US-ASCII") ++
        hexBytes("040000") ++
        Array(((id3Size >> 21) & 0x7f).toByte, ((id3Size >> 14) & 0x7f).toByte,
          ((id3Size >> 7) & 0x7f).toByte, (id3Size & 0x7f).toByte) ++
        Array.fill(id3Size)(0.toByte)
    id3 ++ Array(0xFF.toByte, b1.toByte,
      ((brIdx << 4) | (srIdx << 2)).toByte,
      (if (mono) 0xC0 else 0x00).toByte) ++ Array.fill(tail)(0.toByte)
  }

  private def oggBytes(rate: Long, ch: Int, headerType: Int = 0x02,
      ptype: Int = 1, vver: Int = 0): Array[Byte] =
    "OggS".getBytes("US-ASCII") ++ Array(0.toByte, headerType.toByte) ++
      Array.fill(20)(0.toByte) ++ Array(1.toByte, 30.toByte) ++
      Array(ptype.toByte) ++ "vorbis".getBytes("US-ASCII") ++
      Array(vver.toByte, 0.toByte, 0.toByte, 0.toByte) ++
      Array(ch.toByte) ++
      (0 until 4).map(i => ((rate >> (8 * i)) & 0xff).toByte) ++
      Array.fill(12)(0.toByte) ++ Array(0.toByte, 1.toByte)

  test("FlacHeader: STREAMINFO packed facts from real bytes; " +
    "malformed rejected") {
    Multimodal.FlacHeader.parse(flacBytes(44100, 2, 16, 1234567L)) shouldBe
      Some((44100, 2, 16, 1234567L))
    Multimodal.FlacHeader.parse(flacBytes(8000, 1, 24, 0L)) shouldBe
      Some((8000, 1, 24, 0L))
    // rejections: wrong magic, non-STREAMINFO first block, wrong block
    // length, zero rate, truncated, null
    Multimodal.FlacHeader.parse("fLaX".getBytes ++
      flacBytes(8000, 1, 16, 1L).drop(4)) shouldBe None
    Multimodal.FlacHeader.parse(
      flacBytes(8000, 1, 16, 1L, blockType = 4)) shouldBe None
    Multimodal.FlacHeader.parse(
      flacBytes(8000, 1, 16, 1L, blockLen = 33)) shouldBe None
    Multimodal.FlacHeader.parse(flacBytes(0, 1, 16, 1L)) shouldBe None
    Multimodal.FlacHeader.parse(flacBytes(8000, 1, 16, 1L).take(40)) shouldBe None
    Multimodal.FlacHeader.parse(null) shouldBe None
  }

  test("Mp3Header: table-driven rate/bitrate, ID3v2 synchsafe skip, " +
    "mono/stereo mode; reserved fields rejected") {
    // MPEG1 Layer III, brIdx 9 -> 128 kbps, srIdx 1 -> 48000, stereo
    Multimodal.Mp3Header.parse(mp3Bytes(9, 1, mono = false)) shouldBe
      Some((48000, 2, 128, 0))
    // behind a 6-byte ID3v2 tag: frame offset 16
    Multimodal.Mp3Header.parse(mp3Bytes(9, 0, mono = true, id3Size = 6)) shouldBe
      Some((44100, 1, 128, 16))
    // a >127-byte tag exercises the multi-byte synchsafe encoding
    Multimodal.Mp3Header.parse(mp3Bytes(1, 2, mono = false,
      id3Size = 300)) shouldBe Some((32000, 2, 32, 310))
    // MPEG2 Layer III (b1 0xF3): the V2 rate and bitrate tables
    Multimodal.Mp3Header.parse(mp3Bytes(14, 0, mono = true, b1 = 0xF3)) shouldBe
      Some((22050, 1, 160, 0))
    // MPEG1 Layer I (b1 0xFF is sync-extension... layer I = bits 11 ->
    // b1 0xFF would set all; use 0xFE + layer I bits: ver 3, layer 3)
    Multimodal.Mp3Header.parse(mp3Bytes(14, 0, mono = false, b1 = 0xFE)) shouldBe
      Some((44100, 2, 448, 0))
    // rejections: reserved version (b1 0xEB), reserved layer (b1 0xF9),
    // free bitrate (0), invalid bitrate (15), invalid sample-rate index
    // (3), ID3 size overrunning the payload, bad sync, truncated, null
    Multimodal.Mp3Header.parse(mp3Bytes(9, 1, mono = false, b1 = 0xEB)) shouldBe None
    Multimodal.Mp3Header.parse(mp3Bytes(9, 1, mono = false, b1 = 0xF9)) shouldBe None
    Multimodal.Mp3Header.parse(mp3Bytes(0, 1, mono = false)) shouldBe None
    Multimodal.Mp3Header.parse(mp3Bytes(15, 1, mono = false)) shouldBe None
    Multimodal.Mp3Header.parse(mp3Bytes(9, 3, mono = false)) shouldBe None
    val overrun = mp3Bytes(9, 1, mono = false, id3Size = 6).take(18)
    Multimodal.Mp3Header.parse(overrun) shouldBe None
    Multimodal.Mp3Header.parse(hexBytes("FE FB 94 00")) shouldBe None
    Multimodal.Mp3Header.parse(mp3Bytes(9, 1, mono = false).take(3)) shouldBe None
    Multimodal.Mp3Header.parse(null) shouldBe None
  }

  test("OggVorbisHeader: BOS page + identification packet; " +
    "malformed rejected") {
    Multimodal.OggVorbisHeader.parse(oggBytes(44100L, 2)) shouldBe
      Some((44100, 2))
    Multimodal.OggVorbisHeader.parse(oggBytes(8000L, 1)) shouldBe
      Some((8000, 1))
    // rejections: non-BOS page, wrong packet type, nonzero vorbis
    // version, zero rate, zero channels, bad capture, truncated, null
    Multimodal.OggVorbisHeader.parse(
      oggBytes(44100L, 2, headerType = 0)) shouldBe None
    Multimodal.OggVorbisHeader.parse(
      oggBytes(44100L, 2, ptype = 3)) shouldBe None
    Multimodal.OggVorbisHeader.parse(
      oggBytes(44100L, 2, vver = 1)) shouldBe None
    Multimodal.OggVorbisHeader.parse(oggBytes(0L, 2)) shouldBe None
    Multimodal.OggVorbisHeader.parse(oggBytes(44100L, 0)) shouldBe None
    Multimodal.OggVorbisHeader.parse(
      "OggX".getBytes ++ oggBytes(44100L, 2).drop(4)) shouldBe None
    Multimodal.OggVorbisHeader.parse(oggBytes(44100L, 2).take(30)) shouldBe None
    Multimodal.OggVorbisHeader.parse(null) shouldBe None
  }

  test("audioHeaderMeta: the five tiers triage with integer-exact " +
    "durations where the container states them") {
    val pcm = Array.fill(32000)(0.toByte) // 16000 samples @ 8000 Hz = 2 s
    val rows = Seq(
      (1L, wav(pcm)),
      (2L, flacBytes(44100, 2, 16, 88200L)),   // 88200 samples = 2000 ms
      (3L, flacBytes(44100, 2, 16, 0L)),       // unknown total -> null
      (4L, mp3Bytes(9, 1, mono = false, id3Size = 6, tail = 3996)),
      (5L, oggBytes(22050L, 1)),
      (6L, "just text".getBytes))
    val media = spark.createDataFrame(rows).toDF("media_id", "payload")
    val out = Multimodal.audioHeaderMeta(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    def f(r: org.apache.spark.sql.Row) = (r.getString(1),
      if (r.isNullAt(2)) null else r.getInt(2),
      if (r.isNullAt(3)) null else r.getInt(3),
      if (r.isNullAt(4)) null else r.getInt(4),
      if (r.isNullAt(5)) null else r.getLong(5))
    f(out(1L)) shouldBe ("wav", 8000, 1, 16, 2000L)
    f(out(2L)) shouldBe ("flac", 44100, 2, 16, 2000L)
    f(out(3L)) shouldBe ("flac", 44100, 2, 16, null)
    // mp3: 16-byte ID3 skipped, 4 + 3996 audio bytes at 128 kbps ->
    // 4000*8/128 = 250 ms
    f(out(4L)) shouldBe ("mp3", 48000, 2, null, 250L)
    f(out(5L)) shouldBe ("ogg", 22050, 1, null, null)
    f(out(6L)) shouldBe ("unknown", null, null, null, null)
  }

  test("extractFeatures: PNG/JPEG payloads get header-parsed dims with " +
    "the stream-histogram features") {
    val rows = Seq((1L, pngBytes(123, 45)), (2L, jpegBytes(77, 66)))
    val media = spark.createDataFrame(rows).toDF("media_id", "payload")
    val f = Multimodal.extractFeatures(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    f(1L).getAs[Int]("dec_width") shouldBe 123 // parsed, not n % 640
    f(1L).getAs[Int]("dec_height") shouldBe 45
    f(2L).getAs[Int]("dec_width") shouldBe 77
    f(2L).getAs[Int]("dec_height") shouldBe 66
    f(1L).getSeq[Double](f(1L).fieldIndex("features")).sum shouldBe 1.0 +- 1e-9
  }

  /** A minimal single-IFD TIFF: inline SHORT entries for dims/bits/spp
    * in either byte order (the shared builder keeps the two tests'
    * layouts honest — only the BOM and integer order differ).
    */
  private def tiffBytes(w: Int, h: Int, le: Boolean = true,
      spp: Int = 3): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(128).order(
      if (le) java.nio.ByteOrder.LITTLE_ENDIAN
      else java.nio.ByteOrder.BIG_ENDIAN)
    bb.put((if (le) "II" else "MM").getBytes)
    bb.putShort(42); bb.putInt(8)
    bb.putShort(4)
    def ent(tag: Int, v: Int): Unit = {
      bb.putShort(tag.toShort); bb.putShort(3); bb.putInt(1)
      bb.putShort(v.toShort); bb.putShort(0)
    }
    ent(256, w); ent(257, h); ent(258, 8); ent(277, spp)
    bb.putInt(0)
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  /** TIFF exercising the non-inline paths: LONG-typed height and a
    * count-2 BitsPerSample behind a value offset.
    */
  private def tiffOffsetBytes(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(128).order(
      java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("II".getBytes); bb.putShort(42); bb.putInt(8)
    bb.putShort(4)
    bb.putShort(256); bb.putShort(3); bb.putInt(1)
    bb.putShort(w.toShort); bb.putShort(0)
    bb.putShort(257); bb.putShort(4); bb.putInt(1); bb.putInt(h) // LONG
    // BitsPerSample count 2 -> the value field is an offset (62: header
    // 8 + count 2 + 4 entries * 12 + terminator 4)
    bb.putShort(258); bb.putShort(3); bb.putInt(2); bb.putInt(62)
    bb.putShort(277); bb.putShort(3); bb.putInt(1)
    bb.putShort(2); bb.putShort(0)
    bb.putInt(0)
    bb.putShort(16); bb.putShort(16) // the two SHORTs at offset 62
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  private def bmpBytes(w: Int, h: Int, bpp: Int = 24,
      dib: Int = 40): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(70).order(
      java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("BM".getBytes); bb.putInt(70); bb.putInt(0); bb.putInt(54)
    bb.putInt(dib)
    if (dib == 12) {
      bb.putShort(w.toShort); bb.putShort(h.toShort)
      bb.putShort(1); bb.putShort(bpp.toShort)
    } else {
      bb.putInt(w); bb.putInt(h); bb.putShort(1); bb.putShort(bpp.toShort)
    }
    java.util.Arrays.copyOf(bb.array(), math.max(bb.position(), 30))
  }

  test("TiffHeader: IFD walk in both byte orders, LONG dims, offset " +
    "BitsPerSample, spec defaults; malformed rejected") {
    Multimodal.TiffHeader.parse(tiffBytes(640, 480)) shouldBe
      Some((640, 480, 8, 3))
    Multimodal.TiffHeader.parse(tiffBytes(123, 45, le = false, spp = 1))
      .shouldBe(Some((123, 45, 8, 1)))
    // LONG height + count-2 BitsPerSample behind its offset (first
    // sample read), SamplesPerPixel 2
    Multimodal.TiffHeader.parse(tiffOffsetBytes(77, 70000)) shouldBe
      Some((77, 70000, 16, 2))
    // absent 258/277 default to 1 per the spec: build with dims only
    val dimsOnly = {
      val bb = java.nio.ByteBuffer.allocate(64).order(
        java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("II".getBytes); bb.putShort(42); bb.putInt(8)
      bb.putShort(2)
      bb.putShort(256); bb.putShort(3); bb.putInt(1)
      bb.putShort(9); bb.putShort(0)
      bb.putShort(257); bb.putShort(3); bb.putInt(1)
      bb.putShort(7); bb.putShort(0)
      bb.putInt(0)
      java.util.Arrays.copyOf(bb.array(), bb.position())
    }
    Multimodal.TiffHeader.parse(dimsOnly) shouldBe Some((9, 7, 1, 1))
    // rejections: wrong BOM, wrong magic, IFD offset overrun, zero
    // width, missing dims, entry table overrunning the payload,
    // value offset overrunning the payload, truncation, null
    val badBom = tiffBytes(640, 480); badBom(0) = 'X'
    Multimodal.TiffHeader.parse(badBom) shouldBe None
    val badMagic = tiffBytes(640, 480); badMagic(2) = 0x2b
    Multimodal.TiffHeader.parse(badMagic) shouldBe None
    val farIfd = tiffBytes(640, 480); farIfd(4) = 0x7f.toByte
    Multimodal.TiffHeader.parse(farIfd) shouldBe None
    Multimodal.TiffHeader.parse(tiffBytes(0, 480)) shouldBe None
    val noDims = {
      val bb = java.nio.ByteBuffer.allocate(32).order(
        java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("II".getBytes); bb.putShort(42); bb.putInt(8)
      bb.putShort(1)
      bb.putShort(277); bb.putShort(3); bb.putInt(1)
      bb.putShort(3); bb.putShort(0)
      bb.putInt(0)
      java.util.Arrays.copyOf(bb.array(), bb.position())
    }
    Multimodal.TiffHeader.parse(noDims) shouldBe None
    val shortTable = tiffBytes(640, 480); shortTable(8) = 0x7f.toByte
    Multimodal.TiffHeader.parse(shortTable) shouldBe None
    val farBits = tiffOffsetBytes(77, 70000)
    farBits(8 + 2 + 2 * 12 + 8) = 0x7f.toByte // the 258 entry's offset
    Multimodal.TiffHeader.parse(farBits) shouldBe None
    Multimodal.TiffHeader.parse(tiffBytes(640, 480).take(20)) shouldBe None
    Multimodal.TiffHeader.parse(null) shouldBe None
  }

  test("BmpHeader: INFO family s32le dims with top-down negative " +
    "height, CORE u16le dims, palette vs truecolor channels; " +
    "malformed rejected") {
    Multimodal.BmpHeader.parse(bmpBytes(640, 480)) shouldBe
      Some((640, 480, 8, 3))
    Multimodal.BmpHeader.parse(bmpBytes(33, -44)) shouldBe
      Some((33, 44, 8, 3)) // top-down: magnitude reported
    Multimodal.BmpHeader.parse(bmpBytes(10, 20, bpp = 8)) shouldBe
      Some((10, 20, 8, 1)) // palette-indexed
    Multimodal.BmpHeader.parse(bmpBytes(10, 20, bpp = 4)) shouldBe
      Some((10, 20, 4, 1))
    Multimodal.BmpHeader.parse(bmpBytes(10, 20, bpp = 32)) shouldBe
      Some((10, 20, 8, 4))
    Multimodal.BmpHeader.parse(bmpBytes(10, 20, dib = 108)) shouldBe
      Some((10, 20, 8, 3)) // V4 header accepted
    Multimodal.BmpHeader.parse(bmpBytes(11, 22, dib = 12)) shouldBe
      Some((11, 22, 8, 3)) // BITMAPCOREHEADER
    // rejections: unknown DIB size, planes != 1, bad bpp, zero height,
    // wrong magic, truncation, null
    Multimodal.BmpHeader.parse(bmpBytes(10, 20, dib = 64)) shouldBe None
    val badPlanes = bmpBytes(10, 20); badPlanes(26) = 2
    Multimodal.BmpHeader.parse(badPlanes) shouldBe None
    Multimodal.BmpHeader.parse(bmpBytes(10, 20, bpp = 13)) shouldBe None
    Multimodal.BmpHeader.parse(bmpBytes(10, 0)) shouldBe None
    Multimodal.BmpHeader.parse("XXlooks nothing like a bitmap".getBytes)
      .shouldBe(None)
    Multimodal.BmpHeader.parse(bmpBytes(10, 20).take(20)) shouldBe None
    Multimodal.BmpHeader.parse(null) shouldBe None
  }

  test("imageHeaderMeta: tiff and bmp tiers triage beside the others") {
    val rows = Seq(
      (1L, tiffBytes(11, 22)),
      (2L, tiffBytes(33, 44, le = false, spp = 1)),
      (3L, bmpBytes(55, -66, bpp = 8)),
      (4L, bmpBytes(77, 88, dib = 12)))
    val media = spark.createDataFrame(rows).toDF("media_id", "payload")
    val out = Multimodal.imageHeaderMeta(media).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5)))
      .toMap
    out(1L) shouldBe ("tiff", 11, 22, 8, 3)
    out(2L) shouldBe ("tiff", 33, 44, 8, 1)
    out(3L) shouldBe ("bmp", 55, 66, 8, 1)
    out(4L) shouldBe ("bmp", 77, 88, 8, 3)
  }
}
