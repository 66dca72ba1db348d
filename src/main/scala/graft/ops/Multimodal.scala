package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns plus typed metadata, with decode/feature-extract implemented as
  * per-partition batch transforms.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * deterministic stub ([[FakeDecoder]]) — the Spark-side plumbing (schema,
  * partitioning, batch shape, metadata propagation) is real and tested,
  * and swapping the stub for a JNI/ffmpeg/JPEG decoder changes one
  * function.
  *
  * Scale notes: binary payloads never enter a shuffle here — all derived
  * features are computed in place in a narrow `mapPartitions` pass, and
  * downstream joins/groupBys carry only the small metadata/feature columns.
  * Per-partition batching amortizes any decoder init cost the way Pandas-
  * batch UDFs do on the Python side.
  */
object Multimodal {

  /** Canonical multimodal schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Wrap any table with a binary payload into the media schema —
    * here synthesizing payloads from `documents.text` bytes so the
    * pipeline is runnable in-container on real distributed data.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("image").as("kind"),
      encode(col("text"), "UTF-8").cast(BinaryType).as("payload"),
      lit("application/octet-stream").as("mime"),
      lit(null).cast(IntegerType).as("width"),
      lit(null).cast(IntegerType).as("height"),
      lit(null).cast(LongType).as("duration_ms"))

  /** Cheap payload metadata — pure built-ins, no decode: size, digest,
    * magic-byte sniff. This is the layer that runs over ALL 100 TB; the
    * expensive decode below runs only on the filtered survivors.
    */
  def payloadMeta(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("kind"),
      length(col("payload")).cast("long").as("n_bytes"),
      sha2(col("payload"), 256).as("digest"),
      hex(expr("substring(payload, 1, 4)")).as("magic"))

  /** The decode seam. A real deployment swaps this object for one backed
    * by an actual codec; everything else in the pipeline is unchanged.
    * The fake is deterministic in the payload bytes so tests and oracle
    * runs are stable.
    */
  object FakeDecoder {
    /** "Decode" → (width, height, 8-bin byte histogram as features). */
    def decode(payload: Array[Byte]): (Int, Int, Array[Double]) = {
      val n = if (payload == null) 0 else payload.length
      val hist = new Array[Double](8)
      var i = 0
      while (i < n) { hist((payload(i) & 0xff) >> 5) += 1.0; i += 1 }
      if (n > 0) { var j = 0; while (j < 8) { hist(j) /= n; j += 1 } }
      (n % 640, n % 480, hist)
    }
  }

  /** A REAL pure-JVM decoder for the seam: binary PPM (`P6`), the
    * simplest raster format an image pipeline meets in the wild — ASCII
    * header (`P6`, optional `#` comments, width height maxval, one
    * whitespace byte) followed by `width·height·3` RGB sample bytes.
    * No codec library needed, so the decode tier is honest end to end:
    * header fields come from parsing, features from actual raster bytes.
    *
    * Kept deliberately strict — single-byte samples only (`maxval` ≤ 255),
    * full raster required — because [[extractFeatures]] falls back to
    * [[FakeDecoder]] on `None`, and a half-parsed payload must take the
    * fallback, not produce half-real numbers.
    */
  object PpmDecoder {
    /** `Some((width, height, raster offset))` for a structurally valid
      * binary PPM header with a complete single-byte-sample raster behind
      * it, `None` otherwise.
      */
    private def header(payload: Array[Byte]): Option[(Int, Int, Int)] = {
      if (payload == null || payload.length < 11 ||
        payload(0) != 'P' || payload(1) != '6') return None
      var pos = 2
      def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
      // PPM whitespace: any run of blanks, with '#'-to-end-of-line comments
      def skipWs(): Unit = {
        var go = true
        while (go && pos < payload.length) {
          if (isWs(payload(pos))) pos += 1
          else if (payload(pos) == '#') {
            while (pos < payload.length && payload(pos) != '\n') pos += 1
          } else go = false
        }
      }
      def readInt(): Int = {
        skipWs()
        var v = -1
        while (pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9') {
          v = (if (v < 0) 0 else v) * 10 + (payload(pos) - '0')
          pos += 1
          if (v > 1000000) return -1 // absurd dimension → malformed
        }
        v
      }
      val w = readInt(); val h = readInt(); val maxval = readInt()
      if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return None
      // exactly ONE whitespace byte separates maxval from the raster
      if (pos >= payload.length || !isWs(payload(pos))) return None
      pos += 1
      val raster = w.toLong * h * 3
      if (raster > Int.MaxValue || payload.length - pos < raster) return None
      Some((w, h, pos))
    }

    /** `Some((width, height, 8-bin raster-byte histogram))` for a valid
      * binary PPM, `None` otherwise (caller falls back).
      */
    def decode(payload: Array[Byte]): Option[(Int, Int, Array[Double])] =
      header(payload).map { case (w, h, off) =>
        val raster = w * h * 3
        val hist = new Array[Double](8)
        var i = 0
        while (i < raster) { hist((payload(off + i) & 0xff) >> 5) += 1.0; i += 1 }
        var j = 0
        while (j < 8) { hist(j) /= raster; j += 1 }
        (w, h, hist)
      }

    /** Header dimensions only — the [[imageHeaderMeta]] triage view. */
    def dims(payload: Array[Byte]): Option[(Int, Int)] =
      header(payload).map { case (w, h, _) => (w, h) }

    /** `Some((width, height, raster bytes))` — the full decoded pixel
      * buffer, for transforms that need the 2-D grid ([[resizePpm]]).
      */
    def decodeRaster(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] =
      header(payload).map { case (w, h, off) =>
        (w, h, java.util.Arrays.copyOfRange(payload, off, off + w * h * 3))
      }

    /** Re-encode a raster as binary PPM (the exact header shape
      * [[header]] parses back: `P6\nW H\n255\n`).
      */
    def encode(w: Int, h: Int, raster: Array[Byte]): Array[Byte] = {
      require(raster.length == w * h * 3,
        s"raster ${raster.length} != $w x $h x 3")
      s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ raster
    }
  }

  /** PNG header parser — magic-byte dimension/type extraction from the
    * IHDR chunk (PNG spec §5.2/§11.2.2): 8-byte signature, then the
    * FIRST chunk must be IHDR with data length 13; width/height are
    * big-endian u32 at offsets 16/20, bit depth / color type at 24/25.
    * Deterministic and dependency-free like [[PpmDecoder]] /
    * [[WavDecoder]], and deliberately strict (valid depth/color-type
    * combinations only) — the metadata tier that runs BEFORE any codec:
    * at 100 TB, dimension/format triage must not pay a decompression.
    */
  object PngHeader {
    private val sig =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

    /** `Some((width, height, bitDepth, colorType))` for a structurally
      * valid PNG signature + IHDR, `None` otherwise.
      */
    def parse(p: Array[Byte]): Option[(Int, Int, Int, Int)] = {
      if (p == null || p.length < 29) return None
      var i = 0
      while (i < 8) { if ((p(i) & 0xff) != sig(i)) return None; i += 1 }
      def u32(o: Int): Long =
        ((p(o) & 0xffL) << 24) | ((p(o + 1) & 0xffL) << 16) |
          ((p(o + 2) & 0xffL) << 8) | (p(o + 3) & 0xffL)
      if (u32(8) != 13L) return None // IHDR data length is always 13
      if (p(12) != 'I' || p(13) != 'H' || p(14) != 'D' || p(15) != 'R')
        return None
      val w = u32(16); val h = u32(20)
      val bitDepth = p(24) & 0xff; val colorType = p(25) & 0xff
      if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return None
      val depthOk = bitDepth == 1 || bitDepth == 2 || bitDepth == 4 ||
        bitDepth == 8 || bitDepth == 16
      val colorOk = colorType == 0 || colorType == 2 || colorType == 3 ||
        colorType == 4 || colorType == 6
      if (!depthOk || !colorOk) return None
      Some((w.toInt, h.toInt, bitDepth, colorType))
    }

    /** Samples per pixel for a color type (PNG spec table 11.1). */
    def channels(colorType: Int): Int = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case other => sys.error(s"invalid PNG color type $other")
    }
  }

  /** JPEG header parser — the SOF segment walk (ITU T.81 §B.2.2): SOI,
    * then length-prefixed segments skipped by their big-endian u16
    * lengths until the first frame header (SOF0–SOF15 minus DHT/JPG/DAC,
    * which share the 0xC class but are not frames); height/width/
    * precision/component-count come from the SOF payload. Standalone
    * markers (TEM, RSTn) have no length; fill 0xFF bytes before a
    * marker are legal padding. Strict like the others: a stream whose
    * scan starts before any SOF, or whose SOF length disagrees with its
    * component count, is malformed → `None`, never half-real numbers.
    */
  object JpegHeader {
    /** `Some((width, height, precision, nComponents))` from the first
      * SOF segment, `None` for anything not a structurally valid JPEG.
      */
    def parse(p: Array[Byte]): Option[(Int, Int, Int, Int)] = {
      if (p == null || p.length < 4 ||
        (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8) return None
      def u8(o: Int) = p(o) & 0xff
      def u16(o: Int) = (u8(o) << 8) | u8(o + 1)
      var pos = 2
      while (pos + 3 < p.length) {
        if (u8(pos) != 0xff) return None // lost marker sync → malformed
        // fill bytes: any run of 0xFF may pad before the marker code
        while (u8(pos + 1) == 0xff && pos + 2 < p.length) pos += 1
        val m = u8(pos + 1)
        if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
          pos += 2 // standalone markers carry no length field
        } else if (m == 0xd9 || m == 0xda) {
          return None // EOI / start-of-scan before any frame header
        } else {
          if (pos + 3 >= p.length) return None
          val len = u16(pos + 2)
          if (len < 2 || pos + 2 + len > p.length) return None
          val isSof = m >= 0xc0 && m <= 0xcf &&
            m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof) {
            if (len < 8) return None
            val prec = u8(pos + 4)
            val h = u16(pos + 5); val w = u16(pos + 7)
            val ncomp = u8(pos + 9)
            if (w <= 0 || h <= 0 || ncomp <= 0 || len != 8 + 3 * ncomp)
              return None
            return Some((w, h, prec, ncomp))
          }
          pos += 2 + len
        }
      }
      None
    }
  }

  /** GIF header parser — the logical screen descriptor walk (GIF89a
    * spec §17/§18): 6-byte magic (`GIF87a`/`GIF89a`), then canvas
    * width/height as LITTLE-endian u16 at offsets 6/8 and the packed
    * byte at 10 whose bits 6–4 carry `color resolution − 1` (bits per
    * primary). Palette-indexed like PNG color type 3, so one sample
    * per pixel. Dependency-free and strict like the other parsers —
    * the pre-codec triage tier.
    */
  object GifHeader {
    /** `Some((width, height, bitsPerPrimary))` for a structurally
      * valid GIF logical screen descriptor, `None` otherwise.
      */
    def parse(p: Array[Byte]): Option[(Int, Int, Int)] = {
      if (p == null || p.length < 13) return None
      val m = "GIF8"
      var i = 0
      while (i < 4) { if ((p(i) & 0xff) != m(i)) return None; i += 1 }
      if ((p(4) != '7' && p(4) != '9') || p(5) != 'a') return None
      def u16le(o: Int) = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
      val w = u16le(6); val h = u16le(8)
      if (w <= 0 || h <= 0) return None
      Some((w, h, ((p(10) >> 4) & 7) + 1))
    }
  }

  /** WebP header parser — the RIFF chunk walk for all three container
    * variants (WebP container spec): `RIFF <size> WEBP`, then
    *
    *   - `VP8 ` (lossy): 3-byte frame tag, the 0x9D012A sync code,
    *     then 14-bit width/height in little-endian u16s;
    *   - `VP8L` (lossless): 0x2F signature, then one u32le packing
    *     `width−1` (bits 0–13), `height−1` (14–27), `alpha_is_used`
    *     (28) and a version field (29–31) that must be 0;
    *   - `VP8X` (extended): a flags byte (bit 0x10 = alpha), then
    *     canvas `width−1`/`height−1` as u24le.
    *
    * Strict like the others: wrong sync/signature/version, dims of 0,
    * or a chunk size overrunning the payload → `None`.
    */
  object WebpHeader {
    /** `Some((width, height, depth, channels))` — depth is 8 for every
      * variant; channels 3, or 4 when the variant carries alpha.
      */
    def parse(p: Array[Byte]): Option[(Int, Int, Int, Int)] = {
      if (p == null || p.length < 25) return None
      def fcc(o: Int, s: String): Boolean = {
        var i = 0
        while (i < s.length) {
          if ((p(o + i) & 0xff) != s(i)) return false
          i += 1
        }
        true
      }
      if (!fcc(0, "RIFF") || !fcc(8, "WEBP")) return None
      def u16le(o: Int) = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
      def u24le(o: Int) = u16le(o) | ((p(o + 2) & 0xff) << 16)
      def u32le(o: Int) = u24le(o).toLong | ((p(o + 3) & 0xffL) << 24)
      val chunkSize = u32le(16)
      def fits(min: Long): Boolean =
        chunkSize >= min && 20L + chunkSize <= p.length
      if (fcc(12, "VP8 ")) {
        if (p.length < 30 || !fits(10L)) return None
        if ((p(23) & 0xff) != 0x9d || (p(24) & 0xff) != 0x01 ||
          (p(25) & 0xff) != 0x2a) return None
        val w = u16le(26) & 0x3fff; val h = u16le(28) & 0x3fff
        if (w <= 0 || h <= 0) return None
        Some((w, h, 8, 3))
      } else if (fcc(12, "VP8L")) {
        if (!fits(5L) || (p(20) & 0xff) != 0x2f) return None
        val bits = u32le(21)
        if (((bits >>> 29) & 7L) != 0L) return None // version must be 0
        val w = (bits & 0x3fff).toInt + 1
        val h = ((bits >>> 14) & 0x3fff).toInt + 1
        val channels = if (((bits >>> 28) & 1L) == 1L) 4 else 3
        Some((w, h, 8, channels))
      } else if (fcc(12, "VP8X")) {
        if (p.length < 30 || !fits(10L)) return None
        val channels = if ((p(20) & 0x10) != 0) 4 else 3
        val w = u24le(24) + 1; val h = u24le(27) + 1
        Some((w, h, 8, channels))
      } else None
    }
  }

  /** TIFF header parser — the real IFD (Image File Directory) walk
    * (TIFF 6.0 spec): a 2-byte byte-order mark (`II` little-endian /
    * `MM` big-endian) that every later integer honors, the magic 42,
    * a u32 offset to the first IFD, then `count` 12-byte entries
    * `(tag u16, type u16, count u32, value-or-offset u32)`. Dimensions
    * are tags 256 (ImageWidth) / 257 (ImageLength), either SHORT(3) or
    * LONG(4); BitsPerSample (258) and SamplesPerPixel (277) default to
    * 1 per the spec when absent. A count-1 value sits INLINE in the
    * value field (left-justified, so a SHORT reads as the first two
    * bytes in file order); BitsPerSample with count > 1 lives at its
    * offset — followed with bounds checks, first sample read (the
    * triage convention: one depth per image). Strict: wrong BOM/magic,
    * an IFD or value offset overrunning the payload, zero/negative
    * dims, or missing dimension tags → `None`.
    */
  object TiffHeader {
    /** `Some((width, height, bitsPerSample, samplesPerPixel))`. */
    def parse(p: Array[Byte]): Option[(Int, Int, Int, Int)] = {
      if (p == null || p.length < 8) return None
      val le =
        if (p(0) == 'I' && p(1) == 'I') true
        else if (p(0) == 'M' && p(1) == 'M') false
        else return None
      def u8(o: Int) = p(o) & 0xff
      def u16(o: Int) =
        if (le) u8(o) | (u8(o + 1) << 8) else (u8(o) << 8) | u8(o + 1)
      def u32(o: Int): Long =
        if (le) u16(o).toLong | (u16(o + 2).toLong << 16)
        else (u16(o).toLong << 16) | u16(o + 2).toLong
      if (u16(2) != 42) return None
      val ifd = u32(4)
      if (ifd < 8 || ifd + 2 > p.length) return None
      val n = u16(ifd.toInt)
      if (ifd + 2 + 12L * n > p.length) return None
      var w = -1; var h = -1; var bits = 1; var spp = 1
      var i = 0
      while (i < n) {
        val e = ifd.toInt + 2 + 12 * i
        val tag = u16(e); val typ = u16(e + 2); val cnt = u32(e + 4)
        // a count-1 SHORT/LONG value is inline (left-justified in the
        // 4-byte field); anything else we need lives behind the offset
        def inline: Option[Int] =
          if (cnt == 1L && typ == 3) Some(u16(e + 8))
          else if (cnt == 1L && typ == 4) {
            val v = u32(e + 8); if (v > Int.MaxValue) None else Some(v.toInt)
          } else None
        tag match {
          case 256 => w = inline.getOrElse(return None)
          case 257 => h = inline.getOrElse(return None)
          case 258 =>
            bits = inline.getOrElse {
              // count > 1 SHORTs at the offset: first sample, bounded
              if (typ != 3) return None
              val off = u32(e + 8)
              if (off + 2 > p.length) return None
              u16(off.toInt)
            }
          case 277 => spp = inline.getOrElse(return None)
          case _ => ()
        }
        i += 1
      }
      if (w <= 0 || h <= 0 || bits <= 0 || spp <= 0) None
      else Some((w, h, bits, spp))
    }
  }

  /** BMP header parser — `BM`, the 14-byte file header's u32le pixel-
    * data offset, then the DIB header: BITMAPCOREHEADER (size 12,
    * u16le dims) or the BITMAPINFOHEADER family (size 40/52/56/108/124,
    * s32le dims — height NEGATIVE for top-down rows, reported as its
    * magnitude — planes must be 1). `bpp` ≤ 8 is palette-indexed
    * (1 channel, depth = bpp, like GIF/PNG color type 3); 16/24 → 3
    * channels, 32 → 4, depth 8. Strict: wrong magic, an unknown DIB
    * size, zero dims, planes ≠ 1, or a bpp outside
    * {1, 4, 8, 16, 24, 32} → `None`.
    */
  object BmpHeader {
    /** `Some((width, height, depth, channels))`. */
    def parse(p: Array[Byte]): Option[(Int, Int, Int, Int)] = {
      if (p == null || p.length < 26) return None
      if (p(0) != 'B' || p(1) != 'M') return None
      def u8(o: Int) = p(o) & 0xff
      def u16le(o: Int) = u8(o) | (u8(o + 1) << 8)
      def u32le(o: Int): Long = u16le(o).toLong | (u16le(o + 2).toLong << 16)
      def s32le(o: Int): Int = u32le(o).toInt
      val dib = u32le(14)
      val (w, h, planes, bpp) =
        if (dib == 12L) (u16le(18), u16le(20), u16le(22), u16le(24))
        else if (dib == 40L || dib == 52L || dib == 56L ||
          dib == 108L || dib == 124L) {
          if (p.length < 30) return None
          (s32le(18), s32le(22), u16le(26), u16le(28))
        } else return None
      if (w <= 0 || h == 0 || planes != 1) return None
      val channels = bpp match {
        case 1 | 4 | 8 => 1
        case 16 | 24 => 3
        case 32 => 4
        case _ => return None
      }
      Some((w, math.abs(h), if (bpp <= 8) bpp else 8, channels))
    }
  }

  private val headerMetaSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("depth", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true)))

  /** Format/dimension triage across the REAL header parsers — PPM
    * ([[PpmDecoder]]), PNG ([[PngHeader]]), JPEG ([[JpegHeader]]), GIF
    * ([[GifHeader]]), WebP ([[WebpHeader]], all three container
    * variants), TIFF ([[TiffHeader]], the IFD walk in either byte
    * order), BMP ([[BmpHeader]], CORE + INFO DIB families) — with
    * `unknown` (null dims) for everything else.
    * `depth` is bits per sample (PPM single-byte → 8, PNG bit depth,
    * JPEG precision, GIF color resolution, WebP 8, TIFF BitsPerSample,
    * BMP bpp capped at 8); `channels` is samples per pixel (PPM 3, PNG
    * from color type, JPEG component count, GIF 1 — palette-indexed
    * like PNG color type 3, WebP 3 or 4 with alpha, TIFF
    * SamplesPerPixel, BMP from bpp). Same batch shape as [[extractFeatures]]
    * (mapPartitions over pruned columns, payload bytes never shuffled);
    * this is the layer a 100 TB ingest runs on EVERY image before
    * deciding what to decode.
    */
  def imageHeaderMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val pruned = media.select(col("media_id"), col("payload"))
    val out = pruned.queryExecution.toRdd.mapPartitions { rows =>
      rows.map { ir =>
        val id = ir.getLong(0)
        val p = if (ir.isNullAt(1)) null else ir.getBinary(1)
        PpmDecoder.dims(p) match {
          case Some((w, h)) => Row(id, "ppm", w, h, 8, 3)
          case None => PngHeader.parse(p) match {
            case Some((w, h, d, ct)) =>
              Row(id, "png", w, h, d, PngHeader.channels(ct))
            case None => JpegHeader.parse(p) match {
              case Some((w, h, prec, ncomp)) =>
                Row(id, "jpeg", w, h, prec, ncomp)
              case None => GifHeader.parse(p) match {
                case Some((w, h, d)) => Row(id, "gif", w, h, d, 1)
                case None => WebpHeader.parse(p) match {
                  case Some((w, h, d, ch)) => Row(id, "webp", w, h, d, ch)
                  case None => TiffHeader.parse(p) match {
                    case Some((w, h, d, ch)) => Row(id, "tiff", w, h, d, ch)
                    case None => BmpHeader.parse(p) match {
                      case Some((w, h, d, ch)) => Row(id, "bmp", w, h, d, ch)
                      case None => Row(id, "unknown", null, null, null, null)
                    }
                  }
                }
              }
            }
          }
        }
      }
    }
    spark.createDataFrame(out, headerMetaSchema)
  }

  private val featureSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("dec_width", IntegerType, nullable = false),
    StructField("dec_height", IntegerType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** Deterministic nearest-neighbor byte resample standing in for codec
    * resize: the payload is treated as a 1-D sample sequence and resampled
    * to exactly `width × height` bytes (`out(i) = in(⌊i·n/target⌋)` — the
    * classic NN-interpolation index map, applied to the raw byte stream
    * since no codec ships in-container). Swapping in a real image resize
    * changes only [[resampleBytes]]; the Spark contract — per-partition
    * batch transform, payload bytes never shuffled, metadata restamped —
    * is the part that must survive at 100 TB and is real here.
    */
  def resize(media: DataFrame, width: Int, height: Int): DataFrame = {
    require(width > 0 && height > 0, s"target dims must be positive: $width x $height")
    require(width.toLong * height <= Int.MaxValue,
      s"target payload $width x $height = ${width.toLong * height} bytes " +
        "overflows a JVM byte array")
    val spark = media.sparkSession
    val target = width * height
    val pruned = media.select(
      col("media_id"), col("kind"), col("payload"), col("duration_ms"))
    val out = pruned.queryExecution.toRdd.mapPartitions { rows =>
      rows.map { ir =>
        val payload = if (ir.isNullAt(2)) null else ir.getBinary(2)
        Row(
          ir.getLong(0),
          ir.getUTF8String(1).toString,
          resampleBytes(payload, target),
          "application/x-graft-resampled",
          width,
          height,
          if (ir.isNullAt(3)) null else ir.getLong(3))
      }
    }
    spark.createDataFrame(out, mediaSchema.copy(fields = mediaSchema.fields.map {
      case f @ StructField("mime", _, _, _)             => f.copy(nullable = false)
      case f @ StructField("width" | "height", _, _, _) => f.copy(nullable = false)
      case f                                            => f
    }))
  }

  /** NN-resample `in` to exactly `target` bytes (null → null; empty pads
    * with zeros — a decoded frame always has its full pixel count).
    */
  def resampleBytes(in: Array[Byte], target: Int): Array[Byte] =
    if (in == null) null
    else {
      val out = new Array[Byte](target)
      if (in.nonEmpty) {
        var i = 0
        while (i < target) {
          out(i) = in(((i.toLong * in.length) / target).toInt)
          i += 1
        }
      }
      out
    }

  /** REAL 2-D image resize for payloads [[PpmDecoder]] can decode:
    * nearest-neighbor on the actual pixel grid — output pixel (x, y)
    * copies source pixel (⌊x·w/W⌋, ⌊y·h/H⌋), all three channels — then
    * re-encoded as binary PPM. Payloads that are NOT valid PPM take the
    * 1-D [[resampleBytes]] stand-in (same fallback contract as
    * [[extractFeatures]]): the output dims/mime are stamped either way,
    * so downstream schema never depends on which path decoded.
    *
    * Same scale contract as [[resize]]: per-partition batch transform,
    * payloads transformed in place, nothing shuffled.
    */
  def resizePpm(media: DataFrame, width: Int, height: Int): DataFrame = {
    require(width > 0 && height > 0, s"target dims must be positive: $width x $height")
    require(width.toLong * height * 3 <= Int.MaxValue,
      s"target raster $width x $height x 3 overflows a JVM byte array")
    val spark = media.sparkSession
    val pruned = media.select(col("media_id"), col("payload"))
    val out = pruned.queryExecution.toRdd.mapPartitions { rows =>
      rows.map { ir =>
        val id = ir.getLong(0)
        val payload = if (ir.isNullAt(1)) null else ir.getBinary(1)
        val (resized, mime) = PpmDecoder.decodeRaster(payload) match {
          case Some((w, h, raster)) =>
            val outRaster = new Array[Byte](width * height * 3)
            var y = 0
            while (y < height) {
              val sy = (y.toLong * h / height).toInt
              var x = 0
              while (x < width) {
                val sx = (x.toLong * w / width).toInt
                val src = (sy * w + sx) * 3
                val dst = (y * width + x) * 3
                outRaster(dst) = raster(src)
                outRaster(dst + 1) = raster(src + 1)
                outRaster(dst + 2) = raster(src + 2)
                x += 1
              }
              y += 1
            }
            (PpmDecoder.encode(width, height, outRaster), "image/x-portable-pixmap")
          case None =>
            (resampleBytes(payload, width * height), "application/x-graft-resampled")
        }
        Row(id, resized, mime, width, height)
      }
    }
    spark.createDataFrame(out, StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true),
      StructField("mime", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false))))
  }

  /** The audio tier of the decode seam: interpret the payload as raw
    * little-endian signed 16-bit mono PCM — the one audio "format" that,
    * like binary PPM, needs no codec library, so the tier is honest end
    * to end — and emit the standard triage features an audio corpus is
    * filtered on before expensive transcription:
    *
    *   - `n_samples`   — ⌊bytes/2⌋ (a trailing odd byte is ignored);
    *   - `peak`        — max |sample| (5-second clip of silence vs music);
    *   - `rms_milli`   — round(RMS × 1000): loudness, the first-pass
    *     quality gate (near-zero = dead air, ~32767 = clipping);
    *   - `zero_crossings` — sign transitions: a cheap spectral proxy
    *     (voiced speech low, fricatives/noise high);
    *   - `n_silent`    — samples with |s| < `silenceThreshold`, the
    *     silence-ratio numerator.
    *
    * Same contract as [[extractFeatures]]: per-partition batch transform
    * (`mapPartitions`, decoder state initialized once per partition),
    * payload bytes never shuffled, and every output is integer-exact —
    * RMS is the only float, routed through one IEEE sqrt both engines
    * round identically — so the whole tier replays in DuckDB from the
    * hex view of the bytes.
    */
  /** The shared per-sample scan behind [[pcmStats]] and [[wavStats]]:
    * (peak, rms_milli, zero_crossings, n_silent) over `n` little-endian
    * int16 samples starting at byte `off`. ONE definition so the raw-PCM
    * and WAV tiers — whose oracles claim an identical sample replay —
    * can never diverge on the arithmetic. Caller guarantees n >= 1.
    */
  private def pcmScan(
      payload: Array[Byte], off: Int, n: Int,
      silenceThreshold: Int): (Long, Long, Long, Long) = {
    var i = 0
    var peak = 0L
    var sumSq = 0L
    var crossings = 0L
    var silent = 0L
    var prevNeg = false
    while (i < n) {
      val lo = payload(off + 2 * i) & 0xff
      val hi = payload(off + 2 * i + 1)
      val s = (hi << 8) | lo // hi is signed: sign-extends correctly
      val a = math.abs(s.toLong)
      if (a > peak) peak = a
      sumSq += s.toLong * s
      if (a < silenceThreshold) silent += 1
      val neg = s < 0
      if (i > 0 && neg != prevNeg) crossings += 1
      prevNeg = neg
      i += 1
    }
    (peak, math.round(math.sqrt(sumSq.toDouble / n) * 1000), crossings, silent)
  }

  def pcmStats(media: DataFrame, silenceThreshold: Int = 512): DataFrame = {
    require(silenceThreshold >= 0,
      s"silenceThreshold must be non-negative, got $silenceThreshold")
    val spark = media.sparkSession
    val pruned = media.select(col("media_id"), col("payload"))
    val out = pruned.queryExecution.toRdd.mapPartitions { rows =>
      rows.map { ir =>
        val id = ir.getLong(0)
        val payload = if (ir.isNullAt(1)) null else ir.getBinary(1)
        val n = if (payload == null) 0 else payload.length / 2
        if (n == 0) Row(id, 0L, null, null, null, null)
        else {
          val (peak, rmsMilli, crossings, silent) =
            pcmScan(payload, 0, n, silenceThreshold)
          Row(id, n.toLong, peak, rmsMilli, crossings, silent)
        }
      }
    }
    spark.createDataFrame(out, StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("peak", LongType, nullable = true),
      StructField("rms_milli", LongType, nullable = true),
      StructField("zero_crossings", LongType, nullable = true),
      StructField("n_silent", LongType, nullable = true))))
  }

  /** A REAL audio-container parser for the seam: WAV/RIFF — the header
    * walk every audio pipeline starts with. Layout: `RIFF` + u32le size +
    * `WAVE`, then a chunk sequence of (4-byte id, u32le size, data, pad
    * byte if size is odd); the `fmt ` chunk carries the sample format,
    * the `data` chunk the PCM bytes.
    *
    * Kept deliberately strict, like [[PpmDecoder]]: PCM format tag (1),
    * 16-bit samples, ≥1 channel, a complete in-bounds data chunk —
    * anything else returns `None` and the caller falls back to the
    * raw-PCM interpretation, never to half-parsed numbers.
    */
  object WavDecoder {
    /** Parsed `fmt ` + `data` chunk facts: everything downstream triage
      * needs without touching the samples.
      */
    final case class WavInfo(
        sampleRate: Int, bitsPerSample: Int, channels: Int,
        dataOffset: Int, dataLen: Int)

    private def u16le(p: Array[Byte], o: Int): Int =
      (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)

    private def u32le(p: Array[Byte], o: Int): Long =
      (p(o) & 0xffL) | ((p(o + 1) & 0xffL) << 8) |
        ((p(o + 2) & 0xffL) << 16) | ((p(o + 3) & 0xffL) << 24)

    private def tag(p: Array[Byte], o: Int): String =
      new String(p, o, 4, "US-ASCII")

    /** `Some(WavInfo)` for a structurally valid 16-bit PCM WAV with a
      * complete data chunk, `None` otherwise.
      */
    def parse(payload: Array[Byte]): Option[WavInfo] = {
      if (payload == null || payload.length < 44 ||
        tag(payload, 0) != "RIFF" || tag(payload, 8) != "WAVE") return None
      var pos = 12
      var fmt: Option[(Int, Int, Int)] = None // (sampleRate, bits, channels)
      var data: Option[(Int, Int)] = None     // (offset, len)
      while (pos + 8 <= payload.length && (fmt.isEmpty || data.isEmpty)) {
        val id = tag(payload, pos)
        val size = u32le(payload, pos + 4)
        if (size > Int.MaxValue || pos + 8 + size > payload.length) return None
        val sz = size.toInt
        if (id == "fmt ") {
          if (sz < 16) return None
          val audioFormat = u16le(payload, pos + 8)
          val channels = u16le(payload, pos + 10)
          val sampleRate = u32le(payload, pos + 12)
          val bits = u16le(payload, pos + 22)
          if (audioFormat != 1 || channels < 1 || bits != 16 ||
            sampleRate <= 0 || sampleRate > Int.MaxValue) return None
          fmt = Some((sampleRate.toInt, bits, channels))
        } else if (id == "data") {
          data = Some((pos + 8, sz))
        }
        pos += 8 + sz + (sz & 1) // chunks are word-aligned: odd sizes pad
      }
      for ((sr, bits, ch) <- fmt; (off, len) <- data)
        yield WavInfo(sr, bits, ch, off, len)
    }
  }

  /** FLAC STREAMINFO parser (flac format spec: 4-byte `fLaC` magic, a
    * metadata block header whose first block MUST be STREAMINFO — type
    * 0, u24be length 34 — then the packed stream facts). Strict:
    * wrong magic, a non-STREAMINFO first block, a non-34 length, zero
    * sample rate, or truncation → `None`. Dependency-free like
    * [[PngHeader]]/[[WavDecoder]].
    */
  object FlacHeader {
    /** `Some((sampleRate, channels, bitsPerSample, totalSamples))` —
      * totalSamples is the 36-bit count (0 = unknown, per the spec).
      */
    def parse(p: Array[Byte]): Option[(Int, Int, Int, Long)] = {
      if (p == null || p.length < 42) return None
      if (p(0) != 'f' || p(1) != 'L' || p(2) != 'a' || p(3) != 'C') return None
      def u8(o: Int) = p(o) & 0xff
      if ((u8(4) & 0x7f) != 0) return None // first block must be STREAMINFO
      val blockLen = (u8(5) << 16) | (u8(6) << 8) | u8(7)
      if (blockLen != 34) return None
      // STREAMINFO at 8: rate 20 bits / channels−1 3 / bps−1 5 /
      // totalSamples 36, packed from byte 18
      val rate = (u8(18) << 12) | (u8(19) << 4) | (u8(20) >> 4)
      if (rate <= 0) return None
      val channels = ((u8(20) >> 1) & 7) + 1
      val bps = (((u8(20) & 1) << 4) | ((u8(21) >> 4) & 0xf)) + 1
      val total = ((u8(21) & 0x0fL) << 32) |
        ((u8(22).toLong << 24) | (u8(23) << 16) | (u8(24) << 8) | u8(25))
      Some((rate, channels, bps, total))
    }
  }

  /** MP3 frame-header parser (MPEG audio frame header bit layout):
    * optional ID3v2 tag skip (synchsafe 28-bit size), then the 11-bit
    * sync, version/layer fields, and the bitrate/sample-rate table
    * lookups. Strict: reserved version (1), reserved layer (0), `free`
    * (0) or invalid (15) bitrate index, invalid (3) sample-rate index,
    * an ID3 size overrunning the payload, or truncation → `None`.
    */
  object Mp3Header {
    private val RatesV1 = Array(44100, 48000, 32000)
    private val RatesV2 = Array(22050, 24000, 16000)
    private val RatesV25 = Array(11025, 12000, 8000)
    // kbps by [table][index−1]; index 0 (free) and 15 are rejected
    private val BrV1L1 = Array(32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
    private val BrV1L2 = Array(32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
    private val BrV1L3 = Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    private val BrV2L1 = Array(32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
    private val BrV2L23 = Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

    /** `Some((sampleRate, channels, bitrateKbps, frameOffset))` —
      * frameOffset is where the first frame starts (past any ID3v2
      * tag), so callers can estimate duration from the audio bytes.
      */
    def parse(p: Array[Byte]): Option[(Int, Int, Int, Int)] = {
      if (p == null || p.length < 4) return None
      def u8(o: Int) = p(o) & 0xff
      var off = 0
      if (p.length >= 10 && p(0) == 'I' && p(1) == 'D' && p(2) == '3') {
        // synchsafe: 7 bits per byte, high bit must be clear
        if ((u8(6) | u8(7) | u8(8) | u8(9)) >= 0x80) return None
        val size = (u8(6) << 21) | (u8(7) << 14) | (u8(8) << 7) | u8(9)
        off = 10 + size
        if (off + 4 > p.length) return None
      }
      if (u8(off) != 0xff || (u8(off + 1) & 0xe0) != 0xe0) return None
      val ver = (u8(off + 1) >> 3) & 3   // 0=2.5, 2=2, 3=1; 1 reserved
      val layer = (u8(off + 1) >> 1) & 3 // 1=III, 2=II, 3=I; 0 reserved
      if (ver == 1 || layer == 0) return None
      val brIdx = (u8(off + 2) >> 4) & 15
      val srIdx = (u8(off + 2) >> 2) & 3
      if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
      val rate = (ver match {
        case 3 => RatesV1
        case 2 => RatesV2
        case _ => RatesV25
      })(srIdx)
      val kbps = (if (ver == 3) layer match {
        case 3 => BrV1L1
        case 2 => BrV1L2
        case _ => BrV1L3
      } else layer match {
        case 3 => BrV2L1
        case _ => BrV2L23
      })(brIdx - 1)
      val channels = if (((u8(off + 3) >> 6) & 3) == 3) 1 else 2
      Some((rate, channels, kbps, off))
    }
  }

  /** Ogg Vorbis identification-header parser (Ogg page framing +
    * Vorbis I spec §4.2.2): an `OggS` version-0 beginning-of-stream
    * page, its segment table skipped, then the `\x01vorbis` packet
    * with version 0, channel count and u32le sample rate. Strict:
    * wrong capture pattern, non-BOS page, wrong packet type, nonzero
    * vorbis version, zero rate/channels, or truncation → `None`.
    */
  object OggVorbisHeader {
    /** `Some((sampleRate, channels))`. */
    def parse(p: Array[Byte]): Option[(Int, Int)] = {
      if (p == null || p.length < 27) return None
      def u8(o: Int) = p(o) & 0xff
      if (p(0) != 'O' || p(1) != 'g' || p(2) != 'g' || p(3) != 'S') return None
      if (u8(4) != 0) return None          // stream structure version
      if ((u8(5) & 0x02) == 0) return None // must be beginning-of-stream
      val nsegs = u8(26)
      val o = 27 + nsegs
      if (o + 16 > p.length) return None
      if (u8(o) != 1) return None          // identification packet type
      val v = "vorbis"
      var i = 0
      while (i < 6) { if (u8(o + 1 + i) != v(i)) return None; i += 1 }
      def u32le(x: Int): Long = (u8(x).toLong) | (u8(x + 1).toLong << 8) |
        (u8(x + 2).toLong << 16) | (u8(x + 3).toLong << 24)
      if (u32le(o + 7) != 0L) return None  // vorbis version must be 0
      val channels = u8(o + 11)
      val rate = u32le(o + 12)
      if (channels <= 0 || rate <= 0L || rate > Int.MaxValue) return None
      Some((rate.toInt, channels))
    }
  }

  private val audioMetaSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("depth", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Audio-container triage across the REAL header parsers — WAV
    * ([[WavDecoder]]), FLAC ([[FlacHeader]]), MP3 ([[Mp3Header]], ID3v2
    * tags skipped), Ogg Vorbis ([[OggVorbisHeader]]) — the audio twin
    * of [[imageHeaderMeta]], with `unknown` (null fields) for
    * everything else. `depth` is bits per sample where the container
    * states one (WAV 16, FLAC STREAMINFO; null for the lossy codecs).
    * `duration_ms` is integer-exact where derivable: WAV from the data
    * chunk length, FLAC from the 36-bit total-samples field (0 =
    * unknown → null), MP3 a CBR estimate from the audio byte count at
    * the first frame's bitrate (how every tag-less scanner estimates
    * it), Ogg null (duration lives in the LAST page's granule, not the
    * header). Same batch shape as [[imageHeaderMeta]]: mapPartitions
    * over pruned columns, payload bytes never shuffled — the layer a
    * 100 TB crawl runs on every audio payload before deciding what to
    * transcode.
    */
  def audioHeaderMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val pruned = media.select(col("media_id"), col("payload"))
    val out = pruned.queryExecution.toRdd.mapPartitions { rows =>
      rows.map { ir =>
        val id = ir.getLong(0)
        val p = if (ir.isNullAt(1)) null else ir.getBinary(1)
        WavDecoder.parse(p) match {
          case Some(w) =>
            val bytesPerMs = w.sampleRate.toLong * w.channels * 2
            Row(id, "wav", w.sampleRate, w.channels, w.bitsPerSample,
              w.dataLen.toLong * 1000L / bytesPerMs)
          case None => FlacHeader.parse(p) match {
            case Some((rate, ch, bps, total)) =>
              Row(id, "flac", rate, ch, bps,
                if (total == 0L) null else total * 1000L / rate)
            case None => Mp3Header.parse(p) match {
              case Some((rate, ch, kbps, off)) =>
                Row(id, "mp3", rate, ch, null,
                  (p.length - off).toLong * 8L / kbps)
              case None => OggVorbisHeader.parse(p) match {
                case Some((rate, ch)) =>
                  Row(id, "ogg", rate, ch, null, null)
                case None => Row(id, "unknown", null, null, null, null)
              }
            }
          }
        }
      }
    }
    spark.createDataFrame(out, audioMetaSchema)
  }

  /** WAV triage: [[WavDecoder]] header facts + the [[pcmStats]] features
    * over the data chunk's samples — the full "parse the container, then
    * triage the PCM" shape an audio corpus runs before transcription.
    * Payloads that are not valid 16-bit PCM WAV take the raw-PCM fallback
    * (whole payload as samples, NULL header fields) — the same
    * decode-or-fallback contract as [[extractFeatures]], so downstream
    * schema never depends on which path parsed.
    *
    * For multi-channel files, `n_samples`/`peak`/`rms_milli`/
    * `zero_crossings`/`n_silent` are computed over the INTERLEAVED sample
    * stream (all channels mixed in file order), not per-channel;
    * `duration_ms` alone accounts for the channel count.
    *
    * Same scale contract as every seam op: per-partition batch transform,
    * payload bytes never shuffled, all outputs integer-exact (RMS crosses
    * one IEEE sqrt).
    */
  def wavStats(media: DataFrame, silenceThreshold: Int = 512): DataFrame = {
    require(silenceThreshold >= 0,
      s"silenceThreshold must be non-negative, got $silenceThreshold")
    val spark = media.sparkSession
    val pruned = media.select(col("media_id"), col("payload"))
    val out = pruned.queryExecution.toRdd.mapPartitions { rows =>
      rows.map { ir =>
        val id = ir.getLong(0)
        val payload = if (ir.isNullAt(1)) null else ir.getBinary(1)
        val info = WavDecoder.parse(payload)
        val (off, nBytes) = info match {
          case Some(w) => (w.dataOffset, w.dataLen)
          case None    => (0, if (payload == null) 0 else payload.length)
        }
        val n = nBytes / 2
        val (sr, bits, ch, durMs) = info match {
          case Some(w) =>
            // n*1000/(ch*rate), not (n/ch)*1000/rate: dividing by channels
            // first truncates to whole per-channel frames and loses sub-frame
            // precision for multi-channel files
            (w.sampleRate, w.bitsPerSample, w.channels,
              n.toLong * 1000L / (w.channels.toLong * w.sampleRate))
          case None => (null, null, null, null)
        }
        if (n == 0) Row(id, sr, bits, ch, durMs, 0L, null, null, null, null)
        else {
          val (peak, rmsMilli, crossings, silent) =
            pcmScan(payload, off, n, silenceThreshold)
          Row(id, sr, bits, ch, durMs, n.toLong, peak, rmsMilli, crossings, silent)
        }
      }
    }
    spark.createDataFrame(out, StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("bits", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("n_samples", LongType, nullable = false),
      StructField("peak", LongType, nullable = true),
      StructField("rms_milli", LongType, nullable = true),
      StructField("zero_crossings", LongType, nullable = true),
      StructField("n_silent", LongType, nullable = true))))
  }

  /** Perceptual hash (aHash) of the payload: NN-resample the byte stream
    * to `sampleBytes` samples, threshold each against the scaled mean,
    * pack the bits. Near-identical payloads (re-encodes, small edits)
    * land at small Hamming distance, so the hash feeds the same banded
    * Hamming join as SimHash ([[Dedup.simHashDupsFrom]]) — the image
    * near-dup tier of the dedup ladder, with byte-resampling standing in
    * for the decode+downscale a real codec would do.
    *
    * Pure `Column` expressions end to end — the resample is an index map
    * over `substr(payload, ...)`, the threshold is integer-only
    * (`sampleBytes·bᵢ ≥ Σb`, no division), and the bits pack into two
    * 32-bit halves (one signed long would overflow ANSI arithmetic).
    * Runs inside whole-stage codegen, shuffles nothing, and replays
    * byte-for-byte in any engine with hex/substring.
    */
  def perceptualHash(media: DataFrame, sampleBytes: Int = 64): DataFrame = {
    require(sampleBytes > 0 && sampleBytes % 2 == 0,
      s"sampleBytes must be positive and even, got $sampleBytes")
    import graft.functions.ColumnOps
    val half = sampleBytes / 2
    def byteAt(idx: org.apache.spark.sql.Column) =
      conv(hex(substr(col("payload"), idx + 1, lit(1))), 16, 10).cast("long")
    val packed = ColumnOps.bind(length(col("payload")).cast("long")) { n =>
      ColumnOps.bind(
        transform(
          sequence(lit(0L), lit(sampleBytes - 1L)),
          // exact floor((i*n)/sampleBytes) — full-long-range safe
          i => byteAt(ColumnOps.fdiv(i * n, sampleBytes.toLong)))) { samples =>
        ColumnOps.bind(aggregate(samples, lit(0L), (acc, b) => acc + b)) { total =>
          def pack(from: Int, until: Int) = aggregate(
            transform(
              slice(samples, from + 1, until - from),
              b => when(b * sampleBytes >= total, 1L).otherwise(0L)),
            lit(0L),
            (acc, bit) => acc * 2 + bit)
          // isNull guard: a NULL payload's NULL condition would fall to
          // otherwise, where every NULL bit-vote resolves to 0 — hashing
          // every NULL payload to (0, 0) and making them mutual
          // hamming-0 "near-duplicates" downstream
          when(n.isNull || n === 0, lit(null)).otherwise(
            struct(pack(0, half).as("phash_hi"), pack(half, sampleBytes).as("phash_lo")))
        }
      }
    }
    media.select(col("media_id"), explode(array(packed)).as("q"))
      .select(col("media_id"), col("q.phash_hi"), col("q.phash_lo"))
  }

  /** Frame sampling: one row per sampled "frame", `stride` bytes apart —
    * the exact plumbing shape of video frame extraction (explode to frame
    * rows carrying (media_id, frame_no, frame payload)). Payload slicing
    * stands in for codec-level frame decode; `posexplode` keeps the
    * operation narrow and codegen-planned, with no shuffle.
    */
  def frameSample(media: DataFrame, frames: Int = 4, stride: Int = 256): DataFrame = {
    // guard like every sibling op: frames = 0 would make sequence(0, -1)
    // step BACKWARD (emitting frame_no -1, whose negative substring
    // offset counts from the payload END), and stride <= 0 would emit
    // overlapping/negative slices
    require(frames >= 1, s"frames must be positive, got $frames")
    require(stride >= 1, s"stride must be positive, got $stride")
    media
      .select(
        col("media_id"),
        col("payload"),
        explode(sequence(lit(0L), lit(frames - 1L))).as("frame_no"))
      .select(
        col("media_id"),
        col("frame_no"),
        expr(s"substring(payload, frame_no * $stride + 1, $stride)")
          .as("frame_payload"))
      .filter(length(col("frame_payload")) > 0)
  }

  /** Feature extraction: per-partition batch decode → feature vectors.
    * `mapPartitions` (not per-row UDF) so a real decoder initializes once
    * per partition/core, mirroring the batch shape of an Arrow/Pandas UDF.
    *
    * Decode order: the REAL [[PpmDecoder]] first (header-parsed
    * dimensions, raster-byte features); then the PNG/JPEG HEADER tier
    * ([[PngHeader]]/[[JpegHeader]]) — real parsed dimensions with the
    * compressed-STREAM byte histogram as features (the raster needs a
    * codec this container doesn't ship; the stream histogram is the
    * standard entropy-profile triage feature, deterministic and
    * oracle-replayable from the same bytes); any other payload falls
    * back to the [[FakeDecoder]] stand-in entirely.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val pruned = media.select(col("media_id"), col("payload"))
    val out = pruned.queryExecution.toRdd.mapPartitions { rows =>
      rows.map { ir =>
        val id = ir.getLong(0)
        val payload = if (ir.isNullAt(1)) null else ir.getBinary(1)
        val (w, h, feats) = PpmDecoder.decode(payload)
          .orElse(PngHeader.parse(payload).map { case (pw, ph, _, _) =>
            (pw, ph, FakeDecoder.decode(payload)._3) })
          .orElse(JpegHeader.parse(payload).map { case (jw, jh, _, _) =>
            (jw, jh, FakeDecoder.decode(payload)._3) })
          .getOrElse(FakeDecoder.decode(payload))
        Row(id, w, h, feats.toSeq)
      }
    }
    spark.createDataFrame(out, featureSchema)
  }
}
