package graft.media

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.util.XxHash64

/** Multimodal columns for the training-data pipeline: image/audio/video as
  * opaque `binary` columns plus typed metadata, with decode / feature-
  * extract / resize / frame-sample staged as *batched* partition functions
  * — the Scala analog of Pandas UDFs over `mapInPandas`: rows are processed
  * in fixed-size batches inside each partition (the vectorized-UDF batch
  * shape), never collected, schema declared up front.
  *
  * ==STUB NOTICE==
  * No image/audio codec libraries ship in this container. Format sniffing
  * and container-HEADER metadata are REAL (public specs: PNG IHDR, GIF
  * block walk, JPEG SOFn scan, WAV fmt chunk, MP4/ISO-BMFF box walk), and
  * for FOUR image formats the ENTIRE pixel path is real — binary netpbm
  * (P5/P6, no codec needed), GIF (from-scratch LZW decoder, [[GifCodec]]),
  * PNG (from-scratch DEFLATE+filter decoder, [[PngCodec]]), and baseline
  * JPEG (from-scratch Huffman+IDCT decoder, [[JpegCodec]]) — full pixel
  * decode, BT.601 luminance-histogram features, box-filter resize, so the
  * decode→feature→resize pipeline is genuinely end-to-end for all four.
  * WAV audio is likewise real end-to-end: header parse plus PCM sample
  * statistics ([[wavPcmStats]] — 16/8-bit PCM, real sample arithmetic).
  * VIDEO is real for Motion-JPEG mp4 tracks ([[Mp4Codec]]): the ISO-BMFF
  * sample tables locate every frame and each frame is a complete baseline
  * JPEG, so frame extraction, per-frame pixel decode and whole-video luma
  * sums are pixel truth. For non-MJPEG mp4 codecs (avc1/hevc/...) and
  * out-of-scope jpeg variants (progressive, CMYK), pixel *decode
  * internals* — feature extraction, resize, and the fallback for
  * unparseable headers — are deterministic fakes, clearly marked `Stub`
  * below (pure functions of the bytes via xxhash). The Spark-side
  * plumbing — column types, batch iteration, partitioning, output
  * schemas — is real and tested; swapping a real codec into
  * [[decodeStub]]/[[featureStub]] changes nothing else.
  */
object Media {

  /** Typed metadata produced by the decode stage. */
  final case class MediaMeta(
      format: String,
      width: Int,
      height: Int,
      n_frames: Int,
      sample_rate: Int,
      n_bytes: Long)

  val metaSchema: StructType = Encoders.product[MediaMeta].schema

  /** Real format sniffing from public magic numbers. */
  def sniffFormat(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.length < 12) "unknown"
    else if (bytes(0) == 0x89.toByte && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') "png"
    else if (bytes(0) == 0xff.toByte && bytes(1) == 0xd8.toByte && bytes(2) == 0xff.toByte) "jpeg"
    else if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8') "gif"
    else if (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') "wav"
    // pnm BEFORE mp4: the pnm magic is at offset 0 and unambiguous, while
    // 'ftyp' at offset 4 is weaker evidence — a P5/P6 blob whose header
    // bytes 4-7 happen to spell 'ftyp' (e.g. a '#ftyp…' comment) must sniff
    // as the fully-decodable format, not the stubbed one (round-4 advisor)
    else if (bytes(0) == 'P' && (bytes(1) == '5' || bytes(1) == '6') &&
      (bytes(2) == ' ' || bytes(2) == '\n' || bytes(2) == '\r' || bytes(2) == '\t' || bytes(2) == '#')) "pnm"
    else if (bytes(4) == 'f' && bytes(5) == 't' && bytes(6) == 'y' && bytes(7) == 'p') "mp4"
    else if (bytes(0) == '<' || (bytes(0) == 0xef.toByte && bytes(1) == 0xbb.toByte)) "html"
    else "bin"
  }

  @inline private def u8(b: Byte): Int = b & 0xff
  @inline private def be16(a: Array[Byte], i: Int): Int = (u8(a(i)) << 8) | u8(a(i + 1))
  @inline private def le16(a: Array[Byte], i: Int): Int = u8(a(i)) | (u8(a(i + 1)) << 8)
  @inline private def be32(a: Array[Byte], i: Int): Int =
    (u8(a(i)) << 24) | (u8(a(i + 1)) << 16) | (u8(a(i + 2)) << 8) | u8(a(i + 3))
  @inline private def le32(a: Array[Byte], i: Int): Int =
    u8(a(i)) | (u8(a(i + 1)) << 8) | (u8(a(i + 2)) << 16) | (u8(a(i + 3)) << 24)

  /** REAL header parsing for the publicly-specified container headers —
    * pure JVM, no codec needed:
    *  - PNG: IHDR width/height (big-endian u32 at offsets 16/20);
    *  - GIF: logical-screen width/height (little-endian u16 at 6/8) and the
    *    frame count by walking image-descriptor (0x2C) / extension (0x21)
    *    blocks;
    *  - JPEG: SOFn segment scan (height/width big-endian u16 at +5/+7 of
    *    the first SOF0..SOF15 marker, skipping DHT/DAC/RST, stopping at SOS);
    *  - WAV: fmt-chunk sample rate (little-endian u32 at 24);
    *  - MP4: ISO-BMFF box walk ([[parseMp4]]) — tkhd width/height, stsz
    *    frame count, audio-track mdhd timescale as sample rate.
    * Returns None when the bytes are truncated/malformed — the caller
    * falls back to the stub. */
  def parseHeader(bytes: Array[Byte], format: String): Option[(Int, Int, Int, Int)] =
    try {
      format match {
        case "png" if bytes.length >= 24 =>
          Some((be32(bytes, 16), be32(bytes, 20), 1, 0))
        case "gif" if bytes.length >= 10 =>
          // frame count: walk blocks after the logical screen descriptor
          val w = le16(bytes, 6); val h = le16(bytes, 8)
          val gctSize = if ((u8(bytes(10)) & 0x80) != 0) 3 * (1 << ((u8(bytes(10)) & 7) + 1)) else 0
          var i = 13 + gctSize
          var frames = 0
          var done = false
          while (!done && i < bytes.length) {
            u8(bytes(i)) match {
              case 0x3b => done = true // trailer
              case 0x21 => // extension: label + sub-blocks
                i += 2
                while (i < bytes.length && u8(bytes(i)) != 0) i += 1 + u8(bytes(i))
                i += 1
              case 0x2c => // image descriptor
                frames += 1
                val lctSize = if (i + 9 < bytes.length && (u8(bytes(i + 9)) & 0x80) != 0)
                  3 * (1 << ((u8(bytes(i + 9)) & 7) + 1)) else 0
                i += 10 + lctSize + 1 // descriptor + LCT + LZW min-code byte
                while (i < bytes.length && u8(bytes(i)) != 0) i += 1 + u8(bytes(i))
                i += 1
              case _ => done = true // malformed: stop, keep what we have
            }
          }
          Some((w, h, math.max(frames, 1), 0))
        case "jpeg" =>
          // Marker scan hardening (round-2 advisor): stop at SOS (0xDA —
          // entropy-coded data follows, where 0xFF 0xCn sequences are data,
          // not markers), resync over 0xFF fill bytes, and treat TEM (0x01)
          // and RSTn/SOI/EOI as standalone (no length word).
          var i = 2
          var out: Option[(Int, Int, Int, Int)] = None
          var stop = false
          while (!stop && out.isEmpty && i + 1 < bytes.length && u8(bytes(i)) == 0xff) {
            val marker = u8(bytes(i + 1))
            if (marker == 0xff) i += 1 // fill byte: resync on the next 0xff
            else if (marker == 0xda) stop = true // SOS: never scan past it
            else if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
              if (i + 9 < bytes.length) out = Some((be16(bytes, i + 7), be16(bytes, i + 5), 1, 0))
              else stop = true // truncated SOF
            } else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) i += 2
            else if (i + 3 < bytes.length) i += 2 + be16(bytes, i + 2)
            else stop = true
          }
          out
        case "wav" if bytes.length >= 28 =>
          Some((0, 0, 1, le32(bytes, 24)))
        case "mp4" => parseMp4(bytes)
        case "pnm" => parsePnm(bytes).map { case (_, w, h, _) => (w, h, 1, 0) }
        case _ => None
      }
    } catch { case _: IndexOutOfBoundsException => None }

  /** ISO-BMFF (MPEG-4 Part 12, public spec) box walk — pure JVM, no codec:
    * top-level boxes are (u32 size)(4cc type) with size==1 ⇒ 64-bit
    * largesize and size==0 ⇒ to-end-of-enclosing-box; `moov`→`trak`
    * subtrees give per-track `tkhd` width/height (16.16 fixed-point at the
    * end of the box), `hdlr` handler type ('vide'/'soun'), `mdhd` timescale
    * (an audio track's timescale is its sample rate by convention), and
    * `stbl`→`stsz` sample_count — the video track's REAL frame count.
    * Returns None when no moov box parses (caller falls back to the stub). */
  private def parseMp4(bytes: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    final class Track {
      var handler: String = ""
      var w: Int = 0; var h: Int = 0
      var timescale: Int = 0; var samples: Int = 0
    }
    val tracks = scala.collection.mutable.ArrayBuffer.empty[Track]
    var sawMoov = false

    def fourcc(i: Int): String = new String(bytes, i, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
    def be64(i: Int): Long = (be32(bytes, i).toLong << 32) | (be32(bytes, i + 4).toLong & 0xffffffffL)

    def walk(start: Long, end: Long, cur: Track): Unit = {
      var i = start
      while (i + 8 <= end) {
        var size: Long = be32(bytes, i.toInt).toLong & 0xffffffffL
        val typ = fourcc(i.toInt + 4)
        var header = 8L
        if (size == 1 && i + 16 <= end) { size = be64(i.toInt + 8); header = 16 }
        else if (size == 0) size = end - i
        if (size < header || i + size > end) return // malformed: stop, keep what we have
        val payload = (i + header).toInt
        typ match {
          case "moov" => sawMoov = true; walk(i + header, i + size, cur)
          case "trak" =>
            val t = new Track; tracks += t; walk(i + header, i + size, t)
          case "mdia" | "minf" | "stbl" => walk(i + header, i + size, cur)
          case "tkhd" if cur != null =>
            val off = payload + 4 + (if (u8(bytes(payload)) == 1) 84 else 72)
            if (off + 8 <= i + size) {
              cur.w = be32(bytes, off) >>> 16 // 16.16 fixed-point
              cur.h = be32(bytes, off + 4) >>> 16
            }
          case "mdhd" if cur != null =>
            val off = payload + 4 + (if (u8(bytes(payload)) == 1) 16 else 8)
            if (off + 4 <= i + size) cur.timescale = be32(bytes, off)
          case "hdlr" if cur != null =>
            if (payload + 12 <= i + size) cur.handler = fourcc(payload + 8)
          case "stsz" if cur != null =>
            if (payload + 12 <= i + size) cur.samples = be32(bytes, payload + 8)
          case _ => () // ftyp, mdat, free, unknown: skip
        }
        i += size
      }
    }
    walk(0L, bytes.length.toLong, null)
    if (!sawMoov) None
    else {
      val video = tracks.find(_.handler == "vide").orElse(tracks.find(t => t.w > 0 && t.h > 0))
      val audio = tracks.find(_.handler == "soun")
      Some((
        video.map(_.w).getOrElse(0),
        video.map(_.h).getOrElse(0),
        math.max(video.map(_.samples).getOrElse(0), 1),
        audio.map(_.timescale).getOrElse(0)))
    }
  }

  // --- netpbm (binary P5 grayscale / P6 RGB, maxval <= 255): the one
  // format this container CAN fully decode with no codec — pixels,
  // features and resize below are REAL, not stubs, making the whole
  // decode→feature→resize pipeline genuinely end-to-end for pnm blobs
  // while codec formats (mp4, out-of-scope jpeg variants) keep real headers + marked stubs. ---

  /** Parse a binary netpbm header: (channels, width, height, pixelOffset).
    * Handles runs of whitespace and `#` comments per the netpbm spec;
    * None when malformed, truncated, or maxval > 255. */
  def parsePnm(bytes: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (bytes == null || bytes.length < 10 || bytes(0) != 'P') return None
    val channels = bytes(1) match {
      case '5' => 1
      case '6' => 3
      case _ => return None
    }
    var i = 2
    def skipWs(): Boolean = {
      var progressed = false
      var going = true
      while (going && i < bytes.length) {
        val c = bytes(i)
        if (c == ' ' || c == '\n' || c == '\r' || c == '\t') { i += 1; progressed = true }
        else if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1; progressed = true }
        else going = false
      }
      progressed
    }
    def readInt(): Int = {
      var v = 0
      var any = false
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1; any = true
      }
      if (!any) -1 else v
    }
    if (!skipWs()) return None
    val w = readInt(); if (w <= 0) return None
    if (!skipWs()) return None
    val h = readInt(); if (h <= 0) return None
    if (!skipWs()) return None
    val maxval = readInt(); if (maxval <= 0 || maxval > 255) return None
    // exactly ONE whitespace byte separates maxval from the raster
    if (i >= bytes.length) return None
    val c = bytes(i)
    if (!(c == ' ' || c == '\n' || c == '\r' || c == '\t')) return None
    i += 1
    if (bytes.length - i < w.toLong * h * channels) None
    else Some((channels, w, h, i))
  }

  /** REAL per-pixel luminance histogram (256 bins) for a netpbm blob —
    * BT.601 integer luma for RGB, identity for grayscale. */
  def pnmLumaHistogram(bytes: Array[Byte]): Option[Array[Long]] =
    parsePnm(bytes).map { case (channels, w, h, off) =>
      val hist = new Array[Long](256)
      var p = off
      val end = off + w * h * channels
      while (p < end) {
        val y =
          if (channels == 1) u8(bytes(p))
          else (299 * u8(bytes(p)) + 587 * u8(bytes(p + 1)) + 114 * u8(bytes(p + 2))) / 1000
        hist(y) += 1L
        p += channels
      }
      hist
    }

  /** REAL full pixel decode to a BT.601 luma raster: (width, height, luma
    * bytes row-major). Four formats decode end-to-end in this container —
    * binary netpbm (P5/P6, [[parsePnm]]), GIF via the from-scratch LZW
    * decoder ([[GifCodec.decodeFirstFrame]]), PNG via the from-scratch
    * DEFLATE+filter decoder ([[PngCodec.decodeLuma]]), and baseline JPEG
    * via the from-scratch Huffman+IDCT decoder ([[JpegCodec.decodeLuma]] —
    * the Y channel, which for JFIF IS the BT.601 luma the other paths
    * compute from RGB). An mp4 with a Motion-JPEG track decodes its FIRST
    * frame ([[Mp4Codec.decodeFirstFrameLuma]]). None for non-MJPEG mp4
    * codecs (real headers, marked pixel stubs) and for out-of-scope jpeg
    * variants (progressive, CMYK). */
  def decodeLuma(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    parsePnm(bytes) match {
      case Some((channels, w, h, off)) =>
        val luma = new Array[Byte](w * h)
        var p = 0
        while (p < w * h) {
          val i = off + p * channels
          val y =
            if (channels == 1) u8(bytes(i))
            else (299 * u8(bytes(i)) + 587 * u8(bytes(i + 1)) + 114 * u8(bytes(i + 2))) / 1000
          luma(p) = y.toByte
          p += 1
        }
        Some((w, h, luma))
      case None =>
        sniffFormat(bytes) match {
          case "gif" => GifCodec.decodeFirstFrame(bytes)
          case "png" => PngCodec.decodeLuma(bytes)
          case "jpeg" => JpegCodec.decodeLuma(bytes)
          case "mp4" => Mp4Codec.decodeFirstFrameLuma(bytes) // MJPEG tracks only
          case _ => None
        }
    }

  /** Luminance histogram (256 bins) for any fully-decodable blob
    * (netpbm, GIF, PNG, or baseline JPEG). */
  def lumaHistogram(bytes: Array[Byte]): Option[Array[Long]] =
    decodeLuma(bytes).map { case (_, _, luma) =>
      val hist = new Array[Long](256)
      var p = 0
      while (p < luma.length) { hist(u8(luma(p))) += 1L; p += 1 }
      hist
    }

  /** Exact luminance sum over all pixels of a fully-decodable blob — the
    * cross-engine pixel-truth scalar (for a grayscale-palette GIF, an
    * 8-bit gray PNG, or a P5, this is literally the sum of the stored bytes, which a SQL oracle can
    * recompute arithmetically). */
  def lumaSum(bytes: Array[Byte]): Option[Long] =
    decodeLuma(bytes).map { case (_, _, luma) =>
      var s = 0L
      var p = 0
      while (p < luma.length) { s += u8(luma(p)); p += 1 }
      s
    }

  /** REAL image features for fully-decodable (netpbm/GIF/PNG/JPEG) blobs: the
    * 256-bin luminance histogram L1-normalized, folded to `dim` bins, then
    * unit-normalized — a deterministic, content-meaningful embedding.
    * None for formats this container cannot decode (callers fall back to
    * the marked stub). */
  def imageFeatures(bytes: Array[Byte], dim: Int): Option[Array[Float]] =
    lumaHistogram(bytes).map { hist =>
      val folded = new Array[Double](dim)
      var b = 0
      while (b < 256) { folded(b % dim) += hist(b).toDouble; b += 1 }
      val total = folded.sum.max(1e-9)
      val l1 = folded.map(_ / total)
      val norm = math.sqrt(l1.map(x => x * x).sum).max(1e-9)
      l1.map(x => (x / norm).toFloat)
    }

  /** Dispatch: real features when the blob decodes, marked stub otherwise. */
  def mediaFeatures(bytes: Array[Byte], dim: Int): Array[Float] =
    imageFeatures(bytes, dim).getOrElse(featureStub(bytes, dim))

  /** Exact integer PCM sample statistics — the moments mean/RMS/peak derive
    * from, kept integer so a SQL oracle reproduces them bit-for-bit. */
  final case class PcmStats(n_samples: Long, sum: Long, sum_sq: Long, peak_abs: Long)

  /** REAL PCM audio decode for WAV blobs: a proper RIFF chunk walk (not
    * the fixed-offset header peek [[parseHeader]] uses for metadata) to the
    * `fmt ` and `data` chunks, then exact statistics over the REAL decoded
    * samples — 16-bit signed little-endian or 8-bit unsigned-centered PCM
    * (audioFormat 1), all channels folded together. This makes audio the
    * third real modality here (after image pixels and text): the features
    * are functions of the sample values, not of the container bytes.
    * None for non-WAV, non-PCM (compressed), or truncated blobs. */
  def wavPcmStats(bytes: Array[Byte]): Option[PcmStats] = {
    try {
      if (bytes == null || bytes.length < 44 || sniffFormat(bytes) != "wav") return None
      var i = 12 // past RIFF size WAVE
      var bits = -1
      var fmtOk = false
      var stats: Option[PcmStats] = None
      while (stats.isEmpty && i + 8 <= bytes.length) {
        val id = new String(bytes, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val size = le32(bytes, i + 4)
        if (size < 0 || i + 8L + size > bytes.length) return None
        val off = i + 8
        id match {
          case "fmt " =>
            if (size < 16) return None
            val audioFormat = le16(bytes, off)
            bits = le16(bytes, off + 14)
            fmtOk = audioFormat == 1 && (bits == 8 || bits == 16)
          case "data" =>
            if (!fmtOk) return None // data before a PCM fmt chunk: bail
            var sum = 0L
            var sumSq = 0L
            var peak = 0L
            if (bits == 16) {
              val n = size / 2
              var s = 0
              while (s < n) {
                val v = (le16(bytes, off + 2 * s) << 16) >> 16 // sign-extend
                sum += v
                sumSq += v.toLong * v
                val a = math.abs(v.toLong)
                if (a > peak) peak = a
                s += 1
              }
              stats = Some(PcmStats(n.toLong, sum, sumSq, peak))
            } else {
              var s = 0
              while (s < size) {
                val v = u8(bytes(off + s)) - 128 // 8-bit PCM is unsigned, centered at 128
                sum += v
                sumSq += v.toLong * v
                val a = math.abs(v.toLong)
                if (a > peak) peak = a
                s += 1
              }
              stats = Some(PcmStats(size.toLong, sum, sumSq, peak))
            }
          case _ => () // LIST, fact, ...: skip
        }
        i = off + size + (size & 1) // chunks are word-aligned
      }
      stats
    } catch { case _: IndexOutOfBoundsException => None }
  }

  /** Minimal mono 16-bit PCM WAV writer — exists so tests and the q40
    * oracle fixture can round-trip arbitrary sample streams through the
    * REAL [[wavPcmStats]] decode (the same pattern as [[GifCodec
    * .encodeGray]] / [[PngCodec.encodeGray]] for pixels). */
  def wavEncodePcm16(sampleRate: Int, samples: Array[Int]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def ascii(i: Int, s: String): Unit = { var j = 0; while (j < 4) { out(i + j) = s.charAt(j).toByte; j += 1 } }
    def w32(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >>> 8).toByte
      out(i + 2) = (v >>> 16).toByte; out(i + 3) = (v >>> 24).toByte
    }
    def w16(i: Int, v: Int): Unit = { out(i) = v.toByte; out(i + 1) = (v >>> 8).toByte }
    ascii(0, "RIFF"); w32(4, 36 + dataLen); ascii(8, "WAVE")
    ascii(12, "fmt "); w32(16, 16)
    w16(20, 1) // PCM
    w16(22, 1) // mono
    w32(24, sampleRate)
    w32(28, sampleRate * 2) // byte rate
    w16(32, 2) // block align
    w16(34, 16) // bits per sample
    ascii(36, "data"); w32(40, dataLen)
    var s = 0
    while (s < samples.length) { w16(44 + 2 * s, samples(s)); s += 1 }
    out
  }

  /** REAL box-filter downscale for netpbm blobs — emits a valid binary
    * netpbm of the same kind at exactly w×h (each output pixel averages
    * its source box). None when the blob isn't decodable netpbm or the
    * target upsamples. */
  def pnmResize(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    parsePnm(bytes).flatMap { case (channels, sw, sh, off) =>
      if (w <= 0 || h <= 0 || w > sw || h > sh) None
      else {
        val header = s"P${if (channels == 1) 5 else 6}\n$w $h\n255\n".getBytes("US-ASCII")
        val out = new Array[Byte](header.length + w * h * channels)
        System.arraycopy(header, 0, out, 0, header.length)
        var oy = 0
        while (oy < h) {
          val y0 = oy * sh / h
          val y1 = math.max(y0 + 1, (oy + 1) * sh / h)
          var ox = 0
          while (ox < w) {
            val x0 = ox * sw / w
            val x1 = math.max(x0 + 1, (ox + 1) * sw / w)
            var c = 0
            while (c < channels) {
              var sum = 0L
              var n = 0L
              var y = y0
              while (y < y1) {
                var x = x0
                while (x < x1) {
                  sum += u8(bytes(off + (y * sw + x) * channels + c))
                  n += 1
                  x += 1
                }
                y += 1
              }
              out(header.length + (oy * w + ox) * channels + c) = (sum / n).toByte
              c += 1
            }
            ox += 1
          }
          oy += 1
        }
        Some(out)
      }
    }

  /** Transcode any fully-decodable blob to binary netpbm: a pnm passes
    * through untouched; a GIF, PNG, or JPEG becomes a P5 of its decoded luma raster
    * (grayscale — the honest lossy step, documented: resize-after-decode
    * operates on luminance for palette formats). */
  def toPnm(bytes: Array[Byte]): Option[Array[Byte]] =
    if (parsePnm(bytes).isDefined) Some(bytes)
    else decodeLuma(bytes).map { case (w, h, luma) =>
      val header = s"P5\n$w $h\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + luma.length)
      System.arraycopy(header, 0, out, 0, header.length)
      System.arraycopy(luma, 0, out, header.length, luma.length)
      out
    }

  /** Dispatch: real resize when decodable (netpbm natively; GIF via luma
    * transcode), marked stub otherwise. */
  def mediaResize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
    pnmResize(bytes, w, h)
      .orElse(toPnm(bytes).flatMap(pnmResize(_, w, h)))
      .getOrElse(resizeStub(bytes, w, h))

  /** Decode: real format sniff + REAL header metadata for png/gif/jpeg/wav/
    * mp4 and REAL full pixel decode for netpbm/GIF/PNG/JPEG ([[decodeLuma]]);
    * only bytes whose headers don't parse fall back to the clearly-marked
    * deterministic fake. Replace the fallback with a real codec call when
    * one is available. */
  def decodeStub(bytes: Array[Byte]): MediaMeta = {
    if (bytes == null) return MediaMeta("null", 0, 0, 0, 0, 0L)
    val format = sniffFormat(bytes)
    parseHeader(bytes, format) match {
      case Some((w, h, frames, rate)) =>
        MediaMeta(format, w, h, frames, rate, bytes.length.toLong)
      case None =>
        val hsh = XxHash64.hash(bytes, 7L)
        // --- deterministic fake (no codec in container) ---
        val width = 64 + math.floorMod(hsh, 1920L).toInt
        val height = 64 + math.floorMod(hsh >>> 17, 1080L).toInt
        val frames = if (format == "mp4") 1 + math.floorMod(hsh >>> 31, 240L).toInt else 1
        val rate = if (format == "mp4") 16000 else 0
        MediaMeta(format, width, height, frames, rate, bytes.length.toLong)
    }
  }

  /** STUB feature extraction: deterministic pseudo-embedding of `dim`
    * floats from the content hash chain (unit-norm). */
  def featureStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val base = if (bytes == null) 0L else XxHash64.hash(bytes, 13L)
    val raw = Array.tabulate(dim) { i =>
      // map hash to [-1, 1)
      (XxHash64.hashLong(base, i.toLong).toDouble / Long.MaxValue).toFloat
    }
    val norm = math.sqrt(raw.map(x => x.toDouble * x).sum).max(1e-9)
    raw.map(x => (x / norm).toFloat)
  }

  /** STUB resize: deterministic truncate-or-cycle of the payload to a size
    * proportional to w×h (stands in for a real scaler; plumbing real).
    * Total like every sibling stub: null/empty blobs yield an empty result
    * instead of killing the task (round-5 review). */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    if (bytes == null || bytes.isEmpty) return Array.emptyByteArray
    val target = math.max(16, (w * h) / 64)
    Array.tabulate(target)(i => bytes(i % bytes.length))
  }

  /** Frame sampling: for an MJPEG mp4 track, n evenly-spaced REAL frames —
    * each a complete standalone JPEG the image stages decode
    * ([[Mp4Codec.sampleFrames]]). For everything else, n deterministic
    * evenly-spaced byte-range slices (marked stub — the slicing/batching
    * plumbing is the point for codecs this container can't decode). */
  def frameSample(bytes: Array[Byte], n: Int): Array[Array[Byte]] = {
    if (bytes == null || bytes.isEmpty || n <= 0) return Array.empty
    (if (sniffFormat(bytes) == "mp4") Mp4Codec.sampleFrames(bytes, n) else None).getOrElse {
      val span = math.max(1, bytes.length / n)
      Array.tabulate(math.min(n, bytes.length)) { i =>
        val start = i * span
        java.util.Arrays.copyOfRange(bytes, start, math.min(bytes.length, start + span))
      }
    }
  }

  /** Batched partition map — the mapInPandas analog. `f` sees whole
    * batches (≤ batchSize rows), amortizing any per-batch model/codec
    * setup exactly like a Pandas UDF would. */
  private def mapBatched(
      df: DataFrame,
      outSchema: StructType,
      batchSize: Int)(f: Seq[Row] => Seq[Row]): DataFrame = {
    val enc = ExpressionEncoder(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => f(batch))
    }(enc)
  }

  /** Decode stage: (blob binary, …) → original columns + `meta` struct.
    * Runs batched per partition; output schema fixed up front. */
  def decodeMeta(df: DataFrame, blobCol: String = "blob", batchSize: Int = 64): DataFrame = {
    val outSchema = df.schema.add("meta", metaSchema, nullable = false)
    val blobIdx = df.schema.fieldIndex(blobCol)
    mapBatched(df, outSchema, batchSize) { batch =>
      // per-batch setup would init a codec here (amortized like mapInPandas)
      batch.map { row =>
        val m = decodeStub(row.getAs[Array[Byte]](blobIdx))
        Row.fromSeq(row.toSeq :+ Row(m.format, m.width, m.height, m.n_frames, m.sample_rate, m.n_bytes))
      }
    }
  }

  /** Feature-extract stage: adds `embedding array<float>` (batched). */
  def extractFeatures(
      df: DataFrame,
      blobCol: String = "blob",
      dim: Int = 64,
      batchSize: Int = 64): DataFrame = {
    val outSchema = df.schema.add("embedding", ArrayType(FloatType, containsNull = false), nullable = false)
    val blobIdx = df.schema.fieldIndex(blobCol)
    mapBatched(df, outSchema, batchSize) { batch =>
      // real luminance-histogram features for decodable (netpbm) blobs,
      // marked stub for codec formats
      batch.map(row => Row.fromSeq(row.toSeq :+ mediaFeatures(row.getAs[Array[Byte]](blobIdx), dim).toSeq))
    }
  }

  /** Pixel-truth stage: adds `luma_sum bigint` — the exact luminance sum
    * over all decoded pixels for fully-decodable (netpbm/GIF/PNG/JPEG) blobs, -1
    * for formats this container cannot decode. Batched like the rest;
    * the q38 oracle recomputes the sum arithmetically in SQL. */
  def lumaSums(df: DataFrame, blobCol: String = "blob", batchSize: Int = 64): DataFrame = {
    val outSchema = df.schema.add("luma_sum", LongType, nullable = false)
    val blobIdx = df.schema.fieldIndex(blobCol)
    mapBatched(df, outSchema, batchSize) { batch =>
      batch.map(row =>
        Row.fromSeq(row.toSeq :+ lumaSum(row.getAs[Array[Byte]](blobIdx)).getOrElse(-1L)))
    }
  }

  /** Video stage: adds `n_frames_decoded` + `luma_total` (Σ luma over
    * every pixel of every frame) for MJPEG mp4 blobs
    * ([[Mp4Codec.videoLumaTotal]]); (-1, -1) marks undecodable tracks —
    * loud, never a partial sum. Batched like every sibling stage. */
  def videoLumaTotals(df: DataFrame, blobCol: String = "blob", batchSize: Int = 64): DataFrame = {
    val outSchema = df.schema
      .add("n_frames_decoded", IntegerType, nullable = false)
      .add("luma_total", LongType, nullable = false)
    val blobIdx = df.schema.fieldIndex(blobCol)
    mapBatched(df, outSchema, batchSize) { batch =>
      batch.map { row =>
        val r = Mp4Codec.videoLumaTotal(row.getAs[Array[Byte]](blobIdx))
        Row.fromSeq(row.toSeq :+ r.map(_._1).getOrElse(-1) :+ r.map(_._2).getOrElse(-1L))
      }
    }
  }

  /** Audio-truth stage: adds `n_samples`, `pcm_sum`, `pcm_sum_sq`,
    * `pcm_peak` (all bigint) — exact integer statistics over the REAL
    * decoded PCM samples of WAV blobs ([[wavPcmStats]]), -1s for blobs
    * this container cannot decode. Batched like the rest; the q40 oracle
    * recomputes all four arithmetically in SQL. */
  def pcmFeatures(df: DataFrame, blobCol: String = "blob", batchSize: Int = 64): DataFrame = {
    val outSchema = df.schema
      .add("n_samples", LongType, nullable = false)
      .add("pcm_sum", LongType, nullable = false)
      .add("pcm_sum_sq", LongType, nullable = false)
      .add("pcm_peak", LongType, nullable = false)
    val blobIdx = df.schema.fieldIndex(blobCol)
    mapBatched(df, outSchema, batchSize) { batch =>
      batch.map { row =>
        val s = wavPcmStats(row.getAs[Array[Byte]](blobIdx))
          .getOrElse(PcmStats(-1L, -1L, -1L, -1L))
        Row.fromSeq(row.toSeq ++ Seq(s.n_samples, s.sum, s.sum_sq, s.peak_abs))
      }
    }
  }

  /** Resize stage: adds `resized binary` (batched) — a REAL box-filter
    * downscale for decodable (netpbm natively, GIF/PNG via luma
    * transcode) blobs, the marked stub otherwise. */
  def resizeImages(
      df: DataFrame,
      blobCol: String = "blob",
      w: Int = 64,
      h: Int = 64,
      batchSize: Int = 64): DataFrame = {
    val outSchema = df.schema.add("resized", BinaryType, nullable = false)
    val blobIdx = df.schema.fieldIndex(blobCol)
    mapBatched(df, outSchema, batchSize) { batch =>
      batch.map(row => Row.fromSeq(row.toSeq :+ mediaResize(row.getAs[Array[Byte]](blobIdx), w, h)))
    }
  }

  /** Frame-sample stage: adds `frames array<binary>` (batched). */
  def sampleFrames(
      df: DataFrame,
      blobCol: String = "blob",
      n: Int = 4,
      batchSize: Int = 64): DataFrame = {
    val outSchema = df.schema.add("frames", ArrayType(BinaryType, containsNull = false), nullable = false)
    val blobIdx = df.schema.fieldIndex(blobCol)
    mapBatched(df, outSchema, batchSize) { batch =>
      batch.map(row => Row.fromSeq(row.toSeq :+ frameSample(row.getAs[Array[Byte]](blobIdx), n).toSeq))
    }
  }
}
