package graft.media

/** MJPEG-in-MP4: real video-frame pixels through composition — the ISO
  * base-media sample tables (MPEG-4 Part 12, public spec) locate each
  * frame's byte range inside `mdat`, and every frame of an MJPEG track is
  * a complete baseline JPEG that [[JpegCodec]] already decodes from
  * scratch. That turns mp4 from "real headers, stub pixels" into a third
  * REAL modality (after images and WAV audio) for the one video codec a
  * pure-JVM container can honestly claim: Motion-JPEG (sample-entry
  * fourccs `jpeg`/`mjpa`). Non-MJPEG tracks (avc1/hevc/vp9...) keep the
  * loud deterministic stubs — a from-scratch H.264 decoder is out of
  * scope, and wrong pixels are worse than marked fakes.
  *
  * Parser: `moov→trak→mdia→minf→stbl`, reading the four sample-table
  * boxes that together map sample index → absolute byte range:
  *   stsd  sample description (codec fourcc + coded width/height)
  *   stsz  per-sample sizes (uniform `sample_size` or a table)
  *   stsc  sample→chunk runs (first_chunk, samples_per_chunk)
  *   stco / co64  chunk offsets (u32 / u64)
  * Totality: malformed/truncated input → None, never a throw and never
  * wrong pixels (same contract as the other codecs).
  *
  * The encoder ([[encodeMjpeg]]) is a minimal self-contained muxer —
  * `ftyp` + `mdat` + `moov` with a correct full sample table — so
  * round-trip specs and the q53 arithmetic oracle exist without external
  * fixtures; `chunkSize` > 1 exercises multi-sample chunks (the stsc
  * mapping), and `uniformStsz` exercises the sample_size fast path.
  */
object Mp4Codec {

  /** First video track's frame locator: codec fourcc, coded dims, and the
    * absolute (offset, size) of every sample in file order. */
  final case class VideoTrack(
      codec: String, width: Int, height: Int,
      offsets: Array[Long], sizes: Array[Int])

  private def u8(b: Byte): Int = b & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b(i)) << 8) | u8(b(i + 1))
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b(i)) << 24) | (u8(b(i + 1)) << 16) | (u8(b(i + 2)) << 8) | u8(b(i + 3))
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i).toLong << 32) | (be32(b, i + 4).toLong & 0xffffffffL)
  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Parse the first video track that carries a complete sample table.
    * None when the file has no moov, no video track, or a table is
    * missing/inconsistent (e.g. stsc maps more samples than stsz counts). */
  def parseVideoTrack(bytes: Array[Byte]): Option[VideoTrack] =
    try {
      final class T {
        var handler = ""
        var codec = ""; var w = 0; var h = 0
        var sizes: Array[Int] = null
        var chunkOffsets: Array[Long] = null
        var stsc: Array[(Int, Int)] = null // (first_chunk 1-based, samples_per_chunk)
      }
      val tracks = scala.collection.mutable.ArrayBuffer.empty[T]

      def walk(start: Long, end: Long, cur: T): Unit = {
        var i = start
        while (i + 8 <= end) {
          var size: Long = be32(bytes, i.toInt).toLong & 0xffffffffL
          val typ = fourcc(bytes, i.toInt + 4)
          var header = 8L
          if (size == 1 && i + 16 <= end) { size = be64(bytes, i.toInt + 8); header = 16 }
          else if (size == 0) size = end - i
          if (size < header || i + size > end) return // malformed: stop
          val p = (i + header).toInt
          typ match {
            case "moov" => walk(i + header, i + size, cur)
            case "trak" => val t = new T; tracks += t; walk(i + header, i + size, t)
            case "mdia" | "minf" | "stbl" => walk(i + header, i + size, cur)
            case "hdlr" if cur != null =>
              if (p + 12 <= i + size) cur.handler = fourcc(bytes, p + 8)
            case "stsd" if cur != null =>
              // version/flags(4) entry_count(4) then the first entry:
              // size(4) fourcc(4) reserved(6) dref(2) predef/reserved(16)
              // width(2) height(2) ...
              if (p + 16 <= i + size && be32(bytes, p + 4) >= 1) {
                cur.codec = fourcc(bytes, p + 12)
                if (p + 8 + 36 <= i + size) {
                  cur.w = be16(bytes, p + 8 + 32)
                  cur.h = be16(bytes, p + 8 + 34)
                }
              }
            case "stsz" if cur != null =>
              if (p + 12 <= i + size) {
                val uniform = be32(bytes, p + 4)
                val n = be32(bytes, p + 8)
                if (n >= 0 && n <= (1 << 24)) {
                  if (uniform != 0) cur.sizes = Array.fill(n)(uniform)
                  else if (p + 12 + 4L * n <= i + size)
                    cur.sizes = Array.tabulate(n)(k => be32(bytes, p + 12 + 4 * k))
                }
              }
            case "stsc" if cur != null =>
              if (p + 8 <= i + size) {
                val n = be32(bytes, p + 4)
                if (n >= 0 && n <= (1 << 20) && p + 8 + 12L * n <= i + size)
                  cur.stsc = Array.tabulate(n)(k =>
                    (be32(bytes, p + 8 + 12 * k), be32(bytes, p + 8 + 12 * k + 4)))
              }
            case "stco" if cur != null =>
              if (p + 8 <= i + size) {
                val n = be32(bytes, p + 4)
                if (n >= 0 && n <= (1 << 20) && p + 8 + 4L * n <= i + size)
                  cur.chunkOffsets = Array.tabulate(n)(k =>
                    be32(bytes, p + 8 + 4 * k).toLong & 0xffffffffL)
              }
            case "co64" if cur != null =>
              if (p + 8 <= i + size) {
                val n = be32(bytes, p + 4)
                if (n >= 0 && n <= (1 << 20) && p + 8 + 8L * n <= i + size)
                  cur.chunkOffsets = Array.tabulate(n)(k => be64(bytes, p + 8 + 8 * k))
              }
            case _ => () // ftyp, mdat, mvhd, tkhd, mdhd, stts, vmhd, dinf...
          }
          i += size
        }
      }
      walk(0L, bytes.length.toLong, null)

      tracks.find(t =>
        t.handler == "vide" && t.codec.nonEmpty &&
          t.sizes != null && t.chunkOffsets != null && t.stsc != null && t.stsc.nonEmpty)
        .flatMap { t =>
          // expand stsc runs: chunk c (1-based) uses the samples_per_chunk of
          // the last stsc entry with first_chunk <= c
          val nSamples = t.sizes.length
          val offsets = new Array[Long](nSamples)
          var sample = 0
          var chunk = 0 // 0-based
          var run = 0
          var ok = true
          while (sample < nSamples && ok) {
            if (chunk >= t.chunkOffsets.length) ok = false
            else {
              while (run + 1 < t.stsc.length && t.stsc(run + 1)._1 <= chunk + 1) run += 1
              val perChunk = t.stsc(run)._2
              if (perChunk <= 0) ok = false
              else {
                var off = t.chunkOffsets(chunk)
                var k = 0
                while (k < perChunk && sample < nSamples) {
                  offsets(sample) = off
                  off += t.sizes(sample)
                  sample += 1
                  k += 1
                }
                chunk += 1
              }
            }
          }
          // every sample must land fully inside the file
          if (!ok || sample < nSamples) None
          else if ((0 until nSamples).exists(k =>
            offsets(k) < 0 || offsets(k) + t.sizes(k) > bytes.length)) None
          else Some(VideoTrack(t.codec, t.w, t.h, offsets, t.sizes))
        }
    } catch { case _: IndexOutOfBoundsException | _: NegativeArraySizeException => None }

  /** Motion-JPEG sample-entry fourccs this container can truly decode. */
  private def isMjpeg(codec: String): Boolean = codec == "jpeg" || codec == "mjpa"

  /** The raw bytes of frame `i` (any codec) — each MJPEG sample is a
    * complete JPEG file. */
  def frameBytes(bytes: Array[Byte], track: VideoTrack, i: Int): Array[Byte] =
    java.util.Arrays.copyOfRange(
      bytes, track.offsets(i).toInt, track.offsets(i).toInt + track.sizes(i))

  /** REAL pixel decode of frame `i` of an MJPEG track: (w, h, luma). */
  def decodeFrameLuma(bytes: Array[Byte], i: Int): Option[(Int, Int, Array[Byte])] =
    parseVideoTrack(bytes).filter(t => isMjpeg(t.codec) && i >= 0 && i < t.sizes.length)
      .flatMap(t => JpegCodec.decodeLuma(frameBytes(bytes, t, i)))

  /** First decodable frame — mp4's entry in [[Media.decodeLuma]]. */
  def decodeFirstFrameLuma(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    decodeFrameLuma(bytes, 0)

  /** (n_frames, Σ luma over EVERY pixel of EVERY frame) for an MJPEG
    * track — the cross-engine pixel-truth scalar for video (q53). None if
    * any single frame fails to decode: a partial sum would be a wrong
    * answer, not a degraded one. */
  def videoLumaTotal(bytes: Array[Byte]): Option[(Int, Long)] =
    parseVideoTrack(bytes).filter(t => isMjpeg(t.codec)).flatMap { t =>
      var total = 0L
      var i = 0
      var ok = true
      while (ok && i < t.sizes.length) {
        JpegCodec.decodeLuma(frameBytes(bytes, t, i)) match {
          case Some((_, _, luma)) =>
            var p = 0
            while (p < luma.length) { total += u8(luma(p)); p += 1 }
          case None => ok = false
        }
        i += 1
      }
      if (ok) Some((t.sizes.length, total)) else None
    }

  /** Evenly-spaced REAL frame extraction: n of the track's frames, each a
    * complete standalone JPEG blob (itself decodable by the image
    * stages). Backs [[Media.frameSample]] for MJPEG tracks. */
  def sampleFrames(bytes: Array[Byte], n: Int): Option[Array[Array[Byte]]] =
    parseVideoTrack(bytes).filter(t => isMjpeg(t.codec) && t.sizes.nonEmpty && n > 0)
      .map { t =>
        val total = t.sizes.length
        val take = math.min(n, total)
        Array.tabulate(take)(k => frameBytes(bytes, t, k * total / take))
      }

  // --- muxer (tests + oracle synthesis) ---

  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val inner = payload.map(_.length).sum
    val out = new Array[Byte](8 + inner)
    val size = out.length
    out(0) = (size >>> 24).toByte; out(1) = (size >>> 16).toByte
    out(2) = (size >>> 8).toByte; out(3) = size.toByte
    typ.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1).copyToArray(out, 4)
    var p = 8
    payload.foreach { b => b.copyToArray(out, p); p += b.length }
    out
  }
  private def u32(v: Long): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def u16(v: Int): Array[Byte] = Array((v >>> 8).toByte, v.toByte)

  /** Mux pre-encoded JPEG frames into a minimal ISO-BMFF MJPEG file.
    * `chunkSize` frames per mdat chunk (stsc/stco geometry); `uniformStsz`
    * writes the sample_size fast path (requires equal-size frames). */
  def encodeMjpeg(
      frames: Seq[Array[Byte]], width: Int, height: Int,
      chunkSize: Int = 1, uniformStsz: Boolean = false,
      codec: String = "jpeg"): Array[Byte] = {
    require(frames.nonEmpty, "at least one frame")
    require(chunkSize >= 1)
    require(codec.length == 4)
    if (uniformStsz)
      require(frames.map(_.length).distinct.size == 1, "uniform stsz needs equal-size frames")

    val ftyp = box("ftyp",
      "isom".getBytes("ISO-8859-1"), u32(0x200L), "isom".getBytes("ISO-8859-1"))
    val mdatPayload = frames.flatMap(_.toSeq).toArray
    // absolute sample offsets: ftyp + mdat header (8)
    val mdatBase = ftyp.length + 8L
    val nChunks = (frames.length + chunkSize - 1) / chunkSize
    val chunkOffsets = new Array[Long](nChunks)
    var off = mdatBase
    var f = 0
    for (c <- 0 until nChunks) {
      chunkOffsets(c) = off
      var k = 0
      while (k < chunkSize && f < frames.length) { off += frames(f).length; f += 1; k += 1 }
    }

    val timescale = 1000L
    val dur = 100L * frames.length

    val mvhd = box("mvhd", u32(0), u32(0), u32(0), u32(timescale), u32(dur),
      u32(0x00010000L), u16(0x0100), u16(0), u32(0), u32(0),
      // identity matrix
      u32(0x00010000L), u32(0), u32(0), u32(0), u32(0x00010000L), u32(0),
      u32(0), u32(0), u32(0x40000000L),
      u32(0), u32(0), u32(0), u32(0), u32(0), u32(0), u32(2))
    val tkhd = box("tkhd", u32(7), u32(0), u32(0), u32(1), u32(0), u32(dur),
      u32(0), u32(0), u16(0), u16(0), u16(0), u16(0),
      u32(0x00010000L), u32(0), u32(0), u32(0), u32(0x00010000L), u32(0),
      u32(0), u32(0), u32(0x40000000L),
      u32(width.toLong << 16), u32(height.toLong << 16))
    val mdhd = box("mdhd", u32(0), u32(0), u32(0), u32(timescale), u32(dur),
      u16(0x55c4), u16(0))
    val hdlr = box("hdlr", u32(0), u32(0),
      "vide".getBytes("ISO-8859-1"), u32(0), u32(0), u32(0), Array[Byte](0))
    val vmhd = box("vmhd", u32(1), u16(0), u16(0), u16(0), u16(0))
    val dinf = box("dinf", box("dref", u32(0), u32(1), box("url ", u32(1))))

    // VisualSampleEntry: 8 fourcc-box header + 78 fixed bytes
    val compressor = new Array[Byte](32)
    val entry = box(codec,
      new Array[Byte](6), u16(1),                     // reserved, data_reference_index
      u16(0), u16(0), u32(0), u32(0), u32(0),         // pre_defined/reserved
      u16(width), u16(height),
      u32(0x00480000L), u32(0x00480000L),             // 72 dpi
      u32(0), u16(1),                                 // reserved, frame_count
      compressor, u16(24), u16(0xffff))               // depth, pre_defined -1
    val stsd = box("stsd", u32(0), u32(1), entry)
    val stts = box("stts", u32(0), u32(1), u32(frames.length.toLong), u32(100))
    val stsc =
      if (frames.length % chunkSize == 0 || nChunks == 1)
        box("stsc", u32(0), u32(1), u32(1), u32(math.min(chunkSize, frames.length).toLong), u32(1))
      else // final short chunk needs its own run
        box("stsc", u32(0), u32(2),
          u32(1), u32(chunkSize.toLong), u32(1),
          u32(nChunks.toLong), u32((frames.length % chunkSize).toLong), u32(1))
    val stsz =
      if (uniformStsz) box("stsz", u32(0), u32(frames.head.length.toLong), u32(frames.length.toLong))
      else box("stsz", u32(0), u32(0), u32(frames.length.toLong),
        frames.flatMap(fr => u32(fr.length.toLong)).toArray)
    val stco = box("stco", u32(0), u32(nChunks.toLong), chunkOffsets.flatMap(u32))

    val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
    val minf = box("minf", vmhd, dinf, stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", tkhd, mdia)
    val moov = box("moov", mvhd, trak)
    val mdat = box("mdat", mdatPayload)

    ftyp ++ mdat ++ moov
  }
}
