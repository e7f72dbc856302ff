package graft.media

/** A real, from-scratch baseline JPEG codec (ITU-T T.81 / ISO 10918-1):
  * marker parse, DQT (8/16-bit), DHT canonical Huffman build, SOF0/SOF1,
  * DRI/RSTn restart handling, byte-stuffed entropy decode, dequantize,
  * dezigzag, separable 2-D IDCT, and Y-plane assembly under arbitrary
  * chroma subsampling (4:4:4 / 4:2:2 / 4:2:0 / anything with Y at full
  * resolution) — making JPEG the FOURTH format (after binary netpbm, GIF,
  * and PNG) whose pixel path is genuinely end-to-end in this container.
  *
  * Scope (documented, loud Nones — never a wrong pixel):
  *  - baseline + extended-sequential DCT, 8-bit precision; progressive
  *    (SOF2+), arithmetic coding, lossless, hierarchical → None
  *  - 1-component (grayscale) and 3-component (JFIF YCbCr) frames; the
  *    luma raster is the Y CHANNEL (for JFIF that IS BT.601 luminance,
  *    the same quantity the netpbm/GIF/PNG paths compute from RGB);
  *    4-component (Adobe CMYK) → None
  *  - one interleaved scan covering all frame components (what every
  *    baseline encoder emits); multi-scan baseline → None
  *  - chroma components are entropy-decoded (the bitstream interleaves
  *    them, so they must be walked) but NOT dequantized/IDCT'd — only Y
  *    reaches pixels, so the chroma inverse transform would be dead work
  *
  * The decoder is exact where exactness is testable: a block-constant
  * image quantized with unit tables has only DC energy, and the float
  * IDCT's ~1e-13 error rounds away — so round-trips through [[encodeGray]]
  * (and through the JDK's ImageIO codec, an independent implementation —
  * see JpegCodecSpec) reproduce pixels bit-for-bit, which is what the q41
  * arithmetic oracle checks cross-engine.
  *
  * Encoder: [[encodeGray]] / [[encodeYcc]] — real FDCT + canonical
  * Huffman + byte stuffing, unit quant tables by default (mathematically
  * lossless for block-constant input, near-lossless otherwise), optional
  * restart interval so decoder tests exercise the RSTn path, selectable
  * Y subsampling for the color form so the decoder's MCU geometry is
  * tested at 4:4:4, 4:2:2 and 4:2:0.
  */
object JpegCodec {

  @inline private def u8(b: Byte): Int = b & 0xff
  @inline private def be16(a: Array[Byte], i: Int): Int = (u8(a(i)) << 8) | u8(a(i + 1))

  /** Zigzag sequence: zigzag index → natural (row-major) index. Shared by
    * encoder and decoder; structure-validated in JpegCodecSpec (a
    * permutation of 0..63 walking anti-/diagonals). */
  private[media] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // ---- canonical Huffman (shared build: spec F.2.2.3 DECODE tables) ----

  /** bits(i) = #codes of length i+1 (16 entries); vals = symbols in code
    * order. Produces (mincode, maxcode, valptr) per length 1..16 with
    * maxcode = -1 for empty lengths, exactly the spec's DECODE setup. */
  private final class HuffTable(bits: Array[Int], val vals: Array[Byte]) {
    val mincode = new Array[Int](17)
    val maxcode = new Array[Int](17)
    val valptr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) == 0) { mincode(l) = 0; maxcode(l) = -1 }
        else {
          valptr(l) = k
          mincode(l) = code
          code += bits(l - 1)
          k += bits(l - 1)
          maxcode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    /** code of each symbol (for the ENCODER): (code << 5) | length. */
    lazy val encodeTable: Array[Int] = {
      val t = new Array[Int](256)
      var k = 0
      var code = 0
      var l = 1
      while (l <= 16) {
        var i = 0
        while (i < bits(l - 1)) {
          t(u8(vals(k))) = (code << 5) | l
          code += 1
          k += 1
          i += 1
        }
        code <<= 1
        l += 1
      }
      t
    }
  }

  /** Entropy-segment bit reader: MSB-first, 0xFF00 unstuffing; a marker
    * (0xFF xx, xx != 0) ends the segment (position left ON the 0xFF). */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    var hitMarker = false

    def align(): Unit = { acc = 0; nBits = 0 }

    /** next bit, or -1 at a marker/end (corrupt stream for our callers). */
    def bit(): Int = {
      if (nBits == 0) {
        if (hitMarker || pos >= bytes.length) { hitMarker = true; return -1 }
        val b = u8(bytes(pos))
        if (b == 0xff) {
          if (pos + 1 >= bytes.length) { hitMarker = true; return -1 }
          val b2 = u8(bytes(pos + 1))
          if (b2 == 0x00) { pos += 2; acc = 0xff; nBits = 8 }
          else { hitMarker = true; return -1 } // real marker: stop here
        } else { pos += 1; acc = b; nBits = 8 }
      }
      nBits -= 1
      (acc >>> nBits) & 1
    }

    /** n magnitude bits (n ≤ 16), or -1 on marker/end. */
    def bitsN(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val b = bit()
        if (b < 0) return -1
        v = (v << 1) | b
        i += 1
      }
      v
    }

    def decodeHuff(t: HuffTable): Int = {
      var code = bit()
      if (code < 0) return -1
      var l = 1
      while (l <= 16 && code > t.maxcode(l)) {
        val b = bit()
        if (b < 0) return -1
        code = (code << 1) | b
        l += 1
      }
      if (l > 16) return -1
      val idx = t.valptr(l) + code - t.mincode(l)
      if (idx < 0 || idx >= t.vals.length) return -1
      u8(t.vals(idx))
    }
  }

  /** EXTEND (spec F.2.2.1): map `size` magnitude bits to a signed value. */
  @inline private def extend(v: Int, size: Int): Int =
    if (size == 0) 0 else if (v < (1 << (size - 1))) v - (1 << size) + 1 else v

  private val idctCos: Array[Double] = {
    // cos((2x+1)·u·π/16) · C(u)/2, flattened [u][x]
    val t = new Array[Double](64)
    var u = 0
    while (u < 8) {
      val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      var x = 0
      while (x < 8) {
        t(u * 8 + x) = 0.5 * cu * math.cos((2 * x + 1) * u * math.Pi / 16.0)
        x += 1
      }
      u += 1
    }
    t
  }

  /** Separable 2-D IDCT of a dequantized natural-order block; output =
    * level-shifted (+128) clamped bytes into `out` at (ox, oy), clipped to
    * w×h (stride w). */
  private def idctToPlane(
      coef: Array[Int], out: Array[Byte], w: Int, h: Int, ox: Int, oy: Int): Unit = {
    // rows: tmp(y,x) = Σ_u C(u)/2 cos(..x,u..) coef(y,u)
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += idctCos(u * 8 + x) * coef(y * 8 + u); u += 1 }
        tmp(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
    // cols + shift/clamp/clip
    var x = 0
    while (x < 8) {
      val px = ox + x
      if (px < w) {
        var yy = 0
        while (yy < 8) {
          val py = oy + yy
          if (py < h) {
            var s = 0.0
            var v = 0
            while (v < 8) { s += idctCos(v * 8 + yy) * tmp(v * 8 + x); v += 1 }
            val r = math.round(s + 128.0).toInt
            out(py * w + px) = (if (r < 0) 0 else if (r > 255) 255 else r).toByte
          }
          yy += 1
        }
      }
      x += 1
    }
  }

  private final case class Component(
      id: Int, h: Int, v: Int, tq: Int, var dcTable: Int = 0, var acTable: Int = 0)

  /** Decode to the Y plane: (width, height, luma row-major). None on
    * anything outside the documented scope or malformed. */
  def decodeLuma(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    try {
      if (bytes == null || bytes.length < 4 ||
        u8(bytes(0)) != 0xff || u8(bytes(1)) != 0xd8) return None
      val quant = new Array[Array[Int]](4) // natural-order tables
      val dcTables = new Array[HuffTable](4)
      val acTables = new Array[HuffTable](4)
      var comps: Array[Component] = null
      var w = 0
      var h = 0
      var restartInterval = 0
      var i = 2

      while (i + 1 < bytes.length) {
        if (u8(bytes(i)) != 0xff) return None
        val marker = u8(bytes(i + 1))
        if (marker == 0xff) { i += 1 } // fill byte
        else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) i += 2 // TEM/RSTn (stray)
        else if (marker == 0xd9) return None // EOI before SOS
        else {
          if (i + 3 >= bytes.length) return None
          val len = be16(bytes, i + 2)
          if (len < 2 || i + 2 + len > bytes.length) return None
          val seg = i + 4
          val segLen = len - 2
          marker match {
            case 0xc0 | 0xc1 => // SOF0 baseline / SOF1 extended sequential
              if (segLen < 6) return None
              val precision = u8(bytes(seg))
              h = be16(bytes, seg + 1)
              w = be16(bytes, seg + 3)
              val nf = u8(bytes(seg + 5))
              if (precision != 8 || w == 0 || h == 0 || (nf != 1 && nf != 3) ||
                segLen < 6 + 3 * nf || w.toLong * h > (1L << 28)) return None
              comps = Array.tabulate(nf) { c =>
                val o = seg + 6 + 3 * c
                Component(u8(bytes(o)), u8(bytes(o + 1)) >> 4, u8(bytes(o + 1)) & 0xf,
                  u8(bytes(o + 2)))
              }
              if (comps.exists(c => c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 || c.tq > 3))
                return None
            case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
              return None // progressive / arithmetic / lossless / hierarchical
            case 0xc4 => // DHT (possibly several tables per segment)
              var o = seg
              while (o < seg + segLen) {
                if (o + 17 > seg + segLen) return None
                val tc = u8(bytes(o)) >> 4
                val th = u8(bytes(o)) & 0xf
                if (tc > 1 || th > 3) return None
                val bits = Array.tabulate(16)(k => u8(bytes(o + 1 + k)))
                val n = bits.sum
                if (n == 0 || n > 256 || o + 17 + n > seg + segLen) return None
                val vals = java.util.Arrays.copyOfRange(bytes, o + 17, o + 17 + n)
                val t = new HuffTable(bits, vals)
                if (tc == 0) dcTables(th) = t else acTables(th) = t
                o += 17 + n
              }
            case 0xdb => // DQT (possibly several tables per segment)
              var o = seg
              while (o < seg + segLen) {
                val pq = u8(bytes(o)) >> 4
                val tq = u8(bytes(o)) & 0xf
                if (pq > 1 || tq > 3) return None
                val n = if (pq == 0) 64 else 128
                if (o + 1 + n > seg + segLen) return None
                val t = new Array[Int](64)
                var k = 0
                while (k < 64) {
                  t(Zigzag(k)) =
                    if (pq == 0) u8(bytes(o + 1 + k)) else be16(bytes, o + 1 + 2 * k)
                  k += 1
                }
                quant(tq) = t
                o += 1 + n
              }
            case 0xdd => // DRI
              if (segLen < 2) return None
              restartInterval = be16(bytes, seg)
            case 0xda => // SOS — entropy data follows; decode and return
              if (comps == null) return None
              val ns = u8(bytes(seg))
              if (ns != comps.length || segLen < 1 + 2 * ns + 3) return None
              var c = 0
              while (c < ns) {
                val cs = u8(bytes(seg + 1 + 2 * c))
                val comp = comps.find(_.id == cs).getOrElse(return None)
                comp.dcTable = u8(bytes(seg + 2 + 2 * c)) >> 4
                comp.acTable = u8(bytes(seg + 2 + 2 * c)) & 0xf
                c += 1
              }
              return decodeScan(
                bytes, i + 2 + len, comps, quant, dcTables, acTables, w, h, restartInterval)
            case _ => () // APPn / COM / others: skip
          }
          i += 2 + len
        }
      }
      None // no SOS
    } catch { case _: IndexOutOfBoundsException => None }
  }

  private def decodeScan(
      bytes: Array[Byte], start: Int, comps: Array[Component],
      quant: Array[Array[Int]], dcTables: Array[HuffTable], acTables: Array[HuffTable],
      w: Int, h: Int, restartInterval: Int): Option[(Int, Int, Array[Byte])] = {
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val yComp = comps(0) // first frame component is Y (or the only one)
    // the luma raster must be full-resolution: Y subsampled below the max
    // factor (never emitted by real encoders) is out of scope
    if (yComp.h != hMax || yComp.v != vMax) return None
    if (quant(yComp.tq) == null) return None
    var ti = 0
    while (ti < comps.length) {
      val c = comps(ti)
      if (c.dcTable > 3 || c.acTable > 3 ||
        dcTables(c.dcTable) == null || acTables(c.acTable) == null) return None
      ti += 1
    }
    val yQuant = quant(yComp.tq)

    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val luma = new Array[Byte](w * h)
    val coef = new Array[Int](64)
    val dcPred = new Array[Int](comps.length)
    val r = new BitReader(bytes, start)
    var mcu = 0
    val nMcus = mcusX.toLong * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        // byte-align and consume the RSTn marker; reset DC predictors
        r.align()
        r.hitMarker = false
        // skip fill bytes then expect FF D0+m
        var p = r.pos
        while (p + 1 < bytes.length && u8(bytes(p)) == 0xff && u8(bytes(p + 1)) == 0xff) p += 1
        if (p + 1 >= bytes.length || u8(bytes(p)) != 0xff ||
          (u8(bytes(p + 1)) & 0xf8) != 0xd0) return None
        r.pos = p + 2
        java.util.Arrays.fill(dcPred, 0)
      }
      val mcuX = (mcu % mcusX).toInt
      val mcuY = (mcu / mcusX).toInt
      var ci = 0
      while (ci < comps.length) {
        val comp = comps(ci)
        val isY = ci == 0
        val dcT = dcTables(comp.dcTable)
        val acT = acTables(comp.acTable)
        var by = 0
        while (by < comp.v) {
          var bx = 0
          while (bx < comp.h) {
            // --- one block ---
            val s = r.decodeHuff(dcT)
            if (s < 0 || s > 15) return None
            val dcBits = if (s == 0) 0 else r.bitsN(s)
            if (dcBits < 0) return None
            dcPred(ci) += extend(dcBits, s)
            if (isY) {
              java.util.Arrays.fill(coef, 0)
              coef(0) = dcPred(ci) * yQuant(0)
            }
            var k = 1
            var eob = false
            while (!eob && k < 64) {
              val rs = r.decodeHuff(acT)
              if (rs < 0) return None
              val run = rs >> 4
              val size = rs & 0xf
              if (size == 0) {
                if (run == 15) k += 16 // ZRL
                else eob = true // EOB
              } else {
                k += run
                if (k > 63) return None
                val vb = r.bitsN(size)
                if (vb < 0) return None
                if (isY) {
                  val nat = Zigzag(k)
                  coef(nat) = extend(vb, size) * yQuant(nat)
                }
                k += 1
              }
            }
            if (isY)
              idctToPlane(coef, luma, w, h, (mcuX * comp.h + bx) * 8, (mcuY * comp.v + by) * 8)
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    Some((w, h, luma))
  }

  // ---- encoder ----

  // Annex K DC luminance table (lengths then symbols 0..11)
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array.tabulate[Byte](12)(_.toByte)
  // flat AC table: EOB, ZRL and every (run 0-15, size 1-10) at 8 bits —
  // valid canonical Huffman (162·2⁻⁸ < 1), terrible compression, but the
  // encoder exists for round-trip tests, not for byte budgets
  private val AcVals: Array[Byte] = {
    val b = Array.newBuilder[Byte]
    b += 0x00 // EOB
    b += 0xf0.toByte // ZRL
    for (run <- 0 until 16; size <- 1 to 10) b += ((run << 4) | size).toByte
    b.result()
  }
  private val AcBits = Array(0, 0, 0, 0, 0, 0, 0, AcVals.length, 0, 0, 0, 0, 0, 0, 0, 0)
  private lazy val dcHuff = new HuffTable(DcBits, DcVals)
  private lazy val acHuff = new HuffTable(AcBits, AcVals)

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nBits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        nBits += 1
        if (nBits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nBits = 0
        }
        i -= 1
      }
    }
    /** pad the final partial byte with 1s (spec F.1.2.3). */
    def flush(): Unit = if (nBits > 0) { put(0xff, 8 - nBits) }
  }

  private def fdctQuant(block: Array[Int], q: Int): Array[Int] = {
    // F(u,v) = C(u)C(v)/4 ΣΣ (f(x,y)-128) cos cos, via the same idctCos
    val shifted = new Array[Double](64)
    var i = 0
    while (i < 64) { shifted(i) = block(i) - 128.0; i += 1 }
    val tmp = new Array[Double](64) // rows: tmp(y,u) = Σ_x cosT(u,x) f(y,x)
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += idctCos(u * 8 + x) * shifted(y * 8 + x); x += 1 }
        tmp(y * 8 + u) = s
        u += 1
      }
      y += 1
    }
    val out = new Array[Int](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 8) { s += idctCos(v * 8 + yy) * tmp(yy * 8 + u); yy += 1 }
        out(v * 8 + u) = math.round(s / q).toInt
        u += 1
      }
      v += 1
    }
    out
  }

  private def writeBlock(bw: BitWriter, coefNat: Array[Int], pred: Int): Int = {
    val dc = coefNat(0)
    val diff = dc - pred
    val size = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
    val dcCode = dcHuff.encodeTable(size)
    bw.put(dcCode >>> 5, dcCode & 0x1f)
    if (size > 0) bw.put(if (diff < 0) diff + (1 << size) - 1 else diff, size)
    var k = 1
    var run = 0
    while (k < 64) {
      val c = coefNat(Zigzag(k))
      if (c == 0) run += 1
      else {
        while (run >= 16) {
          val z = acHuff.encodeTable(0xf0); bw.put(z >>> 5, z & 0x1f); run -= 16
        }
        val s = 32 - Integer.numberOfLeadingZeros(math.abs(c))
        require(s <= 10, s"AC coefficient out of the flat table's range: $c")
        val code = acHuff.encodeTable((run << 4) | s)
        bw.put(code >>> 5, code & 0x1f)
        bw.put(if (c < 0) c + (1 << s) - 1 else c, s)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val e = acHuff.encodeTable(0x00); bw.put(e >>> 5, e & 0x1f) }
    dc
  }

  private def seg(out: java.io.ByteArrayOutputStream, marker: Int, payload: Array[Byte]): Unit = {
    out.write(0xff); out.write(marker)
    val len = payload.length + 2
    out.write(len >>> 8); out.write(len & 0xff)
    out.write(payload, 0, payload.length)
  }

  private def dhtPayload(tc: Int, th: Int, bits: Array[Int], vals: Array[Byte]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    o.write((tc << 4) | th)
    bits.foreach(o.write)
    o.write(vals, 0, vals.length)
    o.toByteArray
  }

  /** Sample a (possibly clipped) 8×8 block with edge replication. */
  private def sampleBlock(
      px: Array[Int], w: Int, h: Int, ox: Int, oy: Int): Array[Int] = {
    val b = new Array[Int](64)
    var y = 0
    while (y < 8) {
      val sy = math.min(oy + y, h - 1)
      var x = 0
      while (x < 8) {
        b(y * 8 + x) = px(sy * w + math.min(ox + x, w - 1))
        x += 1
      }
      y += 1
    }
    b
  }

  /** Grayscale baseline JPEG (quant `q` uniform, default 1 = near-lossless
    * — EXACTLY lossless for images constant within each padded 8×8 block);
    * `restartEvery` > 0 emits DRI + RSTn markers. */
  def encodeGray(
      w: Int, h: Int, pixels: Array[Byte], q: Int = 1, restartEvery: Int = 0): Array[Byte] =
    encodeYcc(w, h, Array(pixels), 1, 1, q, restartEvery)

  /** `planes` = Y (full res w×h) and optionally Cb, Cr (each at
    * ceil(w/sh)×ceil(h/sv)); Y sampling (sh, sv) vs chroma 1×1 gives
    * 4:4:4 (1,1), 4:2:2 (2,1) or 4:2:0 (2,2). */
  def encodeYcc(
      w: Int, h: Int, planes: Array[Array[Byte]], sh: Int, sv: Int,
      q: Int = 1, restartEvery: Int = 0): Array[Byte] = {
    require(planes.length == 1 || planes.length == 3, "1 (gray) or 3 (YCbCr) planes")
    require(q >= 1 && q <= 255)
    require(sh >= 1 && sh <= 2 && sv >= 1 && sv <= 2)
    val nf = planes.length
    val cw = (w + sh - 1) / sh
    val ch = (h + sv - 1) / sv
    require(planes(0).length == w * h, "Y plane must be w*h")
    if (nf == 3) require(planes(1).length == cw * ch && planes(2).length == cw * ch,
      s"chroma planes must be $cw*$ch")

    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    // DQT id 0 (uniform q), 8-bit precision
    val dqt = new Array[Byte](65)
    dqt(0) = 0
    java.util.Arrays.fill(dqt, 1, 65, q.toByte)
    seg(out, 0xdb, dqt)
    // SOF0
    val sof = new java.io.ByteArrayOutputStream()
    sof.write(8)
    sof.write(h >>> 8); sof.write(h & 0xff)
    sof.write(w >>> 8); sof.write(w & 0xff)
    sof.write(nf)
    sof.write(1); sof.write(if (nf == 3) (sh << 4) | sv else 0x11); sof.write(0) // Y
    if (nf == 3) {
      sof.write(2); sof.write(0x11); sof.write(0) // Cb (same uniform table)
      sof.write(3); sof.write(0x11); sof.write(0) // Cr
    }
    seg(out, 0xc0, sof.toByteArray)
    seg(out, 0xc4, dhtPayload(0, 0, DcBits, DcVals))
    seg(out, 0xc4, dhtPayload(1, 0, AcBits, AcVals))
    if (restartEvery > 0) {
      seg(out, 0xdd, Array(((restartEvery >>> 8) & 0xff).toByte, (restartEvery & 0xff).toByte))
    }
    // SOS
    val sos = new java.io.ByteArrayOutputStream()
    sos.write(nf)
    for (c <- 1 to nf) { sos.write(c); sos.write(0x00) } // DC 0 / AC 0 for all
    sos.write(0); sos.write(63); sos.write(0) // Ss/Se/AhAl (baseline fixed)
    seg(out, 0xda, sos.toByteArray)

    val yPix = new Array[Int](w * h)
    var i = 0
    while (i < w * h) { yPix(i) = u8(planes(0)(i)); i += 1 }
    val cPix: Array[Array[Int]] =
      if (nf == 3) Array.tabulate(2) { p =>
        val a = new Array[Int](cw * ch)
        var j = 0
        while (j < a.length) { a(j) = u8(planes(p + 1)(j)); j += 1 }
        a
      } else null

    val bw = new BitWriter(out)
    val hMax = if (nf == 3) sh else 1
    val vMax = if (nf == 3) sv else 1
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val dcPred = new Array[Int](nf)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartEvery > 0 && mcu > 0 && mcu % restartEvery == 0) {
        bw.flush()
        out.write(0xff); out.write(0xd0 + ((mcu / restartEvery - 1) & 7))
        java.util.Arrays.fill(dcPred, 0)
      }
      val mcuX = mcu % mcusX
      val mcuY = mcu / mcusX
      // Y blocks
      var by = 0
      while (by < vMax) {
        var bx = 0
        while (bx < hMax) {
          val blk = sampleBlock(yPix, w, h, (mcuX * hMax + bx) * 8, (mcuY * vMax + by) * 8)
          dcPred(0) = writeBlock(bw, fdctQuant(blk, q), dcPred(0))
          bx += 1
        }
        by += 1
      }
      // chroma blocks (1 each at the subsampled resolution)
      if (nf == 3) {
        var p = 0
        while (p < 2) {
          val blk = sampleBlock(cPix(p), cw, ch, mcuX * 8, mcuY * 8)
          dcPred(p + 1) = writeBlock(bw, fdctQuant(blk, q), dcPred(p + 1))
          p += 1
        }
      }
      mcu += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }
}
