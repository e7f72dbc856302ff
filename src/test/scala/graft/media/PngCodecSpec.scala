package graft.media

import org.scalatest.funsuite.AnyFunSuite

/** The from-scratch PNG decoder against its own encoder (round-trip
  * through REAL deflate + REAL scanline filters) and against hand-built
  * chunk streams for the color types the encoder doesn't emit. */
class PngCodecSpec extends AnyFunSuite {

  private def gray(w: Int, h: Int)(f: Int => Int): Array[Byte] =
    Array.tabulate(w * h)(i => f(i).toByte)

  test("gray round-trip through every filter type 0-4, assorted shapes") {
    for {
      (w, h) <- Seq((1, 1), (7, 1), (1, 9), (13, 5), (32, 32), (3, 17))
      filter <- 0 to 4
    } {
      val px = gray(w, h)(i => (i * 37 + w * 11 + h * 5 + filter) % 256)
      val png = PngCodec.encodeGray(w, h, px, filter)
      val Some((dw, dh, luma)) = PngCodec.decodeLuma(png)
      assert((dw, dh) == (w, h), s"dims filter=$filter")
      assert(luma.toSeq == px.toSeq, s"pixels w=$w h=$h filter=$filter")
    }
  }

  test("rgb round-trip: decoded luma is the BT.601 integer of the stored rgb") {
    val w = 19; val h = 7
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 73 + 5) % 256).toByte)
    for (filter <- 0 to 4) {
      val png = PngCodec.encodeRgb(w, h, rgb, filter)
      val Some((dw, dh, luma)) = PngCodec.decodeLuma(png)
      assert((dw, dh) == (w, h))
      val expected = Array.tabulate(w * h) { p =>
        ((299 * (rgb(3 * p) & 0xff) + 587 * (rgb(3 * p + 1) & 0xff) +
          114 * (rgb(3 * p + 2) & 0xff)) / 1000).toByte
      }
      assert(luma.toSeq == expected.toSeq, s"filter=$filter")
    }
  }

  // hand-built PNG for color types the encoder doesn't emit
  private def buildPng(
      w: Int, h: Int, colorType: Int, bpp: Int,
      px: Array[Byte], plte: Option[Array[Byte]] = None,
      interlace: Int = 0, corruptCrc: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, data: Array[Byte], breakCrc: Boolean = false): Unit = {
      def be(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
      out.write(be(data.length))
      val tb = typ.getBytes("US-ASCII")
      out.write(tb)
      out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(be(crc.getValue.toInt ^ (if (breakCrc) 0xdead else 0)))
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = (w >>> 24).toByte; ihdr(1) = (w >>> 16).toByte; ihdr(2) = (w >>> 8).toByte; ihdr(3) = w.toByte
    ihdr(4) = (h >>> 24).toByte; ihdr(5) = (h >>> 16).toByte; ihdr(6) = (h >>> 8).toByte; ihdr(7) = h.toByte
    ihdr(8) = 8; ihdr(9) = colorType.toByte; ihdr(12) = interlace.toByte
    chunk("IHDR", ihdr)
    plte.foreach(p => chunk("PLTE", p))
    // filter 0 scanlines
    val stride = w * bpp
    val raw = new Array[Byte](h * (1 + stride))
    var y = 0
    while (y < h) {
      System.arraycopy(px, y * stride, raw, y * (1 + stride) + 1, stride)
      y += 1
    }
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](8192)
    val comp = new java.io.ByteArrayOutputStream()
    while (!d.finished()) comp.write(buf, 0, d.deflate(buf))
    d.end()
    chunk("IDAT", comp.toByteArray, breakCrc = corruptCrc)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  test("palette (color type 3) decodes through PLTE to BT.601 luma") {
    val w = 6; val h = 4
    val plte = Array.tabulate(3 * 16)(i => ((i * 29 + 3) % 256).toByte)
    val idx = Array.tabulate(w * h)(i => (i % 16).toByte)
    val Some((dw, dh, luma)) = PngCodec.decodeLuma(buildPng(w, h, 3, 1, idx, Some(plte)))
    assert((dw, dh) == (w, h))
    val expected = idx.map { ib =>
      val i = ib & 0xff
      ((299 * (plte(3 * i) & 0xff) + 587 * (plte(3 * i + 1) & 0xff) +
        114 * (plte(3 * i + 2) & 0xff)) / 1000).toByte
    }
    assert(luma.toSeq == expected.toSeq)
  }

  test("gray+alpha (4) and RGBA (6) decode; alpha is ignored for luma") {
    val w = 5; val h = 3
    val ga = Array.tabulate(w * h * 2)(i => ((i * 41) % 256).toByte)
    val Some((_, _, l4)) = PngCodec.decodeLuma(buildPng(w, h, 4, 2, ga))
    assert(l4.toSeq == Array.tabulate(w * h)(p => ga(2 * p)).toSeq)
    val rgba = Array.tabulate(w * h * 4)(i => ((i * 17 + 9) % 256).toByte)
    val Some((_, _, l6)) = PngCodec.decodeLuma(buildPng(w, h, 6, 4, rgba))
    val expected = Array.tabulate(w * h) { p =>
      ((299 * (rgba(4 * p) & 0xff) + 587 * (rgba(4 * p + 1) & 0xff) +
        114 * (rgba(4 * p + 2) & 0xff)) / 1000).toByte
    }
    assert(l6.toSeq == expected.toSeq)
  }

  test("malformed inputs return None, never garbage") {
    val good = PngCodec.encodeGray(8, 8, gray(8, 8)(_ % 251), 2)
    assert(PngCodec.decodeLuma(good).isDefined)
    // corrupt IDAT CRC
    val px = gray(4, 4)(_ * 7)
    assert(PngCodec.decodeLuma(buildPng(4, 4, 0, 1, px, corruptCrc = true)).isEmpty)
    // Adam7 interlace: unsupported → None (falls back to header-only meta)
    assert(PngCodec.decodeLuma(buildPng(4, 4, 0, 1, px, interlace = 1)).isEmpty)
    // truncation at every prefix must not throw
    (0 until good.length by 7).foreach { n =>
      assert(PngCodec.decodeLuma(java.util.Arrays.copyOf(good, n)).isEmpty)
    }
    // palette index out of range
    val shortPlte = Array.tabulate(3 * 2)(i => i.toByte)
    val badIdx = Array.fill(4 * 4)(9.toByte)
    assert(PngCodec.decodeLuma(buildPng(4, 4, 3, 1, badIdx, Some(shortPlte))).isEmpty)
    assert(PngCodec.decodeLuma(null).isEmpty)
    assert(PngCodec.decodeLuma(Array.emptyByteArray).isEmpty)
  }

  test("Media dispatch: PNG is a fully-decodable format end-to-end") {
    val w = 12; val h = 5
    val px = gray(w, h)(i => (i * 3 + 1) % 251)
    val png = PngCodec.encodeGray(w, h, px, 3)
    assert(Media.sniffFormat(png) == "png")
    assert(Media.decodeLuma(png).map(_._3.toSeq) == Some(px.toSeq))
    assert(Media.lumaSum(png) == Some(px.map(_ & 0xff).map(_.toLong).sum))
    // dim=1: L1-normalized histogram folds to exactly 1.0 iff real decode ran
    assert(Media.imageFeatures(png, 1).map(_.toSeq) == Some(Seq(1.0f)))
    // resize path goes through the luma transcode to pnm
    val resized = Media.mediaResize(png, 4, 2)
    assert(Media.parsePnm(resized).map { case (c, rw, rh, _) => (c, rw, rh) } == Some((1, 4, 2)))
  }
}
