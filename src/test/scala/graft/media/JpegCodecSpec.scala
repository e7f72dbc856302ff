package graft.media

import org.scalatest.funsuite.AnyFunSuite

/** The from-scratch baseline JPEG codec, validated three ways:
  *  1. structurally (zigzag table, marker layout corners),
  *  2. round-trip through its own encoder (block-constant = bit-exact;
  *     arbitrary content = small bounded IDCT rounding),
  *  3. CROSS-IMPLEMENTATION against the JDK's ImageIO JPEG codec (an
  *     independent libjpeg-derived implementation that ships in every
  *     JVM): our encoder's output decoded by ImageIO, ImageIO's output
  *     decoded by us — the strongest external-validity evidence available
  *     in this container (raster access throughout, no colorspace
  *     transforms).
  */
class JpegCodecSpec extends AnyFunSuite {

  private def constBlocks(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] =
    Array.tabulate(w * h)(i => f((i % w) / 8, (i / w) / 8).toByte)

  test("zigzag table is the spec sequence (permutation walking anti-diagonals)") {
    val z = JpegCodec.Zigzag
    assert(z.sorted.toSeq == (0 until 64))
    // within each anti-diagonal d = row+col: odd d walks row-increasing,
    // even d row-decreasing; diagonals appear in increasing d
    var k = 0
    for (d <- 0 until 15) {
      val cells = (0 until 8).flatMap(r => (0 until 8).map(c => (r, c))).filter(t => t._1 + t._2 == d)
      val expected = if (d % 2 == 1) cells.sortBy(_._1) else cells.sortBy(-_._1)
      expected.foreach { case (r, c) =>
        assert(z(k) == r * 8 + c, s"zigzag[$k] on diagonal $d")
        k += 1
      }
    }
  }

  test("gray round-trip: block-constant images are BIT-EXACT, all shapes + restart") {
    for {
      (w, h) <- Seq((8, 8), (16, 8), (24, 24), (5, 3), (17, 9), (33, 15), (64, 48))
      restart <- Seq(0, 2)
    } {
      val px = constBlocks(w, h)((bx, by) => (37 * bx + 101 * by + w + h) % 256)
      val jpg = JpegCodec.encodeGray(w, h, px, q = 1, restartEvery = restart)
      val Some((dw, dh, luma)) = JpegCodec.decodeLuma(jpg)
      assert((dw, dh) == (w, h), s"dims w=$w h=$h restart=$restart")
      assert(luma.toSeq == px.toSeq, s"pixels w=$w h=$h restart=$restart")
    }
  }

  test("gray round-trip: arbitrary content within IDCT rounding (q=1)") {
    val w = 40; val h = 24
    val px = Array.tabulate(w * h)(i => ((i * 7 + (i / w) * 13) % 256).toByte)
    val Some((dw, dh, luma)) = JpegCodec.decodeLuma(JpegCodec.encodeGray(w, h, px))
    assert((dw, dh) == (w, h))
    val maxErr = luma.toSeq.zip(px.toSeq).map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.max
    assert(maxErr <= 2, s"max per-pixel error $maxErr (expected FDCT/IDCT rounding only)")
  }

  test("color: 4:4:4, 4:2:2, 4:2:0 — Y plane bit-exact for block-constant images") {
    for ((sh, sv) <- Seq((1, 1), (2, 1), (2, 2))) {
      val w = 35; val h = 19 // partial MCUs in both axes
      // Y constant per PADDED MCU-sized Y region so subsampled encodes stay exact:
      // constant per 16x16 covers every (sh, sv) up to 2x2
      val y = Array.tabulate(w * h)(i => ((((i % w) / 16) * 31 + ((i / w) / 16) * 57 + 40) % 256).toByte)
      val cw = (w + sh - 1) / sh
      val ch = (h + sv - 1) / sv
      val cb = Array.fill((cw * ch))(110.toByte)
      val cr = Array.fill((cw * ch))(140.toByte)
      val jpg = JpegCodec.encodeYcc(w, h, Array(y, cb, cr), sh, sv)
      val Some((dw, dh, luma)) = JpegCodec.decodeLuma(jpg)
      assert((dw, dh) == (w, h), s"sampling $sh x $sv")
      assert(luma.toSeq == y.toSeq, s"Y plane sampling $sh x $sv")
    }
  }

  // ---- ImageIO cross-implementation oracle ----

  private def imageIoWriteGray(
      w: Int, h: Int, px: Array[Byte], quality: Float, progressive: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, px)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    if (progressive) p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); writer.dispose()
    baos.toByteArray
  }

  private def imageIoReadGray(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not read the blob")
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Byte](w * h)
    val r = img.getRaster
    var i = 0
    while (i < w * h) { out(i) = r.getSample(i % w, i / w, 0).toByte; i += 1 }
    (w, h, out)
  }

  test("OUR encoder's jpegs decode EXACTLY in the JDK's independent codec (block-constant)") {
    for ((w, h) <- Seq((16, 16), (17, 9), (40, 24))) {
      val px = constBlocks(w, h)((bx, by) => (23 * bx + 71 * by + 64) % 200 + 28)
      val jpg = JpegCodec.encodeGray(w, h, px, q = 1)
      val (dw, dh, jdk) = imageIoReadGray(jpg)
      assert((dw, dh) == (w, h))
      assert(jdk.toSeq == px.toSeq, s"JDK decode of our jpeg w=$w h=$h")
    }
  }

  test("the JDK encoder's jpegs decode EXACTLY in OUR decoder (block-constant, q=1.0)") {
    for ((w, h) <- Seq((16, 16), (24, 8), (33, 17))) {
      val px = constBlocks(w, h)((bx, by) => (91 * bx + 13 * by + 50) % 180 + 38)
      val jpg = imageIoWriteGray(w, h, px, quality = 1.0f)
      val Some((dw, dh, luma)) = JpegCodec.decodeLuma(jpg)
      assert((dw, dh) == (w, h))
      assert(luma.toSeq == px.toSeq, s"our decode of JDK jpeg w=$w h=$h")
    }
  }

  test("our decoder matches the JDK decoder on the SAME lossy jpeg within rounding") {
    val w = 48; val h = 32
    val px = Array.tabulate(w * h)(i => (((i % w) * 3 + (i / w) * 5) % 128 + 64).toByte)
    for (quality <- Seq(1.0f, 0.75f)) {
      val jpg = imageIoWriteGray(w, h, px, quality)
      val Some((dw, dh, mine)) = JpegCodec.decodeLuma(jpg)
      val (jw, jh, jdk) = imageIoReadGray(jpg)
      assert((dw, dh) == (jw, jh))
      val maxDiff = mine.toSeq.zip(jdk.toSeq)
        .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.max
      assert(maxDiff <= 2,
        s"IDCT-implementation divergence $maxDiff at quality $quality (expected <= 2)")
    }
  }

  test("progressive jpegs are out of scope: loud None, never wrong pixels") {
    val px = Array.fill(16 * 16)(99.toByte)
    val jpg = imageIoWriteGray(16, 16, px, quality = 0.9f, progressive = true)
    // the JDK itself must still read it (sanity that it IS a progressive jpeg)
    assert(imageIoReadGray(jpg)._3.length == 256)
    assert(JpegCodec.decodeLuma(jpg).isEmpty)
  }

  test("malformed/truncated inputs: None or exact, never a throw") {
    val pxGood = constBlocks(24, 16)((a, b) => 60 + a + b)
    val good = JpegCodec.encodeGray(24, 16, pxGood)
    for (cut <- Seq(0, 1, 2, 3, 4, 10, good.length / 2)) {
      val r = JpegCodec.decodeLuma(java.util.Arrays.copyOf(good, cut))
      assert(r.isEmpty, s"truncated at $cut must not decode")
    }
    // cutting ONLY the EOI marker leaves every MCU intact: exact pixels are
    // acceptable there (the contract is None or exact, never wrong/throw)
    JpegCodec.decodeLuma(java.util.Arrays.copyOf(good, good.length - 1)).foreach {
      case (_, _, luma) => assert(luma.toSeq == pxGood.toSeq)
    }
    // corrupt one byte at a time through the header region: no throws
    for (i <- 2 until math.min(good.length, 120)) {
      val bad = good.clone()
      bad(i) = (bad(i) ^ 0x5a).toByte
      JpegCodec.decodeLuma(bad) // must not throw; value is free to be None or pixels
    }
    assert(JpegCodec.decodeLuma(null).isEmpty)
    assert(JpegCodec.decodeLuma(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty)
  }
}
