package graft.media

import org.scalatest.funsuite.AnyFunSuite

/** [[Mp4Codec]] — MJPEG-in-MP4 sample tables + frame pixel decode.
  * Frames are block-constant gray JPEGs at q=1 (DC-only ⇒ BIT-exact
  * through [[JpegCodec]], the q41 contract), so every pixel assertion is
  * equality, not tolerance.
  */
class Mp4CodecSpec extends AnyFunSuite {

  /** block-constant w×h gray frame: value = (base + 17·(y/8) + 29·(x/8)) % 251 */
  private def framePixels(w: Int, h: Int, base: Int): Array[Byte] =
    Array.tabulate(w * h)(i => ((base + 17 * ((i / w) / 8) + 29 * ((i % w) / 8)) % 251).toByte)

  private def mkMp4(
      w: Int, h: Int, nFrames: Int,
      chunkSize: Int = 1, uniformStsz: Boolean = false, codec: String = "jpeg"): Array[Byte] = {
    val frames = (0 until nFrames).map(f =>
      JpegCodec.encodeGray(w, h, framePixels(w, h, 40 + f), q = 1))
    Mp4Codec.encodeMjpeg(frames, w, h, chunkSize, uniformStsz, codec)
  }

  test("round-trip: every frame decodes to the exact source pixels") {
    for ((w, h, n, cs) <- Seq((16, 16, 1, 1), (24, 16, 4, 1), (16, 8, 5, 2), (32, 24, 6, 3))) {
      val mp4 = mkMp4(w, h, n, chunkSize = cs)
      val track = Mp4Codec.parseVideoTrack(mp4).getOrElse(fail(s"no track ($w,$h,$n,$cs)"))
      assert(track.codec == "jpeg" && track.width == w && track.height == h)
      assert(track.sizes.length == n)
      for (f <- 0 until n) {
        val (dw, dh, luma) = Mp4Codec.decodeFrameLuma(mp4, f)
          .getOrElse(fail(s"frame $f undecodable"))
        assert(dw == w && dh == h)
        assert(luma.sameElements(framePixels(w, h, 40 + f)), s"frame $f pixels")
      }
    }
  }

  test("multi-sample chunks (stsc runs) and the final short chunk map correctly") {
    // 7 frames, 3 per chunk -> chunks of 3,3,1: two stsc runs
    val mp4 = mkMp4(16, 16, 7, chunkSize = 3)
    val t = Mp4Codec.parseVideoTrack(mp4).get
    assert(t.sizes.length == 7)
    // offsets strictly increase and frames are contiguous within chunks
    assert(t.offsets.zip(t.sizes).sliding(2).forall {
      case Array((o1, s1), (o2, _)) => o2 >= o1 + s1
      case _ => true
    })
    val totals = (0 until 7).map(f => Mp4Codec.decodeFrameLuma(mp4, f).get._3.head)
    assert(totals == (0 until 7).map(f => framePixels(16, 16, 40 + f).head))
  }

  test("uniform stsz fast path decodes identically to the per-sample table") {
    // equal-size frames: same content -> same jpeg length
    val frames = (0 until 3).map(_ => JpegCodec.encodeGray(16, 16, framePixels(16, 16, 50), q = 1))
    val a = Mp4Codec.encodeMjpeg(frames, 16, 16, chunkSize = 1, uniformStsz = true)
    val b = Mp4Codec.encodeMjpeg(frames, 16, 16, chunkSize = 1, uniformStsz = false)
    for (f <- 0 until 3)
      assert(Mp4Codec.decodeFrameLuma(a, f).get._3
        .sameElements(Mp4Codec.decodeFrameLuma(b, f).get._3))
  }

  test("videoLumaTotal == arithmetic sum over all frames") {
    val (w, h, n) = (20, 12, 4)
    val mp4 = mkMp4(w, h, n, chunkSize = 2)
    val want = (0 until n).flatMap(f => framePixels(w, h, 40 + f)).map(_ & 0xff).map(_.toLong).sum
    assert(Mp4Codec.videoLumaTotal(mp4).contains((n, want)))
  }

  test("sampleFrames returns evenly-spaced complete standalone JPEGs") {
    val mp4 = mkMp4(16, 16, 8, chunkSize = 2)
    val sampled = Mp4Codec.sampleFrames(mp4, 4).get
    assert(sampled.length == 4)
    // indices 0,2,4,6 of the track; each blob is itself a decodable jpeg
    sampled.zipWithIndex.foreach { case (blob, k) =>
      val (dw, dh, luma) = JpegCodec.decodeLuma(blob).getOrElse(fail(s"sample $k not a jpeg"))
      assert(dw == 16 && dh == 16)
      assert(luma.sameElements(framePixels(16, 16, 40 + 2 * k)), s"sample $k")
    }
    // n > frame count clamps to every frame
    assert(Mp4Codec.sampleFrames(mp4, 99).get.length == 8)
  }

  test("Media dispatch: decodeLuma/lumaSum/frameSample route mp4 through the codec") {
    val mp4 = mkMp4(16, 16, 3, chunkSize = 1)
    val first = framePixels(16, 16, 40)
    assert(Media.decodeLuma(mp4).get._3.sameElements(first))
    assert(Media.lumaSum(mp4).contains(first.map(_ & 0xff).map(_.toLong).sum))
    val frames = Media.frameSample(mp4, 3)
    assert(frames.length == 3)
    assert(JpegCodec.decodeLuma(frames(2)).get._3.sameElements(framePixels(16, 16, 42)))
    // header metadata path still real: w/h/frame-count from the box walk
    val meta = Media.decodeStub(mp4)
    assert(meta.format == "mp4" && meta.width == 16 && meta.height == 16 && meta.n_frames == 3)
  }

  test("non-MJPEG codec: sample table parses, pixels refuse (loud None, never wrong)") {
    val mp4 = mkMp4(16, 16, 2, codec = "avc1")
    val t = Mp4Codec.parseVideoTrack(mp4).get
    assert(t.codec == "avc1" && t.sizes.length == 2)
    assert(Mp4Codec.decodeFrameLuma(mp4, 0).isEmpty)
    assert(Mp4Codec.videoLumaTotal(mp4).isEmpty)
    assert(Mp4Codec.sampleFrames(mp4, 2).isEmpty)
    // frameSample falls back to the byte-slice stub (still total)
    assert(Media.frameSample(mp4, 2).nonEmpty)
  }

  test("totality: truncation at every prefix length is None or exact, never a throw") {
    val mp4 = mkMp4(16, 16, 3, chunkSize = 2)
    val full = Mp4Codec.videoLumaTotal(mp4)
    for (len <- 0 until mp4.length by 7) {
      val cut = java.util.Arrays.copyOfRange(mp4, 0, len)
      val r = Mp4Codec.videoLumaTotal(cut) // must not throw
      assert(r.isEmpty || r == full)
    }
    // corrupting a size field must not throw either
    val bad = mp4.clone(); bad(0) = 0x7f.toByte
    Mp4Codec.parseVideoTrack(bad)
  }
}
