package graft.media

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The from-scratch GIF LZW codec: encoder→decoder round-trips must be
  * bit-exact across raster shapes that exercise every LZW regime —
  * high-entropy (fast dictionary growth, table-full CLEAR), constant runs
  * (immediate KwKwK), gradients (the q38 fixture shape), plus interlace
  * reordering and malformed-input totality. */
class GifCodecSpec extends AnyFunSuite {

  private def raster(w: Int, h: Int)(f: Int => Int): Array[Byte] =
    Array.tabulate(w * h)(i => f(i).toByte)

  private def roundTrip(w: Int, h: Int, pixels: Array[Byte]): Unit = {
    val gif = GifCodec.encodeGray(w, h, pixels)
    val decoded = GifCodec.decodeFirstFrame(gif)
    assert(decoded.isDefined, s"decode failed for ${w}x$h")
    val (dw, dh, luma) = decoded.get
    assert(dw == w && dh == h)
    // identity grayscale palette: luma == stored index == original pixel
    assert(java.util.Arrays.equals(luma, pixels), s"raster mismatch for ${w}x$h")
  }

  test("round-trip: gradients, runs, KwKwK-heavy, and tiny rasters") {
    roundTrip(1, 1, raster(1, 1)(_ => 7))
    roundTrip(4, 2, raster(4, 2)(i => i * 31))
    roundTrip(33, 9, raster(33, 9)(i => (i + 100) % 251)) // the q38 shape
    roundTrip(16, 16, raster(16, 16)(_ => 0))             // constant: KwKwK chains
    roundTrip(50, 3, raster(50, 3)(i => if (i % 7 < 4) 9 else 200)) // short runs
  }

  test("round-trip: high-entropy rasters large enough to fill the table and CLEAR") {
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val w = 120 + seed
      val h = 90 + seed
      val px = new Array[Byte](w * h)
      rnd.nextBytes(px) // ~10k random pixels: dictionary passes 4096, encoder CLEARs
      roundTrip(w, h, px)
    }
  }

  test("round-trip survives every code-width boundary (512/1024/2048/4096)") {
    // pairwise-distinct 2-grams grow the dictionary by ~1 entry per pixel
    val w = 80; val h = 60
    val px = raster(w, h)(i => (i * 37 + (i / 256)) % 256)
    roundTrip(w, h, px)
  }

  test("interlaced frames come back in natural row order") {
    val w = 8; val h = 10
    val natural = raster(w, h)(i => i % 256)
    // interlace pass order for h=10: rows 0,8 | 4 | 2,6 | 1,3,5,7,9
    val passOrder = Seq(0, 8, 4, 2, 6, 1, 3, 5, 7, 9)
    val permuted = new Array[Byte](w * h)
    passOrder.zipWithIndex.foreach { case (row, src) =>
      System.arraycopy(natural, row * w, permuted, src * w, w)
    }
    val gif = GifCodec.encodeGray(w, h, permuted)
    // set the interlace flag in the image descriptor's packed byte
    // (offset: 6 header + 7 LSD + 768 GCT + 9 into the descriptor)
    gif(6 + 7 + 768 + 9) = (gif(6 + 7 + 768 + 9) | 0x40).toByte
    val (dw, dh, luma) = GifCodec.decodeFirstFrame(gif).get
    assert(dw == w && dh == h)
    assert(java.util.Arrays.equals(luma, natural))
  }

  test("malformed and truncated inputs return None, never throw") {
    val good = GifCodec.encodeGray(20, 10, raster(20, 10)(i => i % 256))
    assert(GifCodec.decodeFirstFrame(null).isEmpty)
    assert(GifCodec.decodeFirstFrame(Array.emptyByteArray).isEmpty)
    assert(GifCodec.decodeFirstFrame("GIF89a".getBytes("ASCII")).isEmpty)
    (1 until good.length by 37).foreach { cut =>
      GifCodec.decodeFirstFrame(java.util.Arrays.copyOfRange(good, 0, cut)) // must not throw
    }
    // bit-flip sweep over the LZW stream region: totality, not correctness
    (781 until good.length by 11).foreach { i =>
      val bad = good.clone()
      bad(i) = (bad(i) ^ 0x5a).toByte
      GifCodec.decodeFirstFrame(bad) // must not throw
    }
  }

  test("Media pipeline treats GIF as fully decodable: luma, sum, features, resize") {
    val w = 12; val h = 5
    val px = raster(w, h)(i => (i * 11) % 256)
    val gif = GifCodec.encodeGray(w, h, px)
    assert(Media.sniffFormat(gif) == "gif")
    val (dw, dh, luma) = Media.decodeLuma(gif).get
    assert((dw, dh) == (w, h) && java.util.Arrays.equals(luma, px))
    assert(Media.lumaSum(gif).get == px.map(_ & 0xff).map(_.toLong).sum)
    // real histogram features (not the hash stub): dim=1 folds to exactly 1.0
    assert(math.abs(Media.imageFeatures(gif, 1).get.head - 1.0f) < 1e-6)
    // resize: GIF -> luma P5 -> box filter; result is a real parseable pnm
    val resized = Media.mediaResize(gif, 3, 2)
    val (ch, rw, rh, off) = Media.parsePnm(resized).get
    assert(ch == 1 && rw == 3 && rh == 2)
    // 1x1 resize = global average
    val one = Media.mediaResize(gif, 1, 1)
    val (_, _, _, o1) = Media.parsePnm(one).get
    assert((one(o1) & 0xff) == px.map(_ & 0xff).sum / (w * h))
    assert(off > 0)
  }

  test("lumaSums stage: exact pixel sums for gif/pnm, -1 for undecodable") {
    val spark = TestSpark.spark
    import spark.implicits._
    val gif = GifCodec.encodeGray(6, 4, raster(6, 4)(i => i))
    val pnm = "P5\n3 2\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3, 4, 5, 6)
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 0, 0, 0, 13)
    val df = Seq((1L, gif), (2L, pnm), (3L, png)).toDF("media_id", "blob")
    val got = Media.lumaSums(df).select("media_id", "luma_sum")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == (0 until 24).sum)
    assert(got(2L) == 21L)
    assert(got(3L) == -1L)
  }
}
