package graft.media

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MediaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 0, 0, 0, 13) ++
    Array.tabulate[Byte](500)(i => (i * 7).toByte)
  private val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte) ++
    Array.tabulate[Byte](300)(i => (i * 3).toByte)
  private val wav = "RIFF1234WAVE".getBytes("ASCII") ++ Array.tabulate[Byte](1000)(_.toByte)
  private val mp4 = Array[Byte](0, 0, 0, 24) ++ "ftypisom".getBytes("ASCII") ++
    Array.tabulate[Byte](2000)(i => (i * 11).toByte)

  private lazy val mediaDf = Seq(
    (1L, png, "image"), (2L, jpeg, "image"), (3L, wav, "audio"), (4L, mp4, "video")
  ).toDF("media_id", "blob", "media_type")

  test("format sniffing uses real magic numbers") {
    assert(Media.sniffFormat(png) == "png")
    assert(Media.sniffFormat(jpeg) == "jpeg")
    assert(Media.sniffFormat(wav) == "wav")
    assert(Media.sniffFormat(mp4) == "mp4")
  }

  test("golden headers: PNG IHDR / GIF screen+frames / JPEG SOF0 / WAV rate parse for real") {
    // PNG: signature + IHDR chunk, width=640 height=480 (big-endian u32)
    val goldenPng = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 2, 0x80.toByte, // 640
      0, 0, 1, 0xe0.toByte, // 480
      8, 6, 0, 0, 0)
    assert(Media.decodeStub(goldenPng) == Media.MediaMeta("png", 640, 480, 1, 0, goldenPng.length.toLong))

    // GIF89a: 320x200 logical screen, no GCT, two image descriptors
    def gifFrame: Array[Byte] =
      Array[Byte](0x2c, 0, 0, 0, 0, 0x40, 1, 0xc8.toByte, 0, 0x00, // descriptor, no LCT
        2, // LZW min code size
        1, 0x44, // one 1-byte sub-block
        0) // sub-block terminator
    val goldenGif = "GIF89a".getBytes("ASCII") ++
      Array[Byte](0x40, 1, 0xc8.toByte, 0, 0x00, 0, 0) ++ // 320x200, no GCT
      gifFrame ++ gifFrame ++ Array[Byte](0x3b)
    assert(Media.decodeStub(goldenGif) == Media.MediaMeta("gif", 320, 200, 2, 0, goldenGif.length.toLong))

    // JPEG: SOI + SOF0 with height=600 width=800
    val goldenJpeg = Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xc0.toByte, 0, 11, 8,
      2, 0x58, // height 600
      3, 0x20, // width 800
      1, 1, 0x11, 0) ++ Array.fill[Byte](8)(0)
    assert(Media.decodeStub(goldenJpeg) == Media.MediaMeta("jpeg", 800, 600, 1, 0, goldenJpeg.length.toLong))

    // JPEG with a leading APP0 segment before the SOF (marker scan must skip it)
    val app0 = Array[Byte](0xff.toByte, 0xe0.toByte, 0, 4, 0x4a, 0x46)
    val goldenJpeg2 = goldenJpeg.take(2) ++ app0 ++ goldenJpeg.drop(2)
    assert(Media.decodeStub(goldenJpeg2).width == 800)
    assert(Media.decodeStub(goldenJpeg2).height == 600)

    // WAV: RIFF/WAVE with fmt chunk, sample rate 44100 little-endian at 24
    val goldenWav = "RIFF".getBytes("ASCII") ++ Array[Byte](36, 0, 0, 0) ++
      "WAVEfmt ".getBytes("ASCII") ++ Array[Byte](16, 0, 0, 0, 1, 0, 2, 0,
        0x44, 0xac.toByte, 0, 0) ++ Array.fill[Byte](8)(0)
    assert(Media.decodeStub(goldenWav) == Media.MediaMeta("wav", 0, 0, 1, 44100, goldenWav.length.toLong))

    // truncated header never throws — falls back to the marked stub
    assert(Media.decodeStub(goldenPng.take(14)).format == "png")
  }

  test("JPEG marker scan: SOS stops the scan, fill bytes resync, TEM is standalone") {
    def be16(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)
    val sof0 = Array[Byte](0xff.toByte, 0xc0.toByte, 0, 11, 8) ++
      be16(600) ++ be16(800) ++ Array[Byte](1, 1, 0x11, 0)
    // fill bytes + TEM (0x01, no length word) before the SOF must be skipped
    val padded = Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xff.toByte, // fill byte run
      0xff.toByte, 0x01.toByte) ++ sof0 // TEM standalone
    val m = Media.decodeStub(padded ++ Array.fill[Byte](8)(0))
    assert(m.width == 800 && m.height == 600, m)
    // entropy-coded data after SOS containing FF Cn must NOT be parsed as a
    // SOF: scan stops at SOS and the bytes fall back to the stub dimensions
    val sos = Array[Byte](0xff.toByte, 0xda.toByte, 0, 4, 1, 0)
    val fakeSofInData = Array[Byte](0xff.toByte, 0xc1.toByte, 0x7f, 0x7f, 0x7f, 0x7f, 0x7f, 0x7f, 0x7f, 0x7f)
    val noSof = Array[Byte](0xff.toByte, 0xd8.toByte) ++ sos ++ fakeSofInData
    val stubbed = Media.decodeStub(noSof)
    // header parse returned None -> deterministic stub path (width >= 64 base)
    assert(stubbed.format == "jpeg" && (stubbed.width != 0x7f7f || stubbed.height != 0x7f7f))
  }

  test("golden mp4: ISO-BMFF box walk parses tkhd/stsz/mdhd for real") {
    def be32(v: Int) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8) ++ typ.getBytes("ASCII") ++ payload
    def tkhd(w: Int, h: Int) = box("tkhd",
      be32(0) ++ Array.fill[Byte](72)(0) ++ be32(w << 16) ++ be32(h << 16))
    def mdhd(timescale: Int) = box("mdhd",
      be32(0) ++ be32(0) ++ be32(0) ++ be32(timescale) ++ be32(0) ++ be32(0))
    def hdlr(kind: String) = box("hdlr", be32(0) ++ be32(0) ++ kind.getBytes("ASCII"))
    val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(300))
    val videoTrak = box("trak", tkhd(1280, 720) ++
      box("mdia", mdhd(90000) ++ hdlr("vide") ++ box("minf", box("stbl", stsz))))
    val audioTrak = box("trak", tkhd(0, 0) ++ box("mdia", mdhd(48000) ++ hdlr("soun")))
    val golden = box("ftyp", "isomiso2".getBytes("ASCII")) ++ box("moov", videoTrak ++ audioTrak)
    assert(Media.sniffFormat(golden) == "mp4")
    assert(Media.decodeStub(golden) ==
      Media.MediaMeta("mp4", 1280, 720, 300, 48000, golden.length.toLong))
    // 64-bit largesize variant of the moov box parses identically
    val moov = box("moov", videoTrak ++ audioTrak)
    val largeMoov = be32(1) ++ "moov".getBytes("ASCII") ++
      be32(0) ++ be32(moov.length + 8) ++ moov.drop(8)
    val golden64 = box("ftyp", "isomiso2".getBytes("ASCII")) ++ largeMoov
    assert(Media.decodeStub(golden64).width == 1280)
    assert(Media.decodeStub(golden64).n_frames == 300)
    // truncated box walk never throws — ftyp-only falls back to the stub
    val noMoov = box("ftyp", "isomiso2".getBytes("ASCII")) ++ Array.fill[Byte](64)(9)
    assert(Media.decodeStub(noMoov).format == "mp4")
  }

  test("decodeMeta: batched partition map emits typed meta struct") {
    val out = Media.decodeMeta(mediaDf, batchSize = 2)
    assert(out.schema.fieldNames.toSeq ==
      Seq("media_id", "blob", "media_type", "meta"))
    val byId = out.select($"media_id", $"meta.format", $"meta.n_bytes").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(byId(1L) == ("png", png.length.toLong))
    assert(byId(3L) == ("wav", wav.length.toLong))
    // deterministic: second run identical
    val again = Media.decodeMeta(mediaDf, batchSize = 1)
      .select($"media_id", $"meta.width").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val first = out.select($"media_id", $"meta.width").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(first == again)
  }

  test("extractFeatures: unit-norm embeddings, stable across batch sizes") {
    val a = Media.extractFeatures(mediaDf, dim = 16, batchSize = 1)
      .select($"media_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = Media.extractFeatures(mediaDf, dim = 16, batchSize = 64)
      .select($"media_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a == b) // batch shape must not affect values
    a.values.foreach { v =>
      assert(v.length == 16)
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-3, s"norm=$norm")
    }
  }

  test("sampleFrames: n evenly-spaced slices covering the payload") {
    val out = Media.sampleFrames(mediaDf.where($"media_id" === 4), n = 4)
      .select($"frames").as[Seq[Array[Byte]]].head()
    assert(out.length == 4)
    assert(out.map(_.length).sum <= mp4.length)
    assert(out.head.toSeq == mp4.take(mp4.length / 4).toSeq)
  }

  test("netpbm: REAL pixel decode, luminance features, and box-filter resize") {
    // 4x2 P6 with known pixels: top row black->white ramp, bottom row solid red
    val header = "P6\n# comment\n4 2\n255\n".getBytes("US-ASCII")
    val pixels = Array[Int](
      0, 0, 0,   85, 85, 85,   170, 170, 170,   255, 255, 255,
      255, 0, 0, 255, 0, 0,    255, 0, 0,       255, 0, 0).map(_.toByte)
    val ppm = header ++ pixels
    assert(Media.sniffFormat(ppm) == "pnm")
    assert(Media.parsePnm(ppm).contains((3, 4, 2, header.length)))
    assert(Media.decodeStub(ppm) == Media.MediaMeta("pnm", 4, 2, 1, 0, ppm.length.toLong))

    // luminance histogram: grays at their value; red = BT.601 luma 76
    val hist = Media.pnmLumaHistogram(ppm).get
    assert(hist(0) == 1L && hist(85) == 1L && hist(170) == 1L && hist(255) == 1L)
    assert(hist(299 * 255 / 1000) == 4L)
    assert(hist.sum == 8L)

    // features are the REAL histogram (folded + unit-norm), not the stub
    val feats = Media.mediaFeatures(ppm, 16)
    assert(!feats.sameElements(Media.featureStub(ppm, 16)))
    assert(math.abs(math.sqrt(feats.map(x => x.toDouble * x).sum) - 1.0) < 1e-3)
    // bin 255 % 16 = 15 collects the white pixel; 76 % 16 = 12 the red ones
    assert(feats(12) > feats(15))

    // box-filter downscale 4x2 -> 2x1: each output averages a 2x2 box
    val resized = Media.pnmResize(ppm, 2, 1).get
    val (c2, w2, h2, off2) = Media.parsePnm(resized).get
    assert((c2, w2, h2) == (3, 2, 1))
    def px(i: Int): Int = resized(off2 + i) & 0xff
    // left box: (0,0,0)+(85,85,85)+(255,0,0)+(255,0,0) -> (148, 21, 21)
    assert((px(0), px(1), px(2)) == (148, 21, 21))
    // right box: (170..)+(255..)+red+red -> (233, 106, 106)
    assert((px(3), px(4), px(5)) == (233, 106, 106))

    // P5 grayscale path + upsample refusal + stub fallback for codecs
    val pgm = "P5\n2 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](10, 20)
    assert(Media.parsePnm(pgm).isDefined)
    assert(Media.pnmLumaHistogram(pgm).get(10) == 1L)
    assert(Media.pnmResize(pgm, 4, 1).isEmpty)
    assert(Media.mediaResize(png, 2, 2).sameElements(Media.resizeStub(png, 2, 2)))
    // truncated raster is rejected, never a partial decode
    assert(Media.parsePnm(ppm.dropRight(1)).isEmpty)
  }

  test("media features flow into the similarity operators (end-to-end)") {
    val emb = Media.extractFeatures(mediaDf, dim = 32)
      .select($"media_id".as("vec_id"), $"embedding")
    val nn = graft.ml.Similarity.bruteForceTopK(emb, emb.where($"vec_id" === 1), k = 2)
    assert(nn.count() == 2)
  }
}
