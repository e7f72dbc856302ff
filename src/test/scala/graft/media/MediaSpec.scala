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

  test("media features flow into the similarity operators (end-to-end)") {
    val emb = Media.extractFeatures(mediaDf, dim = 32)
      .select($"media_id".as("vec_id"), $"embedding")
    val nn = graft.ml.Similarity.bruteForceTopK(emb, emb.where($"vec_id" === 1), k = 2)
    assert(nn.count() == 2)
  }
}
