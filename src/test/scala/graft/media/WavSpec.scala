package graft.media

import org.scalatest.funsuite.AnyFunSuite

/** Real WAV PCM decode: [[Media.wavPcmStats]] against directly-computed
  * sample moments, chunk-walk corners, and malformed inputs. */
class WavSpec extends AnyFunSuite {

  private def statsOf(samples: Seq[Int]): Media.PcmStats =
    Media.PcmStats(
      samples.length.toLong,
      samples.map(_.toLong).sum,
      samples.map(s => s.toLong * s).sum,
      if (samples.isEmpty) 0L else samples.map(s => math.abs(s.toLong)).max)

  test("pcm16 round-trip: exact count/sum/sumsq/peak, including extremes") {
    val cases = Seq(
      Seq(0, 1, -1, 1023, -1024),
      Seq(32767, -32768, 0, 12345, -12345), // full 16-bit range
      Seq.tabulate(997)(i => ((i * 131) % 2048) - 1024),
      Seq(5),
      Seq.empty[Int])
    cases.foreach { samples =>
      val wav = Media.wavEncodePcm16(8000, samples.toArray)
      assert(Media.sniffFormat(wav) == "wav")
      assert(Media.wavPcmStats(wav) == Some(statsOf(samples)), s"n=${samples.length}")
    }
  }

  // hand-build a WAV with arbitrary chunks for walk corners
  private def riff(chunks: (String, Array[Byte])*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Array[Byte] =
      Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    val body = new java.io.ByteArrayOutputStream()
    body.write("WAVE".getBytes("US-ASCII"))
    chunks.foreach { case (id, data) =>
      body.write(id.getBytes("US-ASCII"))
      body.write(w32(data.length))
      body.write(data)
      if (data.length % 2 == 1) body.write(0) // word alignment pad
    }
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(w32(body.size()))
    out.write(body.toByteArray)
    out.toByteArray
  }

  private def fmtChunk(audioFormat: Int, bits: Int): Array[Byte] = {
    val f = new Array[Byte](16)
    f(0) = audioFormat.toByte; f(1) = (audioFormat >>> 8).toByte
    f(2) = 1 // mono
    f(4) = 0x40; f(5) = 0x1f // 8000 Hz
    f(14) = bits.toByte
    f
  }

  test("8-bit PCM is unsigned-centered; LIST chunks and odd sizes are walked over") {
    val samples8 = Array[Int](0, 255, 128, 7, 200) // raw unsigned bytes
    val data = samples8.map(_.toByte)
    val wav = riff(
      "fmt " -> fmtChunk(1, 8),
      "LIST" -> Array[Byte](1, 2, 3), // odd-size ancillary chunk before data
      "data" -> data)
    val expected = statsOf(samples8.map(_ - 128).toSeq)
    assert(Media.wavPcmStats(wav) == Some(expected))
  }

  test("non-PCM, truncated, and data-before-fmt inputs return None") {
    // IEEE-float format tag (3): not PCM → None
    assert(Media.wavPcmStats(riff(
      "fmt " -> fmtChunk(3, 16), "data" -> new Array[Byte](8))).isEmpty)
    // data chunk before any fmt chunk → None
    assert(Media.wavPcmStats(riff("data" -> new Array[Byte](8))).isEmpty)
    // declared data size past the blob end → None
    val good = Media.wavEncodePcm16(8000, Array(1, 2, 3, 4))
    (12 until good.length by 3).foreach { n =>
      assert(Media.wavPcmStats(java.util.Arrays.copyOf(good, n)).isEmpty, s"prefix $n")
    }
    assert(Media.wavPcmStats(null).isEmpty)
    assert(Media.wavPcmStats("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
  }

  test("header metadata agrees with the chunk-walk decode for encoded wavs") {
    val wav = Media.wavEncodePcm16(44100, Array.tabulate(32)(i => i * 100 - 1600))
    val meta = Media.decodeStub(wav)
    assert(meta.format == "wav")
    assert(meta.sample_rate == 44100)
  }
}
