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
  * No image/audio codecs ship in this container, so the *decode internals*
  * are deterministic fakes, clearly marked `Stub` below: format sniffing is
  * real (public magic numbers); widths/heights/frame-counts/features are
  * pure functions of the bytes via xxhash. The Spark-side plumbing — column
  * types, batch iteration, partitioning, output schemas — is real and
  * tested; swapping a real codec into [[decodeStub]]/[[featureStub]] changes
  * nothing else.
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
    else if (bytes(4) == 'f' && bytes(5) == 't' && bytes(6) == 'y' && bytes(7) == 'p') "mp4"
    else if (bytes(0) == '<' || (bytes(0) == 0xef.toByte && bytes(1) == 0xbb.toByte)) "html"
    else "bin"
  }

  /** STUB decode: real format sniff; dimensions/frames/rate are
    * deterministic fakes derived from the content hash. Replace the fake
    * section with a real codec call when one is available. */
  def decodeStub(bytes: Array[Byte]): MediaMeta = {
    if (bytes == null) return MediaMeta("null", 0, 0, 0, 0, 0L)
    val format = sniffFormat(bytes)
    val h = XxHash64.hash(bytes, 7L)
    // --- deterministic fake (no codec in container) ---
    val width = 64 + math.floorMod(h, 1920L).toInt
    val height = 64 + math.floorMod(h >>> 17, 1080L).toInt
    val frames = if (format == "mp4" || format == "gif") 1 + math.floorMod(h >>> 31, 240L).toInt else 1
    val rate = if (format == "wav" || format == "mp4") 16000 else 0
    MediaMeta(format, width, height, frames, rate, bytes.length.toLong)
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
    * proportional to w×h (stands in for a real scaler; plumbing real). */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val target = math.max(16, (w * h) / 64)
    Array.tabulate(target)(i => bytes(i % math.max(1, bytes.length)))
  }

  /** Frame sampling: n deterministic, evenly-spaced byte-range slices (the
    * real version would decode frames; the slicing/batching is the point). */
  def frameSample(bytes: Array[Byte], n: Int): Array[Array[Byte]] = {
    if (bytes == null || bytes.isEmpty || n <= 0) return Array.empty
    val span = math.max(1, bytes.length / n)
    Array.tabulate(math.min(n, bytes.length)) { i =>
      val start = i * span
      java.util.Arrays.copyOfRange(bytes, start, math.min(bytes.length, start + span))
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
      batch.map(row => Row.fromSeq(row.toSeq :+ featureStub(row.getAs[Array[Byte]](blobIdx), dim).toSeq))
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
