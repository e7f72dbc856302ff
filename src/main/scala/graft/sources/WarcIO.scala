package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.types._

/** WARC (ISO 28500, the Web ARChive format) reader/writer — the
  * interchange format between crawlers and training-data pipelines:
  * production crawls persist fetches as WARC, and webtext recipes ingest
  * CommonCrawl WARC archives. This engine speaks it in both directions:
  * [[parseAll]]/[[explodeRecords]] ingest archives into the pages-shaped
  * table, [[write]]/[[exportArchives]] export the crawl as archives.
  *
  * Format (public spec): each record is
  * {{{
  * WARC/1.0\r\n
  * <Name>: <value>\r\n ...          (named headers, order-free)
  * \r\n
  * <Content-Length bytes of payload>
  * \r\n\r\n                         (record boundary)
  * }}}
  * Framing is by `Content-Length` ONLY — a payload may itself contain
  * `WARC/1.0` lines (an archived page ABOUT warc files must not split the
  * record; spec-mandated, and the classic scan-for-delimiter bug).
  * `response` records carry an HTTP envelope; [[httpResponse]] splits
  * status line / headers / body at the first blank line.
  *
  * Gzip: real archives are gzip with ONE MEMBER PER RECORD (so readers
  * can seek); JDK `GZIPInputStream` transparently concatenates members,
  * so [[parseAllGzip]] handles both member-per-record and whole-stream
  * compression.
  *
  * Totality: malformed framing → None (never a throw, never a
  * silently-truncated record list — a partial archive is a wrong answer).
  *
  * 100 TB shape: archives are embarrassingly parallel units — one task
  * per archive blob ([[explodeRecords]] is a batched per-partition map,
  * no shuffle); export writes one archive per partition
  * ([[exportArchives]]), so archive size follows partition sizing.
  */
object WarcIO {

  final case class WarcRecord(
      warcType: String,
      targetUri: String,
      date: String,
      payload: Array[Byte])

  private val CRLF = "\r\n".getBytes("US-ASCII")

  /** Header-value framing safety (round-7 advisor): a value containing a
    * control character (CR/LF above all) would corrupt the CRLF framing of
    * the whole archive — parse then returns None and the archive is lost.
    * Printable ASCII passes through unchanged; anything else is
    * percent-encoded byte-wise (UTF-8). One-way by design: this guards
    * framing, it is not an escaping scheme readers must reverse. */
  private def headerSafe(v: String): String =
    if (v.forall(c => c >= 0x20 && c <= 0x7e)) v
    else v.getBytes("UTF-8").map { b =>
      if (b >= 0x20 && b <= 0x7e) b.toChar.toString else f"%%${b & 0xff}%02X"
    }.mkString

  /** Serialize records (WARC/1.0, minimal mandatory headers). */
  def write(records: Seq[WarcRecord]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { r => writeRecord(out, r) }
    out.toByteArray
  }

  private def writeRecord(out: java.io.OutputStream, r: WarcRecord): Unit = {
    val uri = headerSafe(r.targetUri)
    val head = new StringBuilder()
      .append("WARC/1.0\r\n")
      .append("WARC-Type: ").append(headerSafe(r.warcType)).append("\r\n")
      .append("WARC-Record-ID: <urn:graft:").append(uri).append(">\r\n")
      .append("WARC-Date: ").append(headerSafe(r.date)).append("\r\n")
    if (uri.nonEmpty)
      head.append("WARC-Target-URI: ").append(uri).append("\r\n")
    head.append("Content-Length: ").append(r.payload.length).append("\r\n\r\n")
    out.write(head.toString.getBytes("US-ASCII"))
    out.write(r.payload)
    out.write(CRLF); out.write(CRLF)
  }

  /** Gzip a serialized archive with one member per record (the seekable
    * layout real crawlers write). Each member's stream is close()d so its
    * Deflater's native buffer is released deterministically, not at GC
    * (round-7 advisor; ByteArrayOutputStream.close() is a no-op, so the
    * shared sink survives). */
  def writeGzip(records: Seq[WarcRecord]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { r => gzipRecord(out, r) }
    out.toByteArray
  }

  private def gzipRecord(out: java.io.ByteArrayOutputStream, r: WarcRecord): Unit = {
    val gz = new java.util.zip.GZIPOutputStream(out)
    try { writeRecord(gz, r); gz.finish() } finally gz.close()
  }

  /** Parse a (plain) archive. None on any framing violation. */
  def parseAll(bytes: Array[Byte]): Option[Seq[WarcRecord]] =
    try {
      val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
      var i = 0
      while (i < bytes.length) {
        // skip inter-record CRLFs (tolerant of the trailing boundary)
        while (i + 1 < bytes.length && bytes(i) == '\r' && bytes(i + 1) == '\n') i += 2
        if (i >= bytes.length) return Some(out.toSeq)
        // version line
        val headerEnd = indexOfBlankLine(bytes, i)
        if (headerEnd < 0) return None
        val headText = new String(bytes, i, headerEnd - i, "US-ASCII")
        val lines = headText.split("\r\n", -1)
        if (!lines.head.startsWith("WARC/")) return None
        val headers = lines.tail.iterator.flatMap { l =>
          val c = l.indexOf(':')
          if (c < 0) None else Some(l.substring(0, c).trim.toLowerCase -> l.substring(c + 1).trim)
        }.toMap
        val len = headers.get("content-length").flatMap(_.toLongOption).getOrElse(-1L)
        if (len < 0) return None
        val payloadStart = headerEnd + 4 // past \r\n\r\n
        if (payloadStart + len > bytes.length) return None
        val payload = java.util.Arrays.copyOfRange(
          bytes, payloadStart, (payloadStart + len).toInt)
        out += WarcRecord(
          headers.getOrElse("warc-type", ""),
          headers.getOrElse("warc-target-uri", ""),
          headers.getOrElse("warc-date", ""),
          payload)
        i = (payloadStart + len).toInt
        // mandatory record boundary \r\n\r\n (absent only at EOF)
        if (i < bytes.length) {
          if (i + 4 <= bytes.length &&
            bytes(i) == '\r' && bytes(i + 1) == '\n' && bytes(i + 2) == '\r' && bytes(i + 3) == '\n')
            i += 4
          else return None
        }
      }
      Some(out.toSeq)
    } catch { case _: IndexOutOfBoundsException => None }

  /** Parse a gzipped archive (member-per-record or whole-stream). */
  def parseAllGzip(bytes: Array[Byte]): Option[Seq[WarcRecord]] =
    try {
      val gz = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
      parseAll(gz.readAllBytes())
    } catch { case _: java.io.IOException => None }

  /** Auto-detect gzip (magic 1f 8b) vs plain. */
  def parseAuto(bytes: Array[Byte]): Option[Seq[WarcRecord]] =
    if (bytes == null || bytes.length < 2) None
    else if ((bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b) parseAllGzip(bytes)
    else parseAll(bytes)

  private def indexOfBlankLine(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** Split an HTTP response envelope: (status code, body bytes). None when
    * the payload is not an HTTP response. */
  def httpResponse(payload: Array[Byte]): Option[(Int, Array[Byte])] = {
    val headerEnd = indexOfBlankLine(payload, 0)
    if (headerEnd < 0) return None
    val statusLine = {
      val eol = {
        var i = 0
        while (i < headerEnd && payload(i) != '\r') i += 1
        i
      }
      new String(payload, 0, eol, "US-ASCII")
    }
    if (!statusLine.startsWith("HTTP/")) return None
    val parts = statusLine.split(" ", 3)
    parts.lift(1).flatMap(_.toIntOption).map { code =>
      (code, java.util.Arrays.copyOfRange(payload, headerEnd + 4, payload.length))
    }
  }

  private val recordSchema = StructType(Seq(
    StructField("warc_type", StringType, nullable = false),
    StructField("uri", StringType, nullable = false),
    StructField("warc_date", StringType, nullable = false),
    StructField("http_status", IntegerType, nullable = true),
    StructField("body", BinaryType, nullable = true),
    StructField("payload_octets", LongType, nullable = false)))

  /** Ingest stage: (…, archive binary) → one row per WARC record, HTTP
    * envelope split for `response` records (status + body; null for
    * non-HTTP payloads). Per-partition batched map — no shuffle; an
    * unparseable archive yields zero rows plus a `_corrupt` marker row
    * (warc_type = "corrupt"), loud in any downstream count. */
  def explodeRecords(df: DataFrame, blobCol: String = "warc"): DataFrame = {
    val keep = df.schema.fields.filter(_.name != blobCol)
    val outSchema = StructType(keep ++ recordSchema.fields)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val keepIdx = keep.map(f => df.schema.fieldIndex(f.name))
    val enc = ExpressionEncoder(outSchema)
    df.mapPartitions { it =>
      it.flatMap { row =>
        val pass = keepIdx.map(row.get).toSeq
        parseAuto(row.getAs[Array[Byte]](blobIdx)) match {
          case Some(records) =>
            records.map { r =>
              val http = if (r.warcType == "response") httpResponse(r.payload) else None
              Row.fromSeq(pass ++ Seq(
                r.warcType, r.targetUri, r.date,
                http.map(h => java.lang.Integer.valueOf(h._1)).orNull,
                http.map(_._2).orNull,
                r.payload.length.toLong))
            }
          case None =>
            Seq(Row.fromSeq(pass ++ Seq("corrupt", "", "", null, null, 0L)))
        }
      }
    }(enc)
  }

  /** Export stage: (url, date string, body binary) rows → ONE gzipped
    * archive blob per partition (member-per-record, the seekable layout).
    * Repartition upstream to size archives. Rows stream one at a time into
    * the gzip sink (round-7 advisor: the previous form materialized the
    * whole partition as a Seq plus the uncompressed archive plus its gzip
    * copy — three partition-sized buffers at once); the remaining bound is
    * the single gzipped archive blob itself, which the row output format
    * requires in memory — size archives via the upstream repartition. */
  def exportArchives(
      df: DataFrame,
      urlCol: String = "url", dateCol: String = "warc_date", bodyCol: String = "body"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("n_records", IntegerType, nullable = false),
      StructField("warc", BinaryType, nullable = false)))
    val (ui, di, bi) =
      (df.schema.fieldIndex(urlCol), df.schema.fieldIndex(dateCol), df.schema.fieldIndex(bodyCol))
    val enc = ExpressionEncoder(outSchema)
    df.mapPartitions { it =>
      val out = new java.io.ByteArrayOutputStream()
      var n = 0
      it.foreach { row =>
        val body = row.getAs[Array[Byte]](bi)
        val http = ("HTTP/1.1 200 OK\r\nContent-Length: " + body.length + "\r\n\r\n")
          .getBytes("US-ASCII") ++ body
        gzipRecord(out, WarcRecord("response", row.getString(ui), row.getString(di), http))
        n += 1
      }
      if (n == 0) Iterator.empty
      else Iterator(Row(n, out.toByteArray))
    }(enc)
  }
}
