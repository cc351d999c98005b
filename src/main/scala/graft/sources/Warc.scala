package graft.sources

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.docset.DocSet
import graft.model.Document

/**
 * WARC (Web ARChive, ISO 28500) ingest — the Common Crawl container format,
 * the front door of every published web-curation pipeline (C4, CCNet,
 * RefinedWeb, Gopher/MassiveText all start from WARC/WET dumps). The
 * reference has no web-archive reader; this is an engine addition in the
 * same binary-scan family as read.binary.
 *
 * Format (dependency-free parse): each record is
 *   `WARC/1.x\r\n` + name:value header lines + `\r\n` + payload of exactly
 *   Content-Length bytes + `\r\n\r\n`.
 * `response` records carry a full HTTP response as payload; the HTTP body
 * (after the first `\r\n\r\n`) is the document content. `conversion`
 * records (WET extracts) carry plain text. `.warc.gz` inputs are
 * per-record-gzip-member concatenations — java.util.zip.GZIPInputStream
 * reads multi-member streams natively, so one full-stream inflate yields
 * the concatenated records.
 *
 * Scale shape: one WARC file = one binaryFile row = one task; a crawl dump
 * is tens of thousands of ~1 GB files, so file-level parallelism saturates
 * any cluster (exactly how Common Crawl is meant to be read). The parse is
 * a single forward byte scan per file — no backtracking, no whole-file
 * String materialization; payload slices are zero-copy array copies.
 */
object Warc {

  final case class WarcRecord(headers: Map[String, String], payload: Array[Byte]) {
    def warcType: String = headers.getOrElse("warc-type", "")
    def targetUri: String = headers.getOrElse("warc-target-uri", "")
  }

  /** Gunzip, degrading on corruption: a crawl file whose gzip stream is
    * damaged mid-way yields the bytes decompressed SO FAR (records() then
    * parses that complete prefix), never a task-killing ZipException —
    * the same truncated-prefix contract the plain-WARC parse keeps.
    * (Found by FuzzSpec: any flipped byte in a .warc.gz payload or
    * trailer threw out of records().) */
  private def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    // size HINT bounded in Long space: bytes.length * 4 Int-overflows to a
    // NEGATIVE hint for inputs over 512 MB (Common Crawl files run ~1 GB)
    // and ByteArrayOutputStream(negative) throws OUTSIDE the catch below —
    // exactly the task death the degrade contract forbids. 64 MB is hint
    // ceiling, not a data cap — the stream grows past it fine.
    val hint = math.min(math.max(bytes.length.toLong * 4, 65536L), 64L << 20)
    val out = new java.io.ByteArrayOutputStream(hint.toInt)
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes), 65536)
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      in.close()
    } catch { case _: java.io.IOException => /* corrupt tail: keep prefix */ }
    out.toByteArray
  }

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xFF) == 0x1F && (b(1) & 0xFF) == 0x8B

  /** Parse every record of a (possibly gzipped) WARC file. Malformed
    * trailing garbage ends the parse rather than throwing — a truncated
    * crawl file yields its complete prefix (degraded, never fatal). */
  def records(raw: Array[Byte]): Seq[WarcRecord] = {
    val bytes = if (isGzip(raw)) gunzipAll(raw) else raw
    val out = scala.collection.mutable.ListBuffer[WarcRecord]()
    var i = 0
    def lineEnd(from: Int): Int = {
      var j = from
      while (j + 1 < bytes.length && !(bytes(j) == '\r' && bytes(j + 1) == '\n')) j += 1
      if (j + 1 < bytes.length) j else -1
    }
    while (i < bytes.length) {
      // seek the next record marker (tolerates inter-record padding)
      while (i + 5 <= bytes.length &&
             !(bytes(i) == 'W' && bytes(i + 1) == 'A' && bytes(i + 2) == 'R' &&
               bytes(i + 3) == 'C' && bytes(i + 4) == '/')) i += 1
      if (i + 5 > bytes.length) return out.toSeq
      val headers = scala.collection.mutable.Map[String, String]()
      var e = lineEnd(i)
      if (e < 0) return out.toSeq
      i = e + 2
      var open = true
      while (open) {
        e = lineEnd(i)
        if (e < 0) return out.toSeq
        if (e == i) { open = false; i = e + 2 } // blank line: headers end
        else {
          val line = new String(bytes, i, e - i, java.nio.charset.StandardCharsets.ISO_8859_1)
          val c = line.indexOf(':')
          if (c > 0) headers(line.substring(0, c).trim.toLowerCase) =
            line.substring(c + 1).trim
          i = e + 2
        }
      }
      val len = headers.get("content-length").flatMap(_.toLongOption).getOrElse(-1L)
      if (len < 0 || i + len > bytes.length) return out.toSeq
      out += WarcRecord(headers.toMap,
        java.util.Arrays.copyOfRange(bytes, i, i + len.toInt))
      i += len.toInt
    }
    out.toSeq
  }

  /** The HTTP body of a response payload (after the first CRLFCRLF), plus
    * the Content-Type of the HTTP headers if present. */
  def httpBody(payload: Array[Byte]): (Array[Byte], Option[String]) = {
    var i = 0
    while (i + 3 < payload.length &&
           !(payload(i) == '\r' && payload(i + 1) == '\n' &&
             payload(i + 2) == '\r' && payload(i + 3) == '\n')) i += 1
    if (i + 3 >= payload.length) (payload, None)
    else {
      val head = new String(payload, 0, i, java.nio.charset.StandardCharsets.ISO_8859_1)
      val ct = head.linesIterator
        .find(_.toLowerCase.startsWith("content-type:"))
        .map(_.substring("content-type:".length).trim)
      (java.util.Arrays.copyOfRange(payload, i + 4, payload.length), ct)
    }
  }

  /**
   * WARC files -> one Document per `response`/`conversion` record:
   * docId = WARC-Record-ID (falls back to path#index), binary = the HTTP
   * body (response) or raw payload (conversion), and the WARC envelope
   * (target URI, date, type, content type, source path) as properties.
   * Feed the result to partitionAuto()/HtmlPartitioner for element
   * extraction — the same downstream as every other binary source.
   */
  def read(spark: SparkSession, paths: String, glob: String = "*.warc*"): DocSet = {
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(paths)
    val ds = df.select(col("path"), col("content"))
      .as[(String, Array[Byte])](Encoders.product[(String, Array[Byte])])
      .flatMap { case (path, content) =>
        records(content).zipWithIndex.collect {
          case (r, idx) if r.warcType == "response" || r.warcType == "conversion" =>
            val (body, httpCt) = r.warcType match {
              case "response" => httpBody(r.payload)
              case _          => (r.payload, None)
            }
            val ct = httpCt.orElse(r.headers.get("content-type"))
            Document.of(
                r.headers.getOrElse("warc-record-id", s"$path#$idx"),
                docType = if (ct.exists(_.contains("html"))) "html" else null,
                properties = Map(
                  "path" -> path,
                  "warc_type" -> r.warcType,
                  "url" -> r.targetUri) ++
                  r.headers.get("warc-date").map("warc_date" -> _) ++
                  ct.map("content_type" -> _))
              .copy(binaryRepresentation = Some(body))
        }
      }(DocSet.docEnc)
    DocSet.wrap(ds)
  }
}
