package graft.operators

/**
 * Content sniffing by magic bytes — the format dispatch for documents
 * that carry NO extension or doc type, which is the normal case for
 * crawl payloads (a WARC response's URL is `/download?id=123`, not
 * `report.pdf`). Extension dispatch stays primary (cheap, and the
 * reference's reader contract); sniffing is the fallback
 * [[graft.docset.DocSet.partitionAuto]] consults before giving up with
 * `unsupported_format`.
 *
 * Signatures: `%PDF`; ZIP local header `PK\x03\x04` disambiguated to
 * docx/pptx by the OOXML part paths in the entry names (`word/` vs
 * `ppt/`, scanned over a bounded 64 KiB head); `WEBVTT`; an `<html` /
 * `<!doctype html` head (BOM/whitespace tolerant, case-blind); else
 * mostly-printable bytes sniff as plain text (≥90% printable in the
 * first 512 bytes — UTF-8 continuation bytes count as printable).
 * Unknown stays "" so the audit marker fires downstream.
 */
object Sniff {

  /** Formats partitionAuto can dispatch from an extension. */
  val KnownExtensions: Set[String] =
    Set("pdf", "html", "htm", "docx", "pptx", "txt", "text", "transcript", "vtt")

  def sniff(b: Array[Byte]): String = {
    def asciiAt(off: Int, s: String): Boolean =
      b.length >= off + s.length && s.indices.forall(i => b(off + i) == s.charAt(i).toByte)
    if (asciiAt(0, "%PDF")) "pdf"
    else if (b.length >= 4 && b(0) == 'P'.toByte && b(1) == 'K'.toByte &&
             b(2) == 3.toByte && b(3) == 4.toByte) {
      val head = new String(b, 0, math.min(b.length, 65536),
        java.nio.charset.StandardCharsets.ISO_8859_1)
      if (head.contains("word/")) "docx"
      else if (head.contains("ppt/")) "pptx"
      else ""
    }
    else if (asciiAt(0, "WEBVTT")) "vtt"
    else {
      val n = math.min(b.length, 512)
      if (n == 0) ""
      else {
        val head = new String(b, 0, n, java.nio.charset.StandardCharsets.UTF_8)
          .replace("﻿", "").dropWhile(_.isWhitespace).toLowerCase
        if (head.startsWith("<!doctype html") || head.startsWith("<html")) "html"
        else {
          var printable = 0
          var i = 0
          while (i < n) {
            val v = b(i) & 0xFF
            if (v == 0x09 || v == 0x0A || v == 0x0D || (v >= 0x20 && v != 0x7F)) printable += 1
            i += 1
          }
          if (printable * 10 >= n * 9) "text" else ""
        }
      }
    }
  }
}
