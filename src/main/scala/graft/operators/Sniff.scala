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
 * `ppt/`, scanned over a bounded 64 KiB head); `WEBVTT`; raster image
 * magics (`P6` ppm, `BM` bmp, PNG/JPEG/GIF — exactly the formats
 * [[MediaOps.decode]] dispatches on, so a sniff verdict of an image
 * format guarantees a decoder exists); an `<html` / `<!doctype html`
 * head (BOM/whitespace tolerant, case-blind); else mostly-printable
 * bytes sniff as plain text (≥90% printable in the first 512 bytes —
 * UTF-8 continuation bytes count as printable). Unknown stays "" so
 * the audit marker fires downstream.
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
    else if (b.length >= 12 && asciiAt(0, "RIFF") && asciiAt(8, "WAVE")) "wav"
    // raster magics before the text fallback: a P6 header is printable
    // ASCII and small solid images could otherwise sniff as "text"
    else if (b.length >= 11 && b(0) == 'P' && b(1) == '6' &&
             (b(2) == ' ' || b(2) == '\n' || b(2) == '\r' || b(2) == '\t' ||
              b(2) == '#')) "ppm"
    else if (b.length >= 54 && b(0) == 'B' && b(1) == 'M') "bmp"
    else if (b.length >= 4 && b(0) == 0x89.toByte && b(1) == 'P' &&
             b(2) == 'N' && b(3) == 'G') "png"
    else if (b.length >= 4 && b(0) == 0xFF.toByte && b(1) == 0xD8.toByte) "jpeg"
    else if (b.length >= 4 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
             b(3) == '8') "gif"
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

/** Magic-byte content sniff of a binary column as one codegen'd expression
  * (returns the [[Sniff.sniff]] format name, "" for unknown) — the
  * DataFrame-native twin of partitionAuto's Dataset-side dispatch, for
  * content-type audits over raw payload columns at corpus scale. */
case class SniffExpr(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"sniff needs binary, got $other")
  }
  protected override def nullSafeEval(input: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      Sniff.sniff(input.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.operators.Sniff.sniff($c))")
  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = copy(child = newChild)
  override def prettyName: String = "sniff_format"
}

object SniffExpr {
  /** Column helper: `sniffFormat($"bytes")`. */
  def sniffFormat(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SniffExpr(org.apache.spark.sql.graft.ColumnBridge.expression(c)))
}
