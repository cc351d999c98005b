package graft.operators

import graft.model.{Document, Element}

/**
 * Parse binary/text content into elements (reference:
 * lib/sycamore/sycamore/transforms/partition.py:28-433 — the partitioner is
 * pluggable: DETR model service, BeautifulSoup HTML, etc. The model/service
 * calls are I/O plugins, not engine; the engine contract is
 * Document -> Document-with-elements).
 */
trait Partitioner extends Serializable {
  def partition(doc: Document): Document
}

/**
 * Dependency-free HTML partitioner (reference: partition.py:38
 * HtmlPartitioner uses BeautifulSoup; jsoup isn't available in this build,
 * so this is a small tag scanner covering the same element vocabulary:
 * title, h1-h6 -> Section-header, p -> NarrativeText, li -> List-item,
 * table -> table text).
 */
final class HtmlPartitioner extends Partitioner {
  private val blockRe =
    ("(?is)<(title|h[1-6]|p|li|td|th|caption)\\b[^>]*>(.*?)</\\1>").r
  private val tagRe = "(?s)<[^>]*>".r
  private val wsRe = "\\s+".r

  private def clean(s: String): String =
    wsRe.replaceAllIn(tagRe.replaceAllIn(s, " "), " ").trim
      .replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&nbsp;", " ")

  override def partition(doc: Document): Document = {
    val html = doc.textRepresentation.getOrElse(
      doc.binaryRepresentation.map(b => new String(b, java.nio.charset.StandardCharsets.UTF_8))
        .getOrElse(""))
    val els = blockRe.findAllMatchIn(html).zipWithIndex.flatMap { case (m, i) =>
      val text = clean(m.group(2))
      if (text.isEmpty) None
      else {
        val t = m.group(1).toLowerCase match {
          case "title"               => "Title"
          case h if h.startsWith("h") => "Section-header"
          case "p"                   => "NarrativeText"
          case "li"                  => "List-item"
          case _                     => "TableText"
        }
        Some(Element.text(i, t, text))
      }
    }.toSeq
    doc.copy(elements = els, docType = doc.docType.orElse(Some("html")))
  }
}

/**
 * PDF partitioning requires a layout model or PDF parser (reference:
 * detr_partitioner.py — a deformable-DETR vision model). Neither a PDF
 * library nor the model is available in this container, so the decode step
 * is a deliberate stub behind the same trait; the Spark-side plumbing
 * (binary column in, element array out, partition-parallel) is real.
 */
final class PdfPartitionerStub extends Partitioner {
  override def partition(doc: Document): Document =
    throw new UnsupportedOperationException(
      "PDF partitioning requires a layout model; wire a real Partitioner impl")
}
