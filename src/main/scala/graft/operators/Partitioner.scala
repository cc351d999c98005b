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
  private val blockTags = Set("title", "h1", "h2", "h3", "h4", "h5", "h6",
    "p", "li", "td", "th", "caption")
  private val skipTags = Set("script", "style")
  private val tagRe = "(?s)<(/?)([a-zA-Z][a-zA-Z0-9]*)[^>]*>|<!--.*?-->".r
  private val wsRe = "\\s+".r

  private def clean(s: String): String =
    wsRe.replaceAllIn(s, " ").trim
      .replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&nbsp;", " ")

  private def elementType(tag: String): String = tag match {
    case "title"                 => "Title"
    case h if h.startsWith("h")  => "Section-header"
    case "p"                     => "NarrativeText"
    case "li"                    => "List-item"
    case _                       => "TableText"
  }

  /** Streaming tokenizer, not backreference-paired regexes: real HTML is full
    * of unclosed <p>/<li> (valid per the spec — these tags imply-close on the
    * next block open), which a <tag>...</tag> regex silently drops. A block
    * ends at its close tag, at the NEXT block-level open, or at EOF. */
  override def partition(doc: Document): Document = {
    val html = doc.textRepresentation.getOrElse(
      doc.binaryRepresentation.map(b => new String(b, java.nio.charset.StandardCharsets.UTF_8))
        .getOrElse(""))
    val els = scala.collection.mutable.ListBuffer[Element]()
    var open: Option[String] = None        // currently-open block tag
    var buf = new StringBuilder
    var skipping: Option[String] = None    // inside <script>/<style>
    var pos = 0

    def emit(): Unit = {
      open.foreach { tag =>
        val text = clean(buf.toString)
        if (text.nonEmpty) els += Element.text(els.size, elementType(tag), text)
      }
      open = None
      buf = new StringBuilder
    }

    tagRe.findAllMatchIn(html).foreach { m =>
      val textRun = html.substring(pos, m.start)
      if (skipping.isEmpty && open.isDefined) buf.append(textRun).append(' ')
      pos = m.end
      (Option(m.group(1)), Option(m.group(2)).map(_.toLowerCase)) match {
        case (_, None) => // comment
        case (Some(""), Some(t)) if skipTags(t)  => skipping = Some(t)
        case (Some("/"), Some(t)) if skipping.contains(t) => skipping = None
        case _ if skipping.isDefined =>
        case (Some(""), Some(t)) if blockTags(t) => emit(); open = Some(t)
        case (Some("/"), Some(t)) if open.contains(t) => emit()
        case _ => // inline tag inside a block: treat as a word break
          if (open.isDefined) buf.append(' ')
      }
    }
    if (open.isDefined && skipping.isEmpty) buf.append(html.substring(pos))
    emit()
    doc.copy(elements = els.toSeq, docType = doc.docType.orElse(Some("html")))
  }
}

// PDF partitioning: see PdfPartitioner.scala — a dependency-free text-layer
// extractor for machine-generated PDFs; model-backed layout partitioners
// (the reference's DETR path) plug into the same trait.
