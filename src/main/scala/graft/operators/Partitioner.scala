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
 *
 * `skipHeadersAndFooters` (reference default true) drops content inside
 * <header>/<footer> chrome. `trackLinks` records each block's anchor-text
 * share as a `link_density` property — the block feature the Boilerplate
 * classifier keys on. `extractTables` (reference partition.py:113
 * extract_tables + data/table.py Table.from_html) additionally emits one
 * structured `table` element per non-nested <table>, with TableCell
 * row/col spans resolved through a grid-occupancy walk (rowspan cells
 * block the slots of later rows, exactly like HTML layout) — appended
 * after the text elements, matching the reference's element order.
 */
final class HtmlPartitioner(skipHeadersAndFooters: Boolean = true,
                            extractTables: Boolean = false,
                            trackLinks: Boolean = false) extends Partitioner {
  private val blockTags = Set("title", "h1", "h2", "h3", "h4", "h5", "h6",
    "p", "li", "td", "th", "caption")
  private val skipTags =
    if (skipHeadersAndFooters) Set("script", "style", "header", "footer")
    else Set("script", "style")
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
    // skip regions as a STACK, not a single slot: real headers/footers
    // contain <script>/<style>, and a single `skipping` variable would be
    // overwritten by the inner tag and cleared at its close — leaking the
    // rest of the chrome into the element stream
    var skipStack = List.empty[String]
    var pos = 0
    // link-density bookkeeping (opt-in): raw chars of the block's text
    // runs, and the share arriving while inside an <a> — the jusText /
    // Boilerpipe block feature (see Boilerplate)
    var anchorDepth = 0
    var blockRaw = 0L
    var blockLink = 0L

    def emit(): Unit = {
      open.foreach { tag =>
        val text = clean(buf.toString)
        if (text.nonEmpty) {
          val props =
            if (!trackLinks) Map.empty[String, String]
            else Map("link_density" ->
              (if (blockRaw == 0) "0.0"
               else f"${blockLink.toDouble / blockRaw}%.4f"))
          els += Element.text(els.size, elementType(tag), text, properties = props)
        }
      }
      open = None
      buf = new StringBuilder
      blockRaw = 0L; blockLink = 0L
    }

    tagRe.findAllMatchIn(html).foreach { m =>
      val textRun = html.substring(pos, m.start)
      if (skipStack.isEmpty && open.isDefined) {
        buf.append(textRun).append(' ')
        val visible = textRun.count(!_.isWhitespace)
        blockRaw += visible
        if (anchorDepth > 0) blockLink += visible
      }
      pos = m.end
      (Option(m.group(1)), Option(m.group(2)).map(_.toLowerCase)) match {
        case (_, None) => // comment
        case (Some(""), Some(t)) if skipTags(t)  => skipStack = t :: skipStack
        case (Some("/"), Some(t)) if skipStack.contains(t) =>
          // pop through to the matching open (tolerates unclosed inner tags)
          skipStack = skipStack.dropWhile(_ != t).drop(1)
        case _ if skipStack.nonEmpty =>
        case (Some(""), Some(t)) if blockTags(t) => emit(); open = Some(t)
        case (Some("/"), Some(t)) if open.contains(t) => emit()
        case (Some(""), Some("a")) =>
          anchorDepth += 1
          if (open.isDefined) buf.append(' ')
        case (Some("/"), Some("a")) =>
          anchorDepth = math.max(0, anchorDepth - 1)
          if (open.isDefined) buf.append(' ')
        case _ => // inline tag inside a block: treat as a word break
          if (open.isDefined) buf.append(' ')
      }
    }
    if (open.isDefined && skipStack.isEmpty) {
      val tail = html.substring(pos)
      buf.append(tail)
      val visible = tail.count(!_.isWhitespace)
      blockRaw += visible
      if (anchorDepth > 0) blockLink += visible
    }
    emit()
    if (extractTables) {
      tableSpans(html).foreach { t =>
        val cells = parseTable(t)
        if (cells.nonEmpty)
          els += graft.model.Element("table", None, None, None, None,
            els.size, cells, Map.empty)
      }
    }
    doc.copy(elements = els.toSeq, docType = doc.docType.orElse(Some("html")))
  }

  // ------------------------------------------------- structured tables

  private val tableOpenRe = "(?i)<table[^>]*>".r
  // open tags only — td/tr close tags are OPTIONAL per the HTML spec
  // (imply-close on the next cell/row), so paired open..close regexes
  // silently drop cells of real-world tables; cells/rows end at the next
  // open tag instead (same tolerance as the text path's tokenizer)
  private val rowOpenRe = "(?i)<tr[^>]*>".r
  private val cellOpenRe = "(?i)<(td|th)([^>]*)>".r
  private val spanRe = "(?i)(rowspan|colspan)\\s*=\\s*\"?(\\d+)".r

  /** Segments starting at each match of `openRe`, each ending at the next
    * match (or end of input), with any close tags stripped from the tail. */
  private def segments(body: String, openRe: scala.util.matching.Regex)
      : Seq[(scala.util.matching.Regex.Match, String)] = {
    val opens = openRe.findAllMatchIn(body).toSeq
    opens.zipWithIndex.map { case (m, i) =>
      val end = if (i + 1 < opens.size) opens(i + 1).start else body.length
      (m, body.substring(m.end, end))
    }
  }

  /** Interiors of non-nested <table> elements, document order. */
  private def tableSpans(html: String): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    tableOpenRe.findAllMatchIn(html).foreach { m =>
      val close = html.indexOf("</table", m.end)
      if (close > 0) {
        val body = html.substring(m.end, close)
        // reference semantics: a table CONTAINING another table is skipped
        // (its inner tables are found by their own open tags)
        if (!body.toLowerCase.contains("<table")) out += body
      }
    }
    out.toSeq
  }

  private def parseTable(body: String): Seq[graft.model.TableCell] = {
    val cells = scala.collection.mutable.ListBuffer[graft.model.TableCell]()
    val occupied = scala.collection.mutable.Set[(Int, Int)]()
    var r = 0
    segments(body, rowOpenRe).foreach { case (_, rowBody) =>
      var c = 0
      segments(rowBody, cellOpenRe).foreach { case (cellOpen, cellBody) =>
        while (occupied((r, c))) c += 1
        // toIntOption + cap: crawl HTML is THE hostile input surface — a
        // colspan of 2e9 would allocate span-sized slot arrays (OOM bomb)
        // and 11+ digits threw NumberFormatException
        val spans = spanRe.findAllMatchIn(cellOpen.group(2))
          .flatMap(m => m.group(2).toIntOption
            .map(v => m.group(1).toLowerCase -> math.min(v, 1024))).toMap
        val rs = math.max(1, spans.getOrElse("rowspan", 1))
        val cs = math.max(1, spans.getOrElse("colspan", 1))
        val rows = (r until r + rs).toArray
        val cols = (c until c + cs).toArray
        for (rr <- rows; cc <- cols) occupied += ((rr, cc))
        val text = clean(cellBody.replaceAll("<[^>]*>", " "))
        cells += graft.model.TableCell(text, rows, cols,
          isHeader = cellOpen.group(1).equalsIgnoreCase("th"), None)
        c += cs
      }
      r += 1
    }
    cells.toSeq
  }
}

/**
 * Transcript partitioner (reference: partition.py
 * HtmlPartitioner.transform_transcript_elements): text of the form
 * `[<time>] <speaker> <utterance...>` per line becomes one element per
 * utterance with start_time / end_time / speaker properties — end_time is
 * the NEXT utterance's start ("N/A" for the last). Malformed lines are
 * skipped rather than failing the document (the reference asserts).
 */
final class TranscriptPartitioner extends Partitioner {
  override def partition(doc: Document): Document = {
    val text = doc.textRepresentation.getOrElse(
      doc.binaryRepresentation
        .map(b => new String(b, java.nio.charset.StandardCharsets.UTF_8)).getOrElse(""))
    final case class Seg(start: String, speaker: String, text: String)
    val segs = text.split("\n").iterator.map(_.trim).filter(_.nonEmpty).flatMap { line =>
      if (!line.startsWith("[")) None
      else {
        val timeIx = line.indexOf(' ')
        val spkIx = if (timeIx > 0) line.indexOf(' ', timeIx + 1) else -1
        if (timeIx <= 0 || spkIx <= 0) None
        else Some(Seg(line.substring(0, timeIx),
          line.substring(timeIx + 1, spkIx),
          line.substring(spkIx + 1).trim))
      }
    }.toSeq
    val els = segs.zipWithIndex.map { case (s, i) =>
      val end = if (i + 1 < segs.size) segs(i + 1).start else "N/A"
      Element.text(i, "transcript", s.text, properties = Map(
        "start_time" -> s.start, "end_time" -> end, "speaker" -> s.speaker))
    }
    doc.copy(elements = els, docType = doc.docType.orElse(Some("transcript")))
  }
}

// PDF partitioning: see PdfPartitioner.scala — a dependency-free text-layer
// extractor for machine-generated PDFs; model-backed layout partitioners
// (the reference's DETR path) plug into the same trait.
