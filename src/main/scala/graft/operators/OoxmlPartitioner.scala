package graft.operators

import graft.model.{Document, Element}

/**
 * Dependency-free OOXML partitioners: DOCX (WordprocessingML) and PPTX
 * (PresentationML). The reference has no native parser for either — its
 * docx/pptx path shells out to LibreOffice to produce a PDF and re-enters
 * the PDF partitioner (utils/fileformat_tools.py:13
 * binary_representation_to_pdf), which is a subprocess dependency a Spark
 * executor shouldn't carry. OOXML is a ZIP of small XML parts, so the JDK's
 * ZipInputStream plus a tag scanner (same streaming style as
 * HtmlPartitioner) covers the text/structure layer natively:
 *
 *  - DOCX: one element per `w:p` paragraph of word/document.xml — style
 *    `Title` -> Title; `Heading*` styles or an `w:outlineLvl` (how Word
 *    actually marks headings in styles-indirect documents) ->
 *    Section-header; numbered/bulleted (`w:numPr`) -> List-item; `w:tbl`
 *    tables -> one structured `table` element (TableCell grid with
 *    gridSpan/vMerge spans and tblHeader rows), interior paragraphs not
 *    double-emitted.
 *  - PPTX: slides in numeric order (page_number = slide number); one
 *    element per `a:p` paragraph per shape; title/ctrTitle placeholders ->
 *    Title; footer/slide-number/date placeholders are chrome and skipped;
 *    DrawingML `a:tbl` tables as structured `table` elements interleaved
 *    at their document position; speaker notes as `Notes` elements.
 *
 * Well-formedness note: OOXML producers emit machine-generated,
 * namespace-prefixed XML — the tag scanner relies on that regularity
 * (no unquoted attributes, no omitted close tags), unlike real-world
 * HTML where HtmlPartitioner must tolerate tag soup.
 */
object Ooxml {

  /** Per-entry inflation cap: OOXML text/structure parts are KBs-to-low-MBs;
    * 64 MB is far above any legitimate document.xml yet bounds a zip bomb
    * (tiny compressed entry expanding to GBs) to executor-survivable size. */
  private[operators] val MaxEntryBytes: Long = 64L << 20
  /** Total-inflation cap across all matched entries of one file. */
  private[operators] val MaxTotalBytes: Long = 256L << 20

  /** Entries of a ZIP matching a predicate, as (name, bytes). Oversized
    * entries are SKIPPED (not truncated — half an XML part is tag soup)
    * and extraction stops at the total cap, degrading like the
    * truncated-zip catch path rather than OOMing the executor. */
  def zipEntries(bytes: Array[Byte], want: String => Boolean): Seq[(String, Array[Byte])] = {
    val out = scala.collection.mutable.ListBuffer[(String, Array[Byte])]()
    val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    var total = 0L
    try {
      var e = zin.getNextEntry
      while (e != null && total < MaxTotalBytes) {
        if (!e.isDirectory && want(e.getName)) {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](8192)
          var over = false
          var n = zin.read(chunk)
          while (n > 0 && !over) {
            if (buf.size() + n > MaxEntryBytes || total + buf.size() + n > MaxTotalBytes) over = true
            else { buf.write(chunk, 0, n); n = zin.read(chunk) }
          }
          // ATTEMPTED bytes count toward the total either way: a zip with
          // many over-cap entries must exhaust the file budget rather than
          // pay up-to-64MB of inflation per entry indefinitely (CPU bomb)
          total += buf.size()
          if (!over) out += ((e.getName, buf.toByteArray))
        }
        e = zin.getNextEntry
      }
    } catch { case _: Exception => /* truncated/corrupt zip: keep what we have */ }
    finally zin.close()
    out.toSeq
  }

  private val EntityRe = "&(amp|lt|gt|quot|apos|#x?[0-9a-fA-F]+);".r

  def unescapeXml(s: String): String =
    EntityRe.replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(m.group(1) match {
      case "amp" => "&"
      case "lt" => "<"
      case "gt" => ">"
      case "quot" => "\""
      case "apos" => "'"
      case e if e.startsWith("#x") || e.startsWith("#X") =>
        try new String(Character.toChars(Integer.parseInt(e.drop(2), 16)))
        catch { case _: Exception => "" }
      case e => // decimal
        try new String(Character.toChars(e.drop(1).toInt))
        catch { case _: Exception => "" }
    }))

  /** Text of one WordprocessingML/DrawingML paragraph blob: `w:t`/`a:t`
    * runs concatenated; explicit breaks and tabs preserved. The run-tag
    * regex anchors the name boundary — a bare `<w:t[^>]*>` would also
    * swallow `<w:tbl>`/`<w:tc>`/`<w:tr>` and emit their XML as text. */
  // breaks/tabs tolerate attributes: Word emits <w:br w:type="page"/> and
  // friends, and dropping them glues the neighboring runs into one word
  private val RunRe =
    "(?s)<(?:w|a):t(?:\\s[^>]*)?>(.*?)</(?:w|a):t>|<w:br(?:\\s[^>]*)?/>|<w:tab(?:\\s[^>]*)?/>".r

  def paragraphText(p: String): String = {
    val sb = new StringBuilder
    RunRe.findAllMatchIn(p).foreach { m =>
      if (m.group(1) != null) sb.append(unescapeXml(m.group(1)))
      else if (m.matched.startsWith("<w:br")) sb.append('\n')
      else sb.append('\t')
    }
    sb.toString.replace('\u00A0', ' ').trim // nbsp -> space (OOXML runs carry literal nbsp)
  }
}

/** DOCX partitioner: word/document.xml -> typed elements. */
final class DocxPartitioner extends Partitioner {
  private val TblRe = "(?s)<w:tbl(?:\\s[^>]*)?>.*?</w:tbl>".r
  private val ParaRe = "(?s)<w:p(?:\\s[^>]*)?>.*?</w:p>".r
  private val StyleRe = "<w:pStyle w:val=\"([^\"]+)\"".r
  private val RowRe = "(?s)<w:tr(?:\\s[^>]*)?>.*?</w:tr>".r
  private val CellRe = "(?s)<w:tc(?:\\s[^>]*)?>.*?</w:tc>".r

  private def paraType(p: String): String = {
    val style = StyleRe.findFirstMatchIn(p).map(_.group(1).toLowerCase).getOrElse("")
    if (style == "title") "Title"
    else if (style.startsWith("heading") || p.contains("<w:outlineLvl")) "Section-header"
    else if (p.contains("<w:numPr>")) "List-item"
    else "NarrativeText"
  }

  private val GridSpanRe = "<w:gridSpan w:val=\"(\\d+)\"".r
  private val VMergeRe = "<w:vMerge(\\s[^/>]*)?/>".r
  private val HeaderPropRe = "<w:tblHeader(?:\\s+w:val=\"([^\"]*)\")?\\s*/?>".r

  /** WordprocessingML table -> TableCell grid: gridSpan is the colspan,
    * vertical merges are a `restart` cell followed by bare `<w:vMerge/>`
    * continuation cells in the rows below (same start column) — the
    * continuations occupy grid slots but carry no content. Header rows
    * are the ones marked <w:tblHeader/> (Word's repeat-on-every-page
    * header property). Nested tables are out of scope (the non-greedy
    * span match would truncate them; rare in text corpora). */
  private def parseTable(t: String): Seq[graft.model.TableCell] = {
    final case class Raw(r: Int, c0: Int, span: Int,
                         vRestart: Boolean, vCont: Boolean,
                         header: Boolean, text: String)
    val raws = scala.collection.mutable.ListBuffer[Raw]()
    var r = 0
    RowRe.findAllMatchIn(t).foreach { row =>
      // value-aware: <w:tblHeader w:val="0"/"false"/> is an explicit OFF
      val header = HeaderPropRe.findFirstMatchIn(row.group(0))
        .exists(m => Option(m.group(1)).forall(v => v != "0" && v != "false"))
      var c = 0
      CellRe.findAllIn(row.group(0)).foreach { cell =>
        // toIntOption + cap: a hostile gridSpan of 2e9 would otherwise be
        // an OOM bomb (the col-slot array is span ints), and 11+ digits a
        // NumberFormatException poison pill
        val span = GridSpanRe.findFirstMatchIn(cell)
          .flatMap(_.group(1).toIntOption).map(v => math.min(math.max(v, 1), 1024))
          .getOrElse(1)
        val vm = VMergeRe.findFirstMatchIn(cell)
        val vRestart = vm.exists(m => Option(m.group(1)).exists(_.contains("restart")))
        val vCont = vm.isDefined && !vRestart
        raws += Raw(r, c, span, vRestart, vCont, header, Ooxml.paragraphText(cell))
        c += span
      }
      r += 1
    }
    val all = raws.toSeq
    all.filterNot(_.vCont).map { raw =>
      val rs =
        if (!raw.vRestart) 1
        else 1 + Iterator.from(raw.r + 1)
          .takeWhile(rr => all.exists(x => x.r == rr && x.c0 == raw.c0 && x.vCont))
          .size
      graft.model.TableCell(raw.text,
        (raw.r until raw.r + rs).toArray,
        (raw.c0 until raw.c0 + raw.span).toArray,
        raw.header, None)
    }
  }

  override def partition(doc: Document): Document = {
    val bytes = doc.binaryRepresentation.getOrElse(Array.empty[Byte])
    val xml = Ooxml.zipEntries(bytes, _ == "word/document.xml").headOption
      .map(e => new String(e._2, java.nio.charset.StandardCharsets.UTF_8))
      .getOrElse("")
    val els = scala.collection.mutable.ListBuffer[Element]()
    // tables first (their interior w:p's must not double-emit), then
    // paragraphs outside any table span — both in document order
    val tables = TblRe.findAllMatchIn(xml).map(m => (m.start, m.end)).toSeq
    def inTable(pos: Int): Boolean = tables.exists(t => pos >= t._1 && pos < t._2)
    sealed case class Piece(start: Int, typ: String, text: String,
                            cells: Seq[graft.model.TableCell] = Nil)
    val tablePieces = tables.flatMap { case (s, e) =>
      val cells = parseTable(xml.substring(s, e))
      if (cells.exists(_.content.nonEmpty))
        Some(Piece(s, "table", "", cells)) else None
    }
    val paraPieces = ParaRe.findAllMatchIn(xml)
      .filterNot(m => inTable(m.start))
      .map(m => Piece(m.start, paraType(m.group(0)), Ooxml.paragraphText(m.group(0))))
      .toSeq
    (tablePieces ++ paraPieces).sortBy(_.start)
      .filter(p => p.text.nonEmpty || p.cells.nonEmpty)
      .foreach { p =>
        if (p.cells.nonEmpty)
          els += Element("table", None, None, None, None, els.size, p.cells, Map.empty)
        else els += Element.text(els.size, p.typ, p.text)
      }
    doc.copy(elements = els.toSeq, docType = doc.docType.orElse(Some("docx")))
  }
}

/** PPTX partitioner: ppt/slides/slideN.xml in numeric order -> elements
  * with page_number = slide number. DrawingML tables (`a:tbl`) become
  * structured `table` elements: each row enumerates a `a:tc` for EVERY
  * grid column, with merge continuations marked hMerge/vMerge (skipped)
  * and the lead cell carrying gridSpan/rowSpan — so grid positions are
  * just the running cell index, no occupancy walk needed. Speaker notes
  * (`ppt/notesSlides/`) append as `Notes` elements, with digit-only
  * paragraphs (the slide-number placeholder every deck carries) dropped. */
final class PptxPartitioner(includeNotes: Boolean = true) extends Partitioner {
  private val SlideRe = "ppt/slides/slide(\\d+)\\.xml".r
  private val NotesRe = "ppt/notesSlides/notesSlide(\\d+)\\.xml".r
  private val ShapeRe = "(?s)<p:sp>.*?</p:sp>".r
  private val PhRe = "<p:ph type=\"([^\"]+)\"".r
  private val ParaRe = "(?s)<a:p>.*?</a:p>".r
  private val TblRe = "(?s)<a:tbl>.*?</a:tbl>".r
  private val TrRe = "(?s)<a:tr[^>]*>(.*?)</a:tr>".r
  private val TcOpenRe = "<a:tc((?:\\s[^>]*)?)(/?)>".r
  private val SpanAttrRe = "(gridSpan|rowSpan)=\"(\\d+)\"".r
  private val ChromePh = Set("ftr", "sldNum", "dt") // footer/number/date chrome

  private def numberedEntries(bytes: Array[Byte], re: scala.util.matching.Regex) =
    Ooxml.zipEntries(bytes, n => re.pattern.matcher(n).matches())
      .map { case (name, b) =>
        val re(num) = name: @unchecked
        // toIntOption: a 10+-digit slide number in a hostile zip must not
        // kill the task; absurd numbers sort last and still partition
        (num.toIntOption.getOrElse(Int.MaxValue),
          new String(b, java.nio.charset.StandardCharsets.UTF_8))
      }
      .sortBy(_._1)

  private val MergeAttrRe = "(hMerge|vMerge)=\"([^\"]*)\"".r
  private val FirstRowRe = "<a:tblPr[^>]*\\sfirstRow=\"(1|true)\"".r

  private def parseTbl(tbl: String): Seq[graft.model.TableCell] = {
    val cells = scala.collection.mutable.ListBuffer[graft.model.TableCell]()
    // row 0 is a header only when tblPr SAYS so (firstRow="1"); DrawingML
    // has no implicit header row
    val headerRow0 = FirstRowRe.findFirstIn(tbl).isDefined
    var r = 0
    TrRe.findAllMatchIn(tbl).foreach { row =>
      val opens = TcOpenRe.findAllMatchIn(row.group(1)).toSeq
      opens.zipWithIndex.foreach { case (m, i) =>
        val attrs = m.group(1)
        // value-aware: hMerge="0"/"false" is the (legal, explicit) default,
        // NOT a merge continuation — a substring test would drop the cell
        val merged = MergeAttrRe.findAllMatchIn(attrs)
          .exists(a => a.group(2) == "1" || a.group(2) == "true")
        // greedy [^>]* swallows a trailing '/', so self-closing is a
        // property of the matched text, not a capture group
        val selfClosed = m.matched.endsWith("/>")
        if (!merged && !selfClosed) {
          // same guard as the DOCX gridSpan: parse failures degrade to 1,
          // absurd spans cap rather than allocating span-sized slot arrays
          val spans = SpanAttrRe.findAllMatchIn(attrs)
            .flatMap(a => a.group(2).toIntOption
              .map(v => a.group(1) -> math.min(math.max(v, 1), 1024))).toMap
          val end = if (i + 1 < opens.size) opens(i + 1).start else row.group(1).length
          val body = row.group(1).substring(m.end, end)
          val text = ParaRe.findAllIn(body).map(Ooxml.paragraphText)
            .filter(_.nonEmpty).mkString("\n")
          cells += graft.model.TableCell(text,
            (r until r + spans.getOrElse("rowSpan", 1)).toArray,
            (i until i + spans.getOrElse("gridSpan", 1)).toArray,
            isHeader = headerRow0 && r == 0, None)
        }
      }
      r += 1
    }
    cells.toSeq
  }

  /** Text shapes of a slide-like XML part, chrome placeholders skipped —
    * shared between slides and notes pages (both carry ftr/sldNum/dt
    * placeholder shapes that must not become elements). */
  private def shapeParagraphs(xml: String): Iterator[(Int, String, String)] =
    ShapeRe.findAllMatchIn(xml).flatMap { sm =>
      val shape = sm.matched
      val ph = PhRe.findFirstMatchIn(shape).map(_.group(1))
      if (ph.exists(ChromePh)) Iterator.empty
      else {
        val typ =
          if (ph.contains("title") || ph.contains("ctrTitle")) "Title"
          else "NarrativeText"
        ParaRe.findAllIn(shape).map(Ooxml.paragraphText)
          .filter(_.nonEmpty).map(t => (sm.start, typ, t))
      }
    }

  override def partition(doc: Document): Document = {
    val bytes = doc.binaryRepresentation.getOrElse(Array.empty[Byte])
    val els = scala.collection.mutable.ListBuffer[Element]()
    numberedEntries(bytes, SlideRe).foreach { case (slideNo, xml) =>
      // interleave text shapes and tables by DOCUMENT POSITION — a caption
      // under a table must stay after it, or TableMerger's adjacency-based
      // continuation merge and HeaderAugmenter's governing-header logic
      // attach the wrong neighbors
      sealed trait Piece { def start: Int }
      final case class Para(start: Int, typ: String, text: String) extends Piece
      final case class Tbl(start: Int, cells: Seq[graft.model.TableCell]) extends Piece
      val paras = shapeParagraphs(xml).map(p => Para(p._1, p._2, p._3)).toSeq
      val tbls = TblRe.findAllMatchIn(xml).flatMap { tm =>
        val cells = parseTbl(tm.matched)
        if (cells.nonEmpty) Some(Tbl(tm.start, cells)) else None
      }.toSeq
      ((paras: Seq[Piece]) ++ tbls).sortBy(_.start).foreach {
        case Para(_, typ, t) =>
          els += Element.text(els.size, typ, t,
            properties = Map("page_number" -> slideNo.toString))
        case Tbl(_, cells) =>
          els += Element("table", None, None, None, None, els.size, cells,
            Map("page_number" -> slideNo.toString))
      }
    }
    if (includeNotes) numberedEntries(bytes, NotesRe).foreach { case (slideNo, xml) =>
      shapeParagraphs(xml)
        .filter { case (_, _, t) => !t.forall(_.isDigit) } // slide-no body text
        .foreach { case (_, _, t) =>
          els += Element.text(els.size, "Notes", t,
            properties = Map("page_number" -> slideNo.toString))
        }
    }
    doc.copy(elements = els.toSeq, docType = doc.docType.orElse(Some("pptx")))
  }
}

/** Plain-text partitioner: blank-line-separated paragraphs -> elements
  * (covers .txt corpora; the reference reads texts via its generic binary
  * scan + partition_file paths). */
final class TextPartitioner extends Partitioner {
  override def partition(doc: Document): Document = {
    val text = doc.textRepresentation.getOrElse(
      doc.binaryRepresentation
        .map(b => new String(b, java.nio.charset.StandardCharsets.UTF_8)).getOrElse(""))
    val els = text.split("\\n\\s*\\n").iterator
      .map(_.trim).filter(_.nonEmpty).zipWithIndex
      .map { case (t, i) => Element.text(i, "NarrativeText", t) }
      .toSeq
    doc.copy(elements = els, docType = doc.docType.orElse(Some("text")))
  }
}
