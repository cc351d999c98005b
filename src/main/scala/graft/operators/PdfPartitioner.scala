package graft.operators

import graft.model.{Document, Element}

/**
 * Dependency-free PDF text partitioner (reference: transforms/partition.py
 * ArynPartitioner — a remote DETR layout model + OCR; and detr_partitioner.py).
 *
 * Scope, honestly stated: this is NOT a layout model. It extracts the text
 * layer of machine-generated PDFs — cross-reference-free scanning for
 * `stream ... endstream` blocks, FlateDecode via java.util.zip.Inflater,
 * then the standard text-showing operators (Tj / TJ / ' / ") inside BT..ET
 * blocks, with PDF string escapes, hex strings, and merged ToUnicode CMaps
 * for CID/Type0 fonts. One element per BT..ET text block, in stream order.
 * Each element carries a BEST-EFFORT bbox from the text-positioning
 * operators (Td TD Tm T* TL Tf), normalized to the page MediaBox — exact in
 * position, approximate in width (0.5 x fontSize per glyph; no font metrics
 * without xref parsing) — enough for the column/band mark passes (Marks) to
 * fire on PDF-partitioned docs.
 * Not handled: ENCRYPTED PDFs (/Encrypt — streams are ciphertext), CID
 * fonts without a ToUnicode map, OCR of scanned pages.
 * Unextractable blocks are DROPPED (printable-ratio guard) rather than
 * emitted as garbage. For full-fidelity layout, plug a model-backed
 * Partitioner into the same trait — the engine contract (binary in,
 * elements out, partition-parallel) is identical.
 */
final class PdfPartitioner extends Partitioner {

  override def partition(doc: Document): Document = {
    val bytes = doc.binaryRepresentation.getOrElse(Array.empty[Byte])
    val blocks = PdfText.extractTextBlocksWithBoxes(bytes)
    val els = blocks.filter(b => PdfText.mostlyPrintable(b._1)).zipWithIndex.collect {
      case ((text, bbox), i) if text.nonEmpty =>
        Element.text(i, "NarrativeText", text, bbox = bbox)
    }
    doc.copy(elements = els, docType = doc.docType.orElse(Some("pdf")))
  }
}

object PdfText {
  import graft.model.Bbox

  /** Text-state carried across BT..ET blocks within one content stream
    * (font size and leading are graphics state; position resets at BT). */
  private final class GeomState(var fontSize: Double = 12.0, var leading: Double = 0.0)

  /** Page size from the first /MediaBox, default US Letter. */
  def mediaBox(pdf: Array[Byte]): (Double, Double) = {
    val s = new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)
    val re = "/MediaBox\\s*\\[\\s*([-+.\\d]+)\\s+([-+.\\d]+)\\s+([-+.\\d]+)\\s+([-+.\\d]+)\\s*\\]".r
    re.findFirstMatchIn(s) match {
      case Some(m) =>
        try {
          val w = m.group(3).toDouble - m.group(1).toDouble
          val h = m.group(4).toDouble - m.group(2).toDouble
          if (w > 0 && h > 0) (w, h) else (612.0, 792.0)
        } catch { case _: NumberFormatException => (612.0, 792.0) }
      case None => (612.0, 792.0)
    }
  }

  /**
   * Best-effort geometry of one BT..ET block, in PDF user space (y up):
   * tracks the line position through Td TD Tm T* TL, font size through Tf,
   * and extends the box by ~0.5 x fontSize per shown glyph. A separate pass
   * from `shownText` on purpose — text extraction stays byte-identical, and
   * geometry failures degrade to bbox = None, never to wrong text.
   */
  private def blockGeometry(block: String, st: GeomState): Option[Bbox] = {
    var lineX = 0.0; var lineY = 0.0; var x = 0.0; var y = 0.0
    var minX = Double.MaxValue; var minY = Double.MaxValue
    var maxX = -Double.MaxValue; var maxY = -Double.MaxValue
    var seen = false
    val nums = scala.collection.mutable.ArrayBuffer[Double]()
    def nthLast(k: Int): Double = nums(nums.size - k)
    def record(nChars: Int): Unit = if (nChars > 0) {
      val w = 0.5 * st.fontSize * nChars
      minX = math.min(minX, x); minY = math.min(minY, y)
      maxX = math.max(maxX, x + w); maxY = math.max(maxY, y + st.fontSize)
      x += w; seen = true
    }
    var i = 0
    while (i < block.length) {
      block(i) match {
        case '(' =>
          var depth = 1; var j = i + 1; var n = 0
          while (j < block.length && depth > 0) {
            block(j) match {
              case '\\' if j + 1 < block.length => j += 2; n += 1
              case '(' => depth += 1; j += 1; n += 1
              case ')' => depth -= 1; j += 1; if (depth > 0) n += 1
              case _ => j += 1; n += 1
            }
          }
          record(n); i = j
        case '<' if i + 1 < block.length && block(i + 1) == '<' =>
          // skip a <<...>> dictionary (marked-content props in tagged PDFs:
          // "/P <</MCID 0>> BDC") with nesting — parsing its second '<' as
          // a hex string recorded phantom glyphs at the pre-Tm position and
          // dragged the block bbox to the page origin
          var depth = 1; var j = i + 2
          while (j < block.length && depth > 0) {
            if (block(j) == '<' && j + 1 < block.length && block(j + 1) == '<') {
              depth += 1; j += 2
            } else if (block(j) == '>' && j + 1 < block.length && block(j + 1) == '>') {
              depth -= 1; j += 2
            } else j += 1
          }
          i = j
        case '<' =>
          val end = block.indexOf('>', i + 1)
          val stop = if (end < 0) block.length else end
          record(math.max((stop - i - 1) / 2, 1)); i = stop + 1
        case c if c.isDigit || c == '-' || c == '+' || c == '.' =>
          var j = i + 1
          while (j < block.length && (block(j).isDigit || block(j) == '.')) j += 1
          try nums += block.substring(i, j).toDouble
          catch { case _: NumberFormatException => }
          i = j
        case 'T' if i + 1 < block.length =>
          block(i + 1) match {
            case 'd' =>
              if (nums.size >= 2) { lineX += nthLast(2); lineY += nthLast(1); x = lineX; y = lineY }
              nums.clear(); i += 2
            case 'D' =>
              if (nums.size >= 2) {
                st.leading = -nthLast(1)
                lineX += nthLast(2); lineY += nthLast(1); x = lineX; y = lineY
              }
              nums.clear(); i += 2
            case 'm' =>
              if (nums.size >= 6) { lineX = nthLast(2); lineY = nthLast(1); x = lineX; y = lineY }
              nums.clear(); i += 2
            case '*' => lineY -= st.leading; x = lineX; y = lineY; nums.clear(); i += 2
            case 'L' => if (nums.nonEmpty) st.leading = nthLast(1); nums.clear(); i += 2
            case 'f' => if (nums.nonEmpty) st.fontSize = nthLast(1); nums.clear(); i += 2
            case _ => nums.clear(); i += 2
          }
        case '\'' | '"' => lineY -= st.leading; x = lineX; y = lineY; nums.clear(); i += 1
        case _ => i += 1
      }
    }
    if (seen && minX <= maxX) Some(Bbox(minX, minY, maxX, maxY)) else None
  }

  /** All BT..ET blocks with text AND a normalized (0-1, top-down y) bbox —
    * the layout convention of the reference's partitioners (data/bbox.py:6),
    * so the Marks passes apply unchanged. */
  def extractTextBlocksWithBoxes(pdf: Array[Byte]): Seq[(String, Option[Bbox])] = {
    val streams = contentStreams(pdf)
    val cmap = streams.foldLeft(Map.empty[Int, String]) { (acc, s) =>
      val str = new String(s, java.nio.charset.StandardCharsets.ISO_8859_1)
      if (str.contains("beginbfchar") || str.contains("beginbfrange"))
        acc ++ parseCMap(str)
      else acc
    }
    val (pw, ph) = mediaBox(pdf)
    def clamp(v: Double): Double = math.max(0.0, math.min(1.0, v))
    def norm(b: Bbox): Bbox =
      Bbox(clamp(b.x1 / pw), clamp(1.0 - b.y2 / ph), clamp(b.x2 / pw), clamp(1.0 - b.y1 / ph))
    streams.flatMap { sBytes =>
      val s = new String(sBytes, java.nio.charset.StandardCharsets.ISO_8859_1)
      val st = new GeomState()
      rawBlocks(s).map(b =>
        (shownText(b, cmap).trim, blockGeometry(b, st).map(norm)))
    }
  }

  /** All BT..ET text blocks across all content streams, in stream order.
    * ToUnicode CMaps (beginbfchar/beginbfrange) from every stream are merged
    * and applied to CID-font strings — the approximation is global rather
    * than per-font (per-font wiring needs xref + font-dict resolution), which
    * is exact for single-font documents and best-effort for mixed fonts. */
  def extractTextBlocks(pdf: Array[Byte]): Seq[String] = {
    val streams = contentStreams(pdf)
    val cmap = streams.foldLeft(Map.empty[Int, String]) { (acc, s) =>
      val str = new String(s, java.nio.charset.StandardCharsets.ISO_8859_1)
      if (str.contains("beginbfchar") || str.contains("beginbfrange"))
        acc ++ parseCMap(str)
      else acc
    }
    streams.flatMap(s => textBlocks(s, cmap))
  }

  /** bfchar/bfrange entries of a ToUnicode CMap -> code -> unicode string. */
  def parseCMap(s: String): Map[Int, String] = {
    val out = scala.collection.mutable.Map[Int, String]()
    def hex2cp(h: String): String = {
      // dst may be UTF-16BE of one or more chars
      val clean = h.replaceAll("\\s", "")
      val sb = new StringBuilder
      var i = 0
      while (i + 4 <= clean.length) {
        sb.append(Integer.parseInt(clean.substring(i, i + 4), 16).toChar)
        i += 4
      }
      if (sb.isEmpty && clean.length >= 2)
        sb.append(Integer.parseInt(clean.take(2), 16).toChar)
      sb.toString
    }
    val bfchar = "(?s)beginbfchar(.*?)endbfchar".r
    val pair = "<([0-9a-fA-F]+)>\\s*<([0-9a-fA-F]+)>".r
    bfchar.findAllMatchIn(s).foreach { m =>
      pair.findAllMatchIn(m.group(1)).foreach { p =>
        out(Integer.parseInt(p.group(1), 16)) = hex2cp(p.group(2))
      }
    }
    val bfrange = "(?s)beginbfrange(.*?)endbfrange".r
    val triple = "<([0-9a-fA-F]+)>\\s*<([0-9a-fA-F]+)>\\s*<([0-9a-fA-F]+)>".r
    val arrForm = "<([0-9a-fA-F]+)>\\s*<([0-9a-fA-F]+)>\\s*\\[(.*?)\\]".r
    bfrange.findAllMatchIn(s).foreach { m =>
      val body = m.group(1)
      triple.findAllMatchIn(body).foreach { t =>
        val lo = Integer.parseInt(t.group(1), 16)
        val hi = Integer.parseInt(t.group(2), 16)
        val dst = Integer.parseInt(t.group(3).replaceAll("\\s", "").take(4), 16)
        var c = lo
        while (c <= hi && c - lo < 65536) { out(c) = (dst + (c - lo)).toChar.toString; c += 1 }
      }
      arrForm.findAllMatchIn(body).foreach { a =>
        val lo = Integer.parseInt(a.group(1), 16)
        val dsts = "<([0-9a-fA-F]+)>".r.findAllMatchIn(a.group(3)).map(_.group(1)).toSeq
        dsts.zipWithIndex.foreach { case (d, i) => out(lo + i) = hex2cp(d) }
      }
    }
    out.toMap
  }

  /** Decode raw string bytes: when a CMap exists and 2-byte CIDs mostly map,
    * use the CMap; otherwise treat bytes as Latin-1 (simple fonts). */
  def decodeString(raw: String, cmap: Map[Int, String]): String = {
    if (cmap.isEmpty || raw.isEmpty) return raw
    val cids = (0 until raw.length / 2).map(i =>
      ((raw(2 * i) & 0xff) << 8) | (raw(2 * i + 1) & 0xff))
    val mapped = cids.count(cmap.contains)
    if (cids.nonEmpty && mapped * 5 >= cids.size * 4)
      cids.map(c => cmap.getOrElse(c, "")).mkString
    else {
      // try 1-byte CIDs (simple fonts with ToUnicode)
      val ones = raw.map(_ & 0xff)
      val mapped1 = ones.count(cmap.contains)
      if (mapped1 * 5 >= ones.size * 4) ones.map(c => cmap.getOrElse(c, "")).mkString
      else raw
    }
  }

  /** Locate `stream`/`endstream` payloads; inflate when zlib-compressed. */
  def contentStreams(pdf: Array[Byte]): Seq[Array[Byte]] = {
    val out = scala.collection.mutable.ListBuffer[Array[Byte]]()
    var i = 0
    while (i >= 0 && i < pdf.length) {
      i = indexOf(pdf, "stream", i)
      if (i >= 0) {
        var start = i + "stream".length
        if (start < pdf.length && pdf(start) == '\r') start += 1
        if (start < pdf.length && pdf(start) == '\n') start += 1
        val end = indexOf(pdf, "endstream", start)
        if (end > start) {
          val payload = java.util.Arrays.copyOfRange(pdf, start, end)
          out += inflate(payload).getOrElse(payload)
          i = end + "endstream".length
        } else i = -1
      }
    }
    out.toSeq
  }

  private def inflate(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val inf = new java.util.zip.Inflater()
      inf.setInput(data)
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(chunk)
        if (n > 0) buf.write(chunk, 0, n)
        else if (n == 0 && !inf.finished()) return None
      }
      inf.end()
      if (buf.size == 0) None else Some(buf.toByteArray)
    } catch { case _: Exception => None }

  /** Parse one content stream: BT..ET blocks -> concatenated shown text. */
  def textBlocks(stream: Array[Byte],
                 cmap: Map[Int, String] = Map.empty): Seq[String] = {
    val s = new String(stream, java.nio.charset.StandardCharsets.ISO_8859_1)
    rawBlocks(s).map(b => shownText(b, cmap).trim)
  }

  /** Raw interior of each BT..ET block, in stream order. */
  private def rawBlocks(s: String): Seq[String] = {
    val blocks = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    while (i >= 0 && i < s.length) {
      i = s.indexOf("BT", i)
      if (i >= 0) {
        val end = s.indexOf("ET", i + 2)
        val stop = if (end < 0) s.length else end
        blocks += s.substring(i + 2, stop)
        i = stop + 2
      }
    }
    blocks.toSeq
  }

  /** Text from Tj / TJ / ' / " operators; Td/TD/T* become line breaks. */
  private def shownText(block: String, cmap: Map[Int, String]): String = {
    val sb = new StringBuilder
    var i = 0
    def readString(from: Int): (String, Int) = {
      // literal (…) with \-escapes and balanced parens
      val b = new StringBuilder
      var depth = 1
      var j = from + 1
      while (j < block.length && depth > 0) {
        block(j) match {
          case '\\' if j + 1 < block.length =>
            block(j + 1) match {
              case 'n' => b.append('\n'); j += 2
              case 'r' => b.append('\r'); j += 2
              case 't' => b.append('\t'); j += 2
              case c if c >= '0' && c <= '7' =>
                val oct = block.substring(j + 1, math.min(j + 4, block.length))
                  .takeWhile(ch => ch >= '0' && ch <= '7').take(3)
                b.append(Integer.parseInt(oct, 8).toChar); j += 1 + oct.length
              case c => b.append(c); j += 2
            }
          case '(' => depth += 1; b.append('('); j += 1
          case ')' => depth -= 1; if (depth > 0) b.append(')'); j += 1
          case c => b.append(c); j += 1
        }
      }
      (b.toString, j)
    }
    def readHex(from: Int): (String, Int) = {
      val end = block.indexOf('>', from + 1)
      val stop = if (end < 0) block.length else end
      val hex = block.substring(from + 1, stop).replaceAll("\\s", "")
      val b = new StringBuilder
      var k = 0
      while (k + 1 < hex.length + 1 && k < hex.length) {
        val pair = if (k + 2 <= hex.length) hex.substring(k, k + 2) else hex.substring(k) + "0"
        try b.append(Integer.parseInt(pair, 16).toChar) catch { case _: Exception => }
        k += 2
      }
      (b.toString, stop + 1)
    }
    var lastString: Option[String] = None
    def flush(sep: String = ""): Unit = lastString.foreach { t =>
      sb.append(t).append(sep); lastString = None
    }
    while (i < block.length) {
      block(i) match {
        case '(' =>
          flush(); val (t, j) = readString(i)
          lastString = Some(decodeString(t, cmap)); i = j
        case '<' if i + 1 < block.length && block(i + 1) != '<' =>
          flush(); val (t, j) = readHex(i)
          lastString = Some(decodeString(t, cmap)); i = j
        case 'T' if i + 1 < block.length =>
          block(i + 1) match {
            case 'j' => flush(" "); i += 2          // Tj: show string
            case 'J' => flush(" "); i += 2          // TJ: show array
            case 'd' | 'D' | '*' =>                 // Td/TD/T*: new line
              if (sb.nonEmpty && !sb.endsWith("\n")) sb.append('\n')
              i += 2
            case _ => i += 1
          }
        case '\'' | '"' => flush(" "); i += 1       // ' and ": show + newline
        case _ => i += 1
      }
    }
    flush()
    sb.toString.replaceAll("[ \\t]+", " ").replaceAll(" ?\\n ?", "\n").trim
  }

  /** True when >= 60% of characters are printable-or-whitespace — the guard
    * that keeps ciphertext/unmapped-CID blocks out of the element stream. */
  def mostlyPrintable(s: String): Boolean = {
    if (s.isEmpty) return false
    val ok = s.count(c => c == '\n' || c == '\t' || (c >= ' ' && c != 127 &&
      !Character.isISOControl(c)))
    ok * 5 >= s.length * 3
  }

  private def indexOf(hay: Array[Byte], needle: String, from: Int): Int = {
    val n = needle.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    var i = math.max(from, 0)
    while (i <= hay.length - n.length) {
      var j = 0
      while (j < n.length && hay(i + j) == n(j)) j += 1
      if (j == n.length) return i
      i += 1
    }
    -1
  }
}
