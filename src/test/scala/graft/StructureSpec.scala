package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._

import graft.docset.DocSet
import graft.llm.{FakeJsonExtractorClient, GraphExtraction, LlmClient}
import graft.model.{Document, Element, TableCell}
import graft.operators.{DocStructure, FakeImageCaptioner, HtmlPartitioner, MultimodalOps}
import graft.sources.{DocRead, DocWrite}

/** Document structure, graph extraction, multimodal ops, and file sink
  * (mirrors reference tests/unit/transforms/test_extract_document_structure.py
  * and the graph-extraction suites, with deterministic fakes). */
class StructureSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  private def sectionedDoc = Document.of("d1", docType = "html").copy(elements = Seq(
    Element.text(0, "NarrativeText", "preamble text"),
    Element.text(1, "Section-header", "Intro"),
    Element.text(2, "NarrativeText", "alpha corp acquired beta inc"),
    Element.text(3, "Section-header", "Details"),
    Element.text(4, "NarrativeText", "gamma llc filed suit"),
    Element.text(5, "List-item", "point one")))

  test("bySection groups elements under headers with a front-matter placeholder") {
    val out = DocStructure.bySection(sectionedDoc)
    val sections = DocStructure.sections(out)
    assert(sections.map(_.title) == Seq("Front Matter", "Intro", "Details"))
    assert(sections(0).children.isEmpty && sections(0).header.text == "preamble text")
    assert(sections(1).children.map(_.text) == Seq("alpha corp acquired beta inc"))
    assert(sections(2).children.map(_.text) == Seq("gamma llc filed suit", "point one"))
    // section summary lands on the anchor element
    val intro = out.elements.find(_.text == "Intro").get
    assert(intro.prop("summary").exists(s =>
      s.contains("SECTION TITLE: Intro") && s.contains("alpha corp")))
  }

  test("byDocument produces a single all-encompassing section") {
    val out = DocStructure.byDocument(sectionedDoc)
    val sections = DocStructure.sections(out)
    assert(sections.size == 1 && sections.head.children.size == 5)
  }

  test("hierarchy() materializes the nested document -> sections -> elements tree") {
    val docs = DocSet.of(spark, Seq(sectionedDoc,
      sectionedDoc.copy(docId = "d2", elements = Seq(
        Element.text(0, "NarrativeText", "only front matter")))))
    val rows = docs.hierarchy().collect().map(t => t.docId -> t).toMap
    val d1 = rows("d1")
    assert(d1.sections.map(_.title) == Seq("Front Matter", "Intro", "Details"))
    // each section's elements INCLUDE its header/anchor, in element order
    assert(d1.sections(1).elements.map(_.text) ==
      Seq("Intro", "alpha corp acquired beta inc"))
    assert(d1.sections(1).summary.contains("SECTION TITLE: Intro"))
    // internal annotations do not leak into the tree leaves
    assert(d1.sections.flatMap(_.elements).forall(e =>
      !e.properties.contains(DocStructure.SectionId) &&
        !e.properties.contains("summary")))
    assert(rows("d2").sections.map(_.title) == Seq("Front Matter"))
    // an already-annotated doc is not re-sectioned (same tree either way)
    val pre = DocSet.of(spark, Seq(DocStructure.bySection(sectionedDoc)))
    assert(pre.hierarchy().collect().head == d1)
    // nested schema is static: sections array of struct with elements array
    val schema = docs.hierarchy().toDF.schema.treeString
    assert(schema.contains("sections") && schema.contains("elements"))
  }

  test("graph entities extract per section and resolve across docs") {
    // fake: "Company" entities = words ending in corp/inc/llc (+ the
    // following word boundary token), pure function of the section summary
    val client = new FakeJsonExtractorClient(Map(
      "Company" -> (t => JArray(
        "\\b(\\w+) (corp|inc|llc)\\b".r.findAllMatchIn(t)
          .map(m => JObject(List("name" -> JString(s"${m.group(1)} ${m.group(2)}"))))
          .toList))))
    val docs = DocSet.of(spark, Seq(
      DocStructure.bySection(sectionedDoc),
      DocStructure.bySection(sectionedDoc.copy(docId = "d2"))))
    val ents = GraphExtraction.extractEntities(docs, client, Seq("Company"))
    val rows = ents.collect()
    // 3 companies x 2 docs
    assert(rows.length == 6)
    assert(rows.forall(_.getAs[String]("label") == "Company"))

    val resolved = GraphExtraction.resolveEntities(ents).collect()
    assert(resolved.length == 3) // cross-doc dedup by content
    assert(resolved.forall(_.getAs[Long]("n_occurrences") == 2L))

    // relationships among co-sectioned entities via a canned responder
    val relClient = new LlmClient {
      def generate(p: String): String = {
        val hashes = "([0-9a-f]{64})".r.findAllIn(p).toSeq.distinct
        if (hashes.size < 2) """{"relationships": []}"""
        else s"""{"relationships": [{"type": "ACQUIRED", "start": "${hashes(0)}", "end": "${hashes(1)}"}]}"""
      }
    }
    val rels = GraphExtraction.extractRelationships(docs, relClient, ents, Seq("ACQUIRED"))
    val relRows = rels.collect()
    // only the Intro section of each doc has 2+ entities (alpha corp, beta inc)
    assert(relRows.length == 2)
    assert(relRows.forall(_.getAs[String]("relType") == "ACQUIRED"))
  }

  test("summarizeImages captions image elements, skips the rest") {
    val doc = Document.of("d1").copy(elements = Seq(
      Element.text(0, "NarrativeText", "see figure"),
      Element("Image", None, Some(Array[Byte](1, 2, 3, 4)), None, None, 1, Nil, Map.empty)))
    val out = MultimodalOps.summarizeImages(doc, new FakeImageCaptioner)
    assert(out.elements(0).prop("summary").isEmpty)
    assert(out.elements(1).prop("summary").exists(_.startsWith("image<4B:")))
    // deterministic across runs
    val again = MultimodalOps.summarizeImages(doc, new FakeImageCaptioner)
    assert(again.elements(1).prop("summary") == out.elements(1).prop("summary"))
  }

  test("llmQuery and extractTableProperties") {
    val d = Document.of("d1", text = "some text").copy(elements = Seq(
      Element("table", Some("t"), None, None, None, 0, Seq(
        TableCell("Name", Array(0), Array(0), isHeader = false, None),
        TableCell("Acme", Array(0), Array(1), isHeader = false, None),
        TableCell("Year", Array(1), Array(0), isHeader = false, None),
        TableCell("2024", Array(1), Array(1), isHeader = false, None)), Map.empty)))
    val q = MultimodalOps.llmQuery(d, new graft.llm.FakeLlmClient("echo:30"), "Q:")
    assert(q.prop("llm_response").contains("Q:\nt"))
    val t = MultimodalOps.extractTableProperties(d)
    assert(t.elements.head.prop("table.Name").contains("Acme"))
    assert(t.elements.head.prop("table.Year").contains("2024"))
  }

  test("writeFiles round-trips through read.binary") {
    val dir = java.nio.file.Files.createTempDirectory("docwrite").toString
    try {
      val docs = (0 until 5).map(i => Document.of(s"doc$i.txt", text = s"content $i"))
      DocSet.of(spark, docs).writeFiles(dir)
      val back = DocRead.binary(spark, dir, "txt")
      val texts = back.takeAll()
        .map(d => new String(d.binaryRepresentation.get, "UTF-8")).sorted
      assert(texts == (0 until 5).map(i => s"content $i"))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("writeJdbc round-trips through an embedded Derby table") {
    val dbDir = java.nio.file.Files.createTempDirectory("derby").toString
    val url = s"jdbc:derby:$dbDir/graftdb;create=true"
    val docs = (0 until 4).map(i =>
      Document.of(s"d$i", text = s"text $i", properties = Map("k" -> i.toString)))
    DocWrite.jdbc(DocSet.of(spark, docs), url, "docs")
    val back = spark.read.jdbc(url, "docs", new java.util.Properties())
    assert(back.count() == 4)
    val row = back.orderBy("doc_id").collect().head
    assert(row.getAs[String]("doc_id") == "d0")
    assert(row.getAs[String]("text_representation") == "text 0")
    assert(row.getAs[String]("properties_json").contains("\"k\":\"0\""))
  }

  test("DocRead.jdbc: typed round trip, subquery pushdown, partitioned read") {
    val dbDir = java.nio.file.Files.createTempDirectory("derbyr").toString
    val url = s"jdbc:derby:$dbDir/graftdb;create=true"
    val docs = (0 until 6).map(i =>
      Document.of(s"d$i", text = s"text $i", docType = "memo",
        properties = Map("k" -> i.toString)))
    DocWrite.jdbc(DocSet.of(spark, docs), url, "docs")
    // typed round trip: write.duckdb -> read.duckdb in the reference
    val back = DocRead.jdbcMaterialized(spark, url, "docs").takeAll().sortBy(_.docId)
    assert(back.map(_.docId) == (0 until 6).map(i => s"d$i"))
    assert(back.head.textRepresentation.contains("text 0"))
    assert(back.head.docType.contains("memo"))
    assert(back.head.prop("k").contains("0"))
    // generic read with subquery pushdown: the WHERE executes in Derby
    // (Spark's JDBC writer creates quoted lowercase identifiers)
    val sub = DocRead.jdbc(spark, url,
      """(SELECT "doc_id", "text_representation" FROM docs
          WHERE CAST("doc_id" AS VARCHAR(32)) <> 'd0') t""",
      docIdField = Some("doc_id"), textField = Some("text_representation"))
    assert(sub.takeAll().map(_.docId).sorted == (1 until 6).map(i => s"d$i"))
    // partitioned read over a numeric column: range-disjoint executor tasks
    spark.range(0, 100).selectExpr("id", "id * 2 AS v")
      .write.mode("overwrite").jdbc(url, "nums", new java.util.Properties())
    val part = DocRead.jdbc(spark, url, "nums", docIdField = Some("id"),
      partitionColumn = Some("id"), lowerBound = 0L, upperBound = 100L,
      numPartitions = 3)
    assert(part.toDF.rdd.getNumPartitions == 3, "range-split into 3 tasks")
    assert(part.toDF.count() == 100L)
    val d7 = part.takeAll().find(_.docId == "7").get
    assert(d7.prop("v").contains("14"))
  }

  test("sanitize keeps distinct rewritten names distinct") {
    assert(DocWrite.sanitize("plain-name.txt") == "plain-name.txt")
    assert(DocWrite.sanitize("a/b") != DocWrite.sanitize("a b"))
  }

  test("PdfPartitioner extracts text from uncompressed and Flate streams") {
    import graft.operators.PdfPartitioner
    def pdfWith(content: Array[Byte], deflate: Boolean): Array[Byte] = {
      val payload = if (!deflate) content else {
        val d = new java.util.zip.Deflater()
        d.setInput(content); d.finish()
        val buf = new Array[Byte](4096)
        val n = d.deflate(buf); d.end()
        java.util.Arrays.copyOf(buf, n)
      }
      val header = ("%PDF-1.4\n1 0 obj\n<< /Length " + payload.length +
        (if (deflate) " /Filter /FlateDecode" else "") +
        " >>\nstream\n").getBytes("ISO-8859-1")
      val footer = "\nendstream\nendobj\ntrailer\n%%EOF".getBytes("ISO-8859-1")
      header ++ payload ++ footer
    }
    val content = ("BT /F1 12 Tf 72 700 Td (Hello) Tj ( World) Tj T* " +
      "[(Tab)-250(ular)] TJ ET\n" +
      "BT 72 600 Td <48657821> Tj ET").getBytes("ISO-8859-1")

    for (deflate <- Seq(false, true)) {
      val doc = Document.of("doc.pdf").copy(
        binaryRepresentation = Some(pdfWith(content, deflate)))
      val out = new PdfPartitioner().partition(doc)
      assert(out.docType.contains("pdf"))
      assert(out.elements.size == 2, s"deflate=$deflate: ${out.elements}")
      assert(out.elements(0).text.contains("Hello World"))
      assert(out.elements(0).text.contains("Tab ular") ||
        out.elements(0).text.contains("Tabular"))
      assert(out.elements(1).text == "Hex!")
    }
  }

  test("PdfPartitioner: page_number_approximate flags a stream/page-count mismatch") {
    import graft.operators.PdfPartitioner
    def pdf(nPageObjs: Int): Array[Byte] = {
      val content = "BT 72 700 Td (Only one text stream) Tj ET"
      val pages = (1 to nPageObjs)
        .map(i => s"$i 0 obj << /Type /Page /Parent 9 0 R >> endobj\n").mkString
      ("%PDF-1.4\n" + pages +
        "8 0 obj << /Length " + content.length + " >>\nstream\n" + content +
        "\nendstream\nendobj\ntrailer\n%%EOF").getBytes("ISO-8859-1")
    }
    // 1 text-bearing stream, 1 /Type /Page: heuristic agrees -> no flag
    val ok = new PdfPartitioner().partition(
      Document.of("one.pdf").copy(binaryRepresentation = Some(pdf(1))))
    assert(ok.elements.nonEmpty)
    assert(ok.elements.forall(!_.properties.contains("page_number_approximate")))
    // 2 /Type /Page objects but 1 text stream (second page is image-only or
    // array-of-/Contents): absolute numbers can't be trusted -> flagged
    val approx = new PdfPartitioner().partition(
      Document.of("two.pdf").copy(binaryRepresentation = Some(pdf(2))))
    assert(approx.elements.nonEmpty)
    assert(approx.elements.forall(_.prop("page_number_approximate").contains("true")))
    // /Type /Pages tree nodes must NOT count as pages
    assert(graft.operators.PdfText.pageObjectCount(
      "9 0 obj << /Type /Pages /Kids [] >> endobj".getBytes("ISO-8859-1")) == 0)
    // incremental updates (Acrobat edit/sign) append REGENERATED copies of
    // the same page objects — distinct-object-number counting must not
    // double-count them (they'd otherwise false-positive the approx flag)
    val incr = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Page >> endobj\n" +
      "8 0 obj << /Length 41 >>\nstream\nBT 72 700 Td (Only one text stream) Tj ET\nendstream\nendobj\n" +
      "trailer\n" +
      "1 0 obj << /Type /Page /Annots [] >> endobj\n%%EOF").getBytes("ISO-8859-1")
    assert(graft.operators.PdfText.pageObjectCount(incr) == 1)
    // page-dict text INSIDE a content stream is data, not structure
    val sneaky = ("1 0 obj << /Type /Page >> endobj\n" +
      "2 0 obj << /Length 30 >>\nstream\n7 0 obj << /Type /Page >> endobj\nendstream\nendobj")
      .getBytes("ISO-8859-1")
    assert(graft.operators.PdfText.pageObjectCount(sneaky) == 1)
  }

  test("PdfPartitioner bboxes: two-column layout drives markBreakByColumn") {
    import graft.operators.{Marks, PdfPartitioner}
    val content = ("BT /F1 12 Tf 1 0 0 1 50 700 Tm (Left one) Tj ET\n" +
      "BT 1 0 0 1 50 680 Tm (Left two) Tj ET\n" +
      "BT 1 0 0 1 350 700 Tm (Right one) Tj ET\n" +
      "BT 1 0 0 1 350 680 Tm (Right two) Tj ET").getBytes("ISO-8859-1")
    val pdf = ("%PDF-1.4\n1 0 obj << /MediaBox [0 0 600 800] >> endobj\n" +
      "2 0 obj << /Length " + content.length + " >>\nstream\n").getBytes("ISO-8859-1") ++
      content ++ "\nendstream\nendobj\ntrailer\n%%EOF".getBytes("ISO-8859-1")
    val doc = new PdfPartitioner().partition(
      Document.of("two-col.pdf").copy(binaryRepresentation = Some(pdf)))
    assert(doc.elements.size == 4)
    assert(doc.elements.forall(_.bbox.isDefined))
    val boxes = doc.elements.flatMap(_.bbox)
    // x normalized by the 600pt MediaBox; y top-down (700pt line near the top)
    assert(math.abs(boxes(0).x1 - 50.0 / 600) < 1e-9)
    assert(math.abs(boxes(2).x1 - 350.0 / 600) < 1e-9)
    assert(math.abs(boxes(0).y1 - (1.0 - 712.0 / 800)) < 1e-9)
    assert(boxes(1).y1 > boxes(0).y1, "lower line has larger top-down y")
    val marked = Marks.markBreakByColumn(doc)
    assert(marked.elements(2).prop("_break").contains("true"),
      "column jump 50 -> 350 must mark a break")
    assert(Seq(0, 1, 3).forall(i => marked.elements(i).prop("_break").isEmpty))
  }

  test("PdfPartitioner: a marked-content <<...>> dict does not corrupt the bbox") {
    import graft.operators.PdfPartitioner
    // tagged-PDF shape: the dict precedes Tm — parsing its second '<' as a
    // hex string used to record phantom glyphs at the (0,0) pre-Tm position
    val content = ("BT /P <</MCID 0>> BDC 1 0 0 1 50 700 Tm (Hi) Tj EMC ET")
      .getBytes("ISO-8859-1")
    val pdf = ("%PDF-1.4\n1 0 obj << /MediaBox [0 0 600 800] >> endobj\n" +
      "2 0 obj << /Length " + content.length + " >>\nstream\n").getBytes("ISO-8859-1") ++
      content ++ "\nendstream\nendobj\ntrailer\n%%EOF".getBytes("ISO-8859-1")
    val doc = new PdfPartitioner().partition(
      Document.of("tagged.pdf").copy(binaryRepresentation = Some(pdf)))
    val b = doc.elements.head.bbox.get
    assert(math.abs(b.x1 - 50.0 / 600) < 1e-9,
      s"bbox dragged to the origin by the dict: $b")
  }

  test("PdfPartitioner bboxes follow Td/TD/T* line motion without Tm") {
    import graft.operators.PdfPartitioner
    val content = ("BT /F2 10 Tf 14 TL 72 720 Td (First) Tj T* (Second) Tj ET")
      .getBytes("ISO-8859-1")
    val pdf = ("%PDF-1.4\n1 0 obj << /MediaBox [0 0 612 792] >> endobj\n" +
      "2 0 obj << /Length " + content.length + " >>\nstream\n").getBytes("ISO-8859-1") ++
      content ++ "\nendstream\nendobj\ntrailer\n%%EOF".getBytes("ISO-8859-1")
    val doc = new PdfPartitioner().partition(
      Document.of("lines.pdf").copy(binaryRepresentation = Some(pdf)))
    assert(doc.elements.size == 1)
    val b = doc.elements.head.bbox.get
    // block spans 720 down to 720-14=706, plus 10pt glyph height on top
    assert(math.abs(b.x1 - 72.0 / 612) < 1e-9)
    assert(math.abs(b.y2 - (1.0 - 706.0 / 792)) < 1e-9)
    assert(math.abs(b.y1 - (1.0 - 730.0 / 792)) < 1e-9)
  }

  test("HtmlPartitioner handles unclosed <p>/<li> via implied close") {
    val html = """<html><title>T</title><body>
      <h1>Head</h1>
      <p>first unclosed para
      <p>second with <b>bold</b> inline
      <ul><li>item a<li>item b</ul>
      <script>var x = "<p>not content</p>";</script>
      <p>tail</body></html>"""
    val out = new HtmlPartitioner().partition(Document.of("h", text = html))
    val byType = out.elements.map(e => (e.elementType, e.text))
    assert(byType.contains(("Title", "T")))
    assert(byType.contains(("Section-header", "Head")))
    assert(byType.count(_._1 == "NarrativeText") == 3)
    assert(byType.contains(("NarrativeText", "second with bold inline")))
    assert(byType.contains(("List-item", "item a")) && byType.contains(("List-item", "item b")))
    assert(!byType.exists(_._2.contains("not content")))
  }

  test("TableCell rejects non-contiguous spans (reference data/table.py:44)") {
    // contiguous spans construct fine, in any order
    TableCell("ok", Array(0, 1), Array(2, 3, 4), isHeader = false, None)
    TableCell("unsorted ok", Array(2, 1, 0), Array(0), isHeader = false, None)
    TableCell("single", Array(5), Array(7), isHeader = true, None)
    // a gap in either span is a construction error
    assertThrows[IllegalArgumentException](
      TableCell("bad rows", Array(0, 2), Array(0), isHeader = false, None))
    assertThrows[IllegalArgumentException](
      TableCell("bad cols", Array(1), Array(3, 5), isHeader = false, None))
    assertThrows[IllegalArgumentException](
      TableCell("dup row", Array(1, 1), Array(0), isHeader = false, None))
  }

  // ------------------------------------------------------------ OOXML

  private def zipOf(entries: (String, String)*): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(buf)
    entries.foreach { case (name, content) =>
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    z.close()
    buf.toByteArray
  }

  test("Ooxml.zipEntries: zip-bomb entries are skipped, small entries survive") {
    import graft.operators.Ooxml
    // a ~70 MB-inflating entry (zeros compress to ~70 KB) must be skipped
    // by the 64 MB per-entry cap; the ordinary sibling entry still parses
    val buf = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(buf)
    z.putNextEntry(new java.util.zip.ZipEntry("word/bomb.xml"))
    val zeros = new Array[Byte](1 << 20)
    (0 until 70).foreach(_ => z.write(zeros))
    z.closeEntry()
    z.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    z.write("<w:document>ok</w:document>".getBytes("UTF-8"))
    z.closeEntry()
    z.close()
    val got = Ooxml.zipEntries(buf.toByteArray, _.startsWith("word/"))
    assert(got.map(_._1) == Seq("word/document.xml"),
      s"bomb entry must be skipped, got ${got.map(_._1)}")
    assert(new String(got.head._2, "UTF-8").contains("ok"))
  }

  test("DocxPartitioner: styles, lists, tables, escapes, break/tab runs") {
    import graft.operators.DocxPartitioner
    val xml = """<?xml version="1.0"?><w:document><w:body>
      <w:p><w:pPr><w:pStyle w:val="Title"/></w:pPr><w:r><w:t>Doc Title</w:t></w:r></w:p>
      <w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr><w:r><w:t>Intro &amp; Scope</w:t></w:r></w:p>
      <w:p><w:pPr><w:outlineLvl w:val="1"/></w:pPr><w:r><w:t>Styled via outline</w:t></w:r></w:p>
      <w:p><w:pPr><w:numPr><w:ilvl w:val="0"/></w:numPr></w:pPr><w:r><w:t>first bullet</w:t></w:r></w:p>
      <w:p><w:r><w:t xml:space="preserve">Body one</w:t></w:r><w:r><w:t> and two</w:t></w:r></w:p>
      <w:p><w:r><w:t>line a</w:t><w:br/><w:t>line b</w:t><w:tab/><w:t>cell</w:t></w:r></w:p>
      <w:tbl><w:tr><w:tc><w:p><w:r><w:t>h1</w:t></w:r></w:p></w:tc>
        <w:tc><w:p><w:r><w:t>h2</w:t></w:r></w:p></w:tc></w:tr>
        <w:tr><w:tc><w:p><w:r><w:t>v1</w:t></w:r></w:p></w:tc>
        <w:tc><w:p><w:r><w:t>v&lt;2&gt;</w:t></w:r></w:p></w:tc></w:tr></w:tbl>
      <w:p><w:r><w:t>after table</w:t></w:r></w:p>
      </w:body></w:document>"""
    val doc = new DocxPartitioner().partition(graft.model.Document.of("x.docx")
      .copy(binaryRepresentation = Some(zipOf("word/document.xml" -> xml))))
    val els = doc.elements
    assert(doc.docType.contains("docx"))
    assert(els.map(_.elementType) == Seq("Title", "Section-header", "Section-header",
      "List-item", "NarrativeText", "NarrativeText", "table", "NarrativeText"))
    assert(els(0).text == "Doc Title")
    assert(els(1).text == "Intro & Scope")
    assert(els(4).text == "Body one and two")
    assert(els(5).text == "line a\nline b\tcell")
    // structured cells; interior w:p's NOT re-emitted as paragraphs
    val cells = els(6).tableCells
    assert(cells.map(_.content) == Seq("h1", "h2", "v1", "v<2>"))
    assert(cells.map(c => (c.rows.head, c.cols.head)) ==
      Seq((0, 0), (0, 1), (1, 0), (1, 1)))
    assert(els(7).text == "after table")
    // element order follows document order (table between paragraphs)
    assert(els.map(_.elementIndex) == (0 until 8))
  }

  test("DocxPartitioner tables: gridSpan and vMerge become cell spans") {
    import graft.operators.DocxPartitioner
    val xml = """<w:document><w:body><w:tbl>
      <w:tr><w:trPr><w:tblHeader/></w:trPr>
        <w:tc><w:p><w:r><w:t>h1</w:t></w:r></w:p></w:tc>
        <w:tc><w:tcPr><w:gridSpan w:val="2"/></w:tcPr><w:p><w:r><w:t>h23</w:t></w:r></w:p></w:tc></w:tr>
      <w:tr><w:tc><w:tcPr><w:vMerge w:val="restart"/></w:tcPr><w:p><w:r><w:t>a</w:t></w:r></w:p></w:tc>
        <w:tc><w:p><w:r><w:t>b</w:t></w:r></w:p></w:tc>
        <w:tc><w:p><w:r><w:t>c</w:t></w:r></w:p></w:tc></w:tr>
      <w:tr><w:tc><w:tcPr><w:vMerge/></w:tcPr><w:p/></w:tc>
        <w:tc><w:p><w:r><w:t>d</w:t></w:r></w:p></w:tc>
        <w:tc><w:p><w:r><w:t>e</w:t></w:r></w:p></w:tc></w:tr>
      </w:tbl></w:body></w:document>"""
    val doc = new DocxPartitioner().partition(graft.model.Document.of("m.docx")
      .copy(binaryRepresentation = Some(zipOf("word/document.xml" -> xml))))
    val cells = doc.elements.head.tableCells
    assert(cells.map(_.content).toSet == Set("h1", "h23", "a", "b", "c", "d", "e"))
    val h23 = cells.find(_.content == "h23").get
    assert(h23.isHeader && h23.cols.toSeq == Seq(1, 2) && h23.rows.toSeq == Seq(0))
    assert(!cells.find(_.content == "b").get.isHeader)
    val a = cells.find(_.content == "a").get
    assert(a.rows.toSeq == Seq(1, 2) && a.cols.toSeq == Seq(0),
      s"vMerge restart spans down: $a")
    // the markdown grid flattens the spans
    val md = graft.operators.Markdown.toMarkdown(doc).text
    assert(md.startsWith("| h1 | h23 | h23 |"), md)
  }

  test("PptxPartitioner: slide order, title placeholders, chrome skipped") {
    import graft.operators.PptxPartitioner
    def slide(title: String, body: String, extra: String = "") =
      s"""<p:sld><p:cSld><p:spTree>
         <p:sp><p:nvSpPr><p:nvPr><p:ph type="title"/></p:nvPr></p:nvSpPr>
           <p:txBody><a:p><a:r><a:t>$title</a:t></a:r></a:p></p:txBody></p:sp>
         <p:sp><p:nvSpPr><p:nvPr/></p:nvSpPr>
           <p:txBody><a:p><a:r><a:t>$body</a:t></a:r></a:p></p:txBody></p:sp>
         $extra
         </p:spTree></p:cSld></p:sld>"""
    val chrome = """<p:sp><p:nvSpPr><p:nvPr><p:ph type="sldNum"/></p:nvPr></p:nvSpPr>
      <p:txBody><a:p><a:r><a:t>2</a:t></a:r></a:p></p:txBody></p:sp>"""
    // entry order deliberately 10-before-2 in the zip; slide NUMBER must win
    val doc = new PptxPartitioner().partition(graft.model.Document.of("x.pptx")
      .copy(binaryRepresentation = Some(zipOf(
        "ppt/slides/slide10.xml" -> slide("Last Slide", "closing remarks"),
        "ppt/slides/slide1.xml" -> slide("First Slide", "opening text"),
        "ppt/slides/slide2.xml" -> slide("Mid", "middle", chrome)))))
    val els = doc.elements
    assert(els.map(e => (e.elementType, e.text)) == Seq(
      ("Title", "First Slide"), ("NarrativeText", "opening text"),
      ("Title", "Mid"), ("NarrativeText", "middle"),
      ("Title", "Last Slide"), ("NarrativeText", "closing remarks")))
    assert(els.map(_.prop("page_number").get) == Seq("1", "1", "2", "2", "10", "10"))
    assert(!els.exists(_.text == "2"), "slide-number chrome must be skipped")
  }

  test("HtmlPartitioner extractTables: grid spans, headers, nested skipped, chrome dropped") {
    import graft.operators.HtmlPartitioner
    val html = """<html><header><p>site chrome</p></header><body>
      <p>before</p>
      <table>
        <tr><th>h1</th><th colspan="2">h23</th></tr>
        <tr><td rowspan="2">a</td><td>b</td><td>c</td></tr>
        <tr><td>d</td><td>e</td></tr>
      </table>
      <table><tr><td>outer<table><tr><td>inner</td></tr></table></td></tr></table>
      <footer><p>footer junk</p></footer></body></html>"""
    val doc = new HtmlPartitioner(extractTables = true).partition(
      graft.model.Document.of("t.html").copy(
        binaryRepresentation = Some(html.getBytes("UTF-8"))))
    // chrome dropped, table CELL text not re-emitted as blocks... cells ARE
    // block tags, so they appear as TableText elements too (legacy text
    // path) — the structured table rides alongside
    assert(!doc.elements.exists(_.text.contains("site chrome")))
    assert(!doc.elements.exists(_.text.contains("footer junk")))
    val tables = doc.elements.filter(_.elementType == "table")
    assert(tables.size == 2, s"outer-with-nested skipped, inner kept: $tables")
    val cells = tables.head.tableCells
    assert(cells.size == 7) // h1, h23, a, b, c, d, e
    val h23 = cells.find(_.content == "h23").get
    assert(h23.isHeader && h23.cols.toSeq == Seq(1, 2) && h23.rows.toSeq == Seq(0))
    val a = cells.find(_.content == "a").get
    assert(a.rows.toSeq == Seq(1, 2) && a.cols.toSeq == Seq(0))
    // rowspan blocks the slot below: row 2's first free column is 1
    val d = cells.find(_.content == "d").get
    assert(d.rows.toSeq == Seq(2) && d.cols.toSeq == Seq(1))
    assert(tables.last.tableCells.map(_.content) == Seq("inner"))
    // markdown renders the grid with the span flattened
    val md = graft.operators.Markdown.toMarkdown(
      doc.copy(elements = Seq(tables.head))).text
    assert(md.startsWith("| h1 | h23 | h23 |"), md)
    assert(md.contains("| a | d | e |"), md)
  }

  test("PptxPartitioner: DrawingML tables with merges; notes without digit chrome") {
    import graft.operators.PptxPartitioner
    val slide = """<p:sld><p:cSld><p:spTree>
      <p:graphicFrame><a:tbl>
        <a:tblPr firstRow="1"><a:tableStyleId>{guid}</a:tableStyleId></a:tblPr>
        <a:tr><a:tc><a:txBody><a:p><a:r><a:t>h1</a:t></a:r></a:p></a:txBody></a:tc>
          <a:tc gridSpan="2"><a:txBody><a:p><a:r><a:t>h23</a:t></a:r></a:p></a:txBody></a:tc>
          <a:tc hMerge="1"/></a:tr>
        <a:tr><a:tc rowSpan="2"><a:txBody><a:p><a:r><a:t>a</a:t></a:r></a:p></a:txBody></a:tc>
          <a:tc><a:txBody><a:p><a:r><a:t>b</a:t></a:r></a:p></a:txBody></a:tc>
          <a:tc><a:txBody><a:p><a:r><a:t>c</a:t></a:r></a:p></a:txBody></a:tc></a:tr>
        <a:tr><a:tc vMerge="1"/><a:tc><a:txBody><a:p><a:r><a:t>d</a:t></a:r></a:p></a:txBody></a:tc>
          <a:tc><a:txBody><a:p><a:r><a:t>e</a:t></a:r></a:p></a:txBody></a:tc></a:tr>
      </a:tbl></p:graphicFrame>
      </p:spTree></p:cSld></p:sld>"""
    val notes = """<p:notes><p:cSld><p:spTree><p:sp><p:txBody>
      <a:p><a:r><a:t>Speaker reminder: demo the search flow.</a:t></a:r></a:p>
      <a:p><a:r><a:t>7</a:t></a:r></a:p>
      </p:txBody></p:sp></p:spTree></p:cSld></p:notes>"""
    val doc = new PptxPartitioner().partition(graft.model.Document.of("t.pptx")
      .copy(binaryRepresentation = Some(zipOf(
        "ppt/slides/slide7.xml" -> slide,
        "ppt/notesSlides/notesSlide7.xml" -> notes))))
    val table = doc.elements.find(_.elementType == "table").get
    val cells = table.tableCells
    assert(cells.map(_.content).toSet == Set("h1", "h23", "a", "b", "c", "d", "e"))
    val h23 = cells.find(_.content == "h23").get
    assert(h23.isHeader && h23.cols.toSeq == Seq(1, 2))
    val a = cells.find(_.content == "a").get
    assert(a.rows.toSeq == Seq(1, 2) && a.cols.toSeq == Seq(0))
    // merge-continuation cells are positions, not content
    assert(cells.count(_.content.isEmpty) == 0)
    val noteEls = doc.elements.filter(_.elementType == "Notes")
    assert(noteEls.map(_.text) == Seq("Speaker reminder: demo the search flow."))
    assert(noteEls.head.prop("page_number").contains("7"))
  }

  test("PptxPartitioner: row 0 is NOT a header without tblPr firstRow") {
    import graft.operators.PptxPartitioner
    // DrawingML has no implicit header row: absent (or zero) firstRow on
    // tblPr must leave every cell isHeader=false
    val slide = """<p:sld><p:cSld><p:spTree>
      <p:graphicFrame><a:tbl>
        <a:tblPr firstRow="0" bandRow="1"/>
        <a:tr><a:tc><a:txBody><a:p><a:r><a:t>x</a:t></a:r></a:p></a:txBody></a:tc>
          <a:tc><a:txBody><a:p><a:r><a:t>y</a:t></a:r></a:p></a:txBody></a:tc></a:tr>
        <a:tr><a:tc><a:txBody><a:p><a:r><a:t>z</a:t></a:r></a:p></a:txBody></a:tc>
          <a:tc><a:txBody><a:p><a:r><a:t>w</a:t></a:r></a:p></a:txBody></a:tc></a:tr>
      </a:tbl></p:graphicFrame>
      <p:graphicFrame><a:tbl>
        <a:tr><a:tc><a:txBody><a:p><a:r><a:t>p</a:t></a:r></a:p></a:txBody></a:tc></a:tr>
      </a:tbl></p:graphicFrame>
      </p:spTree></p:cSld></p:sld>"""
    val doc = new PptxPartitioner().partition(graft.model.Document.of("t.pptx")
      .copy(binaryRepresentation = Some(zipOf("ppt/slides/slide1.xml" -> slide))))
    val tables = doc.elements.filter(_.elementType == "table")
    assert(tables.size == 2)
    // firstRow="0": explicit opt-out; no tblPr at all: same result
    assert(tables.forall(_.tableCells.forall(!_.isHeader)))
    assert(tables.head.tableCells.map(_.content) == Seq("x", "y", "z", "w"))
  }

  test("HtmlPartitioner: chrome with nested script stays skipped; implied-close table cells parse") {
    import graft.operators.HtmlPartitioner
    // a <script> INSIDE <header> must not clear the header skip (the
    // single-slot-skipping regression): real site headers are full of them
    val html = """<html><body>
      <header><script>nav()</script><p>Site menu | Login</p></header>
      <p>real body</p>
      <table><tr><td>a<td rowspan="2">b<tr><td>c</table>
      <footer><style>.x{}</style><p>copyright chrome</p></footer>
      </body></html>"""
    val doc = new HtmlPartitioner(extractTables = true).partition(
      graft.model.Document.of("t.html").copy(
        binaryRepresentation = Some(html.getBytes("UTF-8"))))
    assert(!doc.elements.exists(_.text.contains("Site menu")),
      s"header chrome leaked: ${doc.elements.map(_.text)}")
    assert(!doc.elements.exists(_.text.contains("copyright chrome")))
    assert(doc.elements.exists(_.text == "real body"))
    // td/tr imply-close per the HTML spec — paired open..close regexes
    // would find zero cells here
    val cells = doc.elements.filter(_.elementType == "table").head.tableCells
    assert(cells.map(_.content).toSet == Set("a", "b", "c"), cells.toString)
    val b = cells.find(_.content == "b").get
    assert(b.rows.toSeq == Seq(0, 1) && b.cols.toSeq == Seq(1))
    val c = cells.find(_.content == "c").get
    assert(c.rows.toSeq == Seq(1) && c.cols.toSeq == Seq(0))
  }

  test("mostlyPrintable: non-Latin scripts pass; high-Latin-1 garbage fails") {
    import graft.operators.PdfText
    // correctly CMap-decoded CJK / Cyrillic / Greek text has ZERO ASCII
    // letters — an ASCII-ratio guard would drop whole non-Latin corpora
    assert(PdfText.mostlyPrintable("这是一个中文句子，用来测试文本提取。"))
    assert(PdfText.mostlyPrintable("Это предложение на русском языке для проверки."))
    assert(PdfText.mostlyPrintable("Αυτή είναι μια ελληνική πρόταση."))
    // a LONG CJK block (no spaces — one giant 'token') still passes
    assert(PdfText.mostlyPrintable("中文文本没有空格分词" * 60))
    // Latin-1-decoded garbage is dominated by high-Latin-1 letters
    val garbage = (0xa0 to 0xff).map(_.toChar).mkString * 4
    assert(!PdfText.mostlyPrintable(garbage))
    // accented European text is mostly ASCII letters -> passes
    assert(PdfText.mostlyPrintable("Le café était très fréquenté cet été à Orléans."))
  }

  test("DocxPartitioner: attributed breaks and tabs keep separators") {
    import graft.operators.DocxPartitioner
    val xml = """<w:document><w:body><w:p><w:r><w:t>end of page</w:t></w:r>
      <w:r><w:br w:type="page"/></w:r><w:r><w:t>Next section</w:t></w:r>
      <w:r><w:tab w:val="left"/><w:t>tabbed</w:t></w:r></w:p></w:body></w:document>"""
    val doc = new DocxPartitioner().partition(graft.model.Document.of("b.docx")
      .copy(binaryRepresentation = Some(zipOf("word/document.xml" -> xml))))
    assert(doc.elements.head.text == "end of page\nNext section\ttabbed",
      doc.elements.head.text)
  }

  test("TranscriptPartitioner: utterances with start/end/speaker chaining") {
    import graft.operators.TranscriptPartitioner
    val t = """[00:00:01] Alice Hello there, how are you?
      |[00:00:05] Bob Doing well, thanks.
      |not a transcript line
      |[00:00:09] Alice Great.""".stripMargin
    val doc = new TranscriptPartitioner().partition(
      graft.model.Document.of("call.txt").copy(textRepresentation = Some(t)))
    val els = doc.elements
    assert(els.size == 3)
    assert(els(0).text == "Hello there, how are you?")
    assert(els(0).prop("speaker").contains("Alice"))
    assert(els(0).prop("start_time").contains("[00:00:01]"))
    assert(els(0).prop("end_time").contains("[00:00:05]"))
    assert(els(2).prop("end_time").contains("N/A"))
  }

  test("PdfCrypt: RC4 vectors, AESV2 round-trip with per-object keys") {
    import graft.operators.PdfCrypt
    // RFC 6229-style known RC4 vector: key "Key", plaintext "Plaintext"
    val rc4 = PdfCrypt.rc4("Key".getBytes("ISO-8859-1"), "Plaintext".getBytes("ISO-8859-1"))
    assert(rc4.map(b => f"$b%02x").mkString == "bbf316e8d940af0ad3")
    // rc4 is its own inverse
    assert(new String(PdfCrypt.rc4("Key".getBytes, rc4)) == "Plaintext")

    // AESV2: encrypt a payload with the SAME per-object key derivation the
    // decryptor uses (MD5(fileKey + obj/gen LE + sAlT), 16-byte IV prefix,
    // PKCS#5 pad), then prove Crypt.decrypt round-trips it
    val fileKey = (1 to 16).map(_.toByte).toArray
    val (objNum, gen) = (42, 0)
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(fileKey)
    md.update(Array(42, 0, 0, 0, 0).map(_.toByte)) // obj 42 LE24, gen 0 LE16
    md.update(Array(0x73, 0x41, 0x6c, 0x54).map(_.toByte))
    val objKey = md.digest().take(16)
    val plain = "BT /F1 12 Tf (secret text) Tj ET".getBytes("ISO-8859-1")
    val padLen = 16 - plain.length % 16
    val padded = plain ++ Array.fill(padLen)(padLen.toByte)
    val iv = (100 until 116).map(_.toByte).toArray
    val cipher = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    cipher.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(objKey, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    val enc = iv ++ cipher.doFinal(padded)
    val out = PdfCrypt.Crypt(fileKey, aes = true).decrypt(objNum, gen, enc)
    assert(new String(out, "ISO-8859-1") == "BT /F1 12 Tf (secret text) Tj ET")
    // truncated/garbage ciphertext degrades to empty, never throws
    assert(PdfCrypt.Crypt(fileKey, aes = true).decrypt(1, 0, Array[Byte](1, 2, 3)).isEmpty)
  }

  test("TextPartitioner: blank-line paragraphs; no blank lines -> one element") {
    import graft.operators.TextPartitioner
    val d = new TextPartitioner().partition(graft.model.Document.of("a.txt")
      .copy(binaryRepresentation = Some("p one\nstill one\n\n  \np two".getBytes("UTF-8"))))
    assert(d.elements.map(_.text) == Seq("p one\nstill one", "p two"))
    val single = new TextPartitioner().partition(graft.model.Document.of("b.txt")
      .copy(textRepresentation = Some("only\nlines\nhere")))
    assert(single.elements.map(_.text) == Seq("only\nlines\nhere"))
  }
}
