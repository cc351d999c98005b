package graft.operators

import graft.model.{Document, Element}

/** One element of the materialized hierarchy (tree leaf). */
final case class TreeElement(elementIndex: Int, elementType: String,
                             text: String, properties: Map[String, String])

/** One section of the materialized hierarchy: header + child elements. */
final case class TreeSection(sectionId: String, title: String,
                             summary: String, elements: Seq[TreeElement])

/** The reference's HierarchicalDocument shape (document -> section
  * children -> element children) as a STATIC two-level nested schema. */
final case class TreeDocument(docId: String, sections: Seq[TreeSection])

/**
 * Document-structure extraction (reference:
 * lib/sycamore/sycamore/transforms/extract_document_structure.py —
 * StructureBySection :65, StructureByDocument :150, ExtractTextSummaries :243;
 * HierarchicalDocument data/document.py:421).
 *
 * Spark-first representation: the reference replaces the flat element list
 * with a recursive children tree, which a Catalyst product encoder cannot
 * express. The hierarchy here is ANNOTATED onto the flat elements —
 * `_section_id` / `_section_title` properties group elements under their
 * section header, and the per-section text summary lands on the header
 * element — so every doc keeps one schema, shuffles stay cheap, and the
 * tree view (`sections`) is materialized per doc only when an operator
 * needs it (graph extraction).
 */
object DocStructure {

  val SectionId = "_section_id"
  val SectionTitle = "_section_title"

  /** A materialized section of the annotated tree. */
  final case class SectionView(sectionId: String, title: String,
                               header: Element, children: Seq[Element]) {
    /** reference: ExtractTextSummaries.summarize — the section summary fed
      * to graph entity extraction. */
    def summary: String =
      s"-----SECTION TITLE: ${title.trim}-----\n" + children.collect {
        case e if e.text.nonEmpty => s"---Element Type: ${e.elementType.trim}---\n${e.text.trim}\n"
      }.mkString
  }

  /** Group elements under their Section-header; a placeholder front-matter
    * section covers leading elements with no header
    * (reference: StructureBySection.extract). */
  def bySection(doc: Document): Document = {
    val ordered = doc.elements.sortBy(_.elementIndex)
    var sectionIdx = -1
    var title = "Front Matter"
    val annotated = scala.collection.mutable.ListBuffer[Element]()
    ordered.foreach { e =>
      if (e.elementType == "Section-header" && e.text.nonEmpty) {
        sectionIdx += 1
        title = e.text
        annotated += e.withProps(
          SectionId -> s"${doc.docId}#s$sectionIdx", SectionTitle -> title)
      } else {
        if (sectionIdx < 0) sectionIdx = 0 // placeholder front-matter section
        annotated += e.withProps(
          SectionId -> s"${doc.docId}#s$sectionIdx", SectionTitle -> title)
      }
    }
    val withSummaries = attachSummaries(annotated.toSeq)
    doc.copy(elements = withSummaries)
  }

  /** One section spanning the whole document (reference: StructureByDocument). */
  def byDocument(doc: Document): Document = {
    val sid = s"${doc.docId}#s0"
    val annotated = doc.elements.sortBy(_.elementIndex)
      .map(_.withProps(SectionId -> sid, SectionTitle -> "DOCUMENT"))
    doc.copy(elements = attachSummaries(annotated))
  }

  /** Per-section text summary onto the section's header element (or first
    * element when the section has no header). */
  private def attachSummaries(els: Seq[Element]): Seq[Element] = {
    val byId = els.groupBy(_.prop(SectionId).getOrElse(""))
    els.map { e =>
      val sid = e.prop(SectionId).getOrElse("")
      val group = byId(sid)
      val isAnchor = group.headOption.exists(_.elementIndex == e.elementIndex)
      if (!isAnchor) e
      else {
        val view = SectionView(sid, e.prop(SectionTitle).getOrElse(""), e,
          group.filterNot(_.elementIndex == e.elementIndex))
        e.withProps("summary" -> view.summary)
      }
    }
  }

  /** The reference's HierarchicalDocument children tree (document.py:421)
    * as a first-class nested Dataset row — document -> sections ->
    * elements. The reference's recursive any-depth tree exists there
    * because its partitioner emits arbitrary nesting; its structure
    * extractors (StructureBySection/ByDocument) only ever produce this
    * exact two-level shape, which IS encodable as a static Spark schema.
    * Downstream (Neo4j-style) consumers get the actual tree instead of
    * reassembling it from `_section_id` annotations; the flat annotated
    * form stays the shuffle-friendly engine representation. Per-doc local
    * transform — no shuffle, no driver materialization. */
  def tree(doc: Document): TreeDocument = {
    val annotated =
      if (doc.elements.exists(_.prop(SectionId).isDefined)) doc
      else bySection(doc)
    TreeDocument(doc.docId, sections(annotated).map { s =>
      TreeSection(s.sectionId, s.title,
        s.header.prop("summary").getOrElse(""),
        (s.header +: s.children).map(e =>
          TreeElement(e.elementIndex, e.elementType, e.text,
            e.properties - SectionId - SectionTitle - "summary")))
    })
  }

  /** Materialize the section tree view of an annotated doc. */
  def sections(doc: Document): Seq[SectionView] =
    doc.elements.sortBy(_.elementIndex)
      .groupBy(_.prop(SectionId).getOrElse(""))
      .toSeq.sortBy(_._2.head.elementIndex)
      .collect { case (sid, group) if sid.nonEmpty =>
        SectionView(sid, group.head.prop(SectionTitle).getOrElse(""),
          group.head, group.tail)
      }
}
