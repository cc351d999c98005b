package graft.model

/**
 * Core data model: the Spark-native re-expression of the reference's
 * Document/Element abstraction (reference: lib/sycamore/sycamore/data/document.py:31,
 * data/element.py:14, data/bbox.py:6).
 *
 * Design departures from the reference (deliberate, Spark-first):
 *   - The reference stores each row as a single pickled binary blob
 *     (document.py:280-288), forcing deserialize/reserialize at every stage.
 *     Here a Document is a real Catalyst row (product encoder), so Tungsten
 *     gives columnar binary layout, whole-stage codegen, and column pruning
 *     for free.
 *   - `properties` is a flat map of dotted-path keys -> string values
 *     ("entity.location" -> "Atlanta"). The reference's dotted-path
 *     addressing (document.py:318) maps 1:1; nested objects flatten to
 *     dotted keys; non-string leaves are stored in canonical string form
 *     with typed getters. Hot fields can be promoted to real columns via
 *     DocSet.withSchema for Catalyst pruning/pushdown.
 *   - `elementIndex` is a first-class Element field rather than
 *     properties["_element_index"] (element.py:27-89): ordering is a core
 *     invariant for the merge/split operators and must survive shuffles.
 *   - No MetadataDocument in the data plane (document.py:334): Spark
 *     lineage + listeners/accumulators carry metrics out-of-band.
 */
final case class Bbox(x1: Double, y1: Double, x2: Double, y2: Double) {
  def width: Double = x2 - x1
  def height: Double = y2 - y1
  def area: Double = math.max(0.0, width) * math.max(0.0, height)
  /** Vertical/horizontal overlap helpers used by the bbox-mark passes. */
  def intersects(o: Bbox): Boolean =
    x1 < o.x2 && o.x1 < x2 && y1 < o.y2 && o.y1 < y2
  def union(o: Bbox): Bbox =
    Bbox(math.min(x1, o.x1), math.min(y1, o.y1), math.max(x2, o.x2), math.max(y2, o.y2))
}

/**
 * One structured cell of an extracted table
 * (reference: data/table.py:29 TableCell — content, row/col spans, header flag).
 */
final case class TableCell(
    content: String,
    rows: Array[Int],
    cols: Array[Int],
    isHeader: Boolean,
    bbox: Option[Bbox]) {
  // Row/col spans must be contiguous once sorted (reference:
  // data/table.py:44-54 __post_init__) — a cell spanning rows {0,2} has no
  // grid meaning, and letting it through silently corrupts the
  // extract_table_properties / markdown grid assembly downstream.
  TableCell.requireContiguous(rows, "rows", content)
  TableCell.requireContiguous(cols, "cols", content)
}

object TableCell {
  private[model] def requireContiguous(span: Array[Int], what: String,
                                       content: String): Unit = {
    val s = span.sorted
    var i = 1
    while (i < s.length) {
      if (s(i - 1) + 1 != s(i))
        throw new IllegalArgumentException(
          s"Found non-contiguous $what ${span.mkString("[", ",", "]")} " +
            s"in TableCell($content)")
      i += 1
    }
  }
}

/**
 * A chunk of a document: paragraph, title, table, image, ...
 * (reference: data/element.py:14; ImageElement :143; TableElement :204 are
 * discriminated here by `elementType` + populated optional fields).
 */
final case class Element(
    elementType: String,
    textRepresentation: Option[String],
    binaryRepresentation: Option[Array[Byte]],
    bbox: Option[Bbox],
    embedding: Option[Array[Float]],
    elementIndex: Int,
    tableCells: Seq[TableCell],
    properties: Map[String, String]) {

  def text: String = textRepresentation.getOrElse("")
  // flatMap(Option(_)) for parity with Document.prop: a column-built map can
  // carry null values; Some(null) would NPE in prompt rendering downstream
  def prop(key: String): Option[String] = properties.get(key).flatMap(Option(_))
  def withText(t: String): Element = copy(textRepresentation = Option(t))
  def withProps(kvs: (String, String)*): Element = copy(properties = properties ++ kvs)
}

object Element {
  def text(idx: Int, elementType: String, text: String,
           bbox: Option[Bbox] = None,
           properties: Map[String, String] = Map.empty): Element =
    Element(elementType, Some(text), None, bbox, None, idx, Nil, properties)
}

/**
 * The unit of data flowing through a DocSet
 * (reference: data/document.py:31 — well-known fields doc_id, lineage_id,
 * type, text/binary representation, elements, embedding, shingles,
 * parent_id, bbox, properties).
 */
final case class Document(
    docId: String,
    lineageId: String,
    docType: Option[String],
    textRepresentation: Option[String],
    binaryRepresentation: Option[Array[Byte]],
    elements: Seq[Element],
    embedding: Option[Array[Float]],
    shingles: Option[Array[Long]],
    parentId: Option[String],
    bbox: Option[Bbox],
    properties: Map[String, String]) {

  def text: String = textRepresentation.getOrElse("")
  // flatMap(Option(_)): a column-built properties map can carry null values
  // for absent source columns; treat those as missing, like the reference's
  // dotted-path null
  def prop(key: String): Option[String] = properties.get(key).flatMap(Option(_))
  def withText(t: String): Document = copy(textRepresentation = Option(t))
  def withProps(kvs: (String, String)*): Document = copy(properties = properties ++ kvs)
  def withProp(k: String, v: String): Document = copy(properties = properties + (k -> v))

  /**
   * Dotted-path field access (reference: document.py:318 field_to_value,
   * utils/nested.py). Missing path -> None, like the reference's null.
   * Paths: "doc_id" | "text_representation" | "type" | "parent_id" |
   * "properties.<dotted.key>" | "elements" is not addressable (match ref).
   */
  def fieldToValue(path: String): Option[String] = path match {
    case "doc_id"              => Option(docId)
    case "lineage_id"          => Option(lineageId)
    case "type"                => docType
    case "text_representation" => textRepresentation
    case "parent_id"           => parentId
    case p if p.startsWith("properties.") => prop(p.stripPrefix("properties."))
    case _ => None
  }

  /** Dotted-path write (reference: document.py:309 set_value_to_field). */
  def setField(path: String, value: String): Document = path match {
    case "doc_id"              => copy(docId = value)
    case "type"                => copy(docType = Some(value))
    case "text_representation" => copy(textRepresentation = Some(value))
    case "parent_id"           => copy(parentId = Some(value))
    case p if p.startsWith("properties.") =>
      withProp(p.stripPrefix("properties."), value)
    case other => throw new IllegalArgumentException(s"unsupported field path: $other")
  }
}

object Document {
  /** Deterministic lineage id derived from content — the reference assigns a
    * random nanoid (data/docid.py); determinism is better for a distributed
    * engine (re-computation stable across task retries). */
  def lineageOf(seed: String): String = {
    val h = java.lang.Long.toUnsignedString(
      scala.util.hashing.MurmurHash3.stringHash(seed).toLong & 0xffffffffL, 36)
    s"lin-$h"
  }

  def of(docId: String, text: String = null, docType: String = null,
         properties: Map[String, String] = Map.empty,
         elements: Seq[Element] = Nil): Document =
    Document(docId, lineageOf(docId), Option(docType), Option(text), None,
      elements, None, None, None, None, properties)
}
