package graft.operators

import graft.model.{Bbox, Element}

/** Whitespace token counting shared by merge/split/mark operators
  * (reference: lib/sycamore/sycamore/functions/tokenizer.py). */
object Tokens {
  def count(s: String): Int = {
    val t = s.trim
    if (t.isEmpty) 0 else t.split("\\s+").length
  }
}

/**
 * Combine adjacent elements into chunks — per-doc sequential fold
 * (reference: lib/sycamore/sycamore/transforms/merge_elements.py:19-822).
 * Embarrassingly parallel across docs; order within a doc is the invariant
 * (DocSet.merge sorts by elementIndex first).
 */
trait ElementMerger extends Serializable {
  def merge(elements: Seq[Element]): Seq[Element]

  protected def fuse(a: Element, b: Element): Element = {
    val text = (a.textRepresentation, b.textRepresentation) match {
      case (Some(x), Some(y)) => Some(x + "\n" + y)
      case (x, y) => x.orElse(y)
    }
    val bbox = (a.bbox, b.bbox) match {
      case (Some(x), Some(y)) => Some(x.union(y))
      case (x, y) => x.orElse(y)
    }
    a.copy(textRepresentation = text, bbox = bbox,
      properties = b.properties ++ a.properties) // earlier element wins on conflict
  }
}

/** Greedily pack adjacent text elements up to a token budget
  * (reference: merge_elements.py:58 GreedyTextElementMerger). */
final class GreedyTextElementMerger(maxTokens: Int) extends ElementMerger {
  override def merge(elements: Seq[Element]): Seq[Element] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Element]
    var cur: Option[Element] = None
    var curTokens = 0
    for (e <- elements) {
      val t = Tokens.count(e.text)
      cur match {
        case Some(c) if curTokens + t <= maxTokens =>
          cur = Some(fuse(c, e)); curTokens += t
        case Some(c) =>
          out += c; cur = Some(e); curTokens = t
        case None =>
          cur = Some(e); curTokens = t
      }
    }
    cur.foreach(out += _)
    out.toSeq
  }
}

/** Build sections: a heading (Title/Section-header) starts a new chunk and
  * following content merges into it (reference: merge_elements.py:155
  * GreedySectionMerger). */
final class GreedySectionMerger(maxTokens: Int,
    headingTypes: Set[String] = Set("Title", "Section-header")) extends ElementMerger {
  override def merge(elements: Seq[Element]): Seq[Element] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Element]
    var cur: Option[Element] = None
    var curTokens = 0
    for (e <- elements) {
      val t = Tokens.count(e.text)
      val isHeading = headingTypes.contains(e.elementType)
      cur match {
        case Some(c) if !isHeading && curTokens + t <= maxTokens =>
          cur = Some(fuse(c, e)); curTokens += t
        case Some(c) =>
          out += c; cur = Some(e); curTokens = t
        case None =>
          cur = Some(e); curTokens = t
      }
    }
    cur.foreach(out += _)
    out.toSeq
  }
}

/** Merge according to `_break` / `_drop` marks set by the mark passes
  * (reference: merge_elements.py:347 MarkedMerger — "merge on body, break
  * on _break, drop on _drop"). */
final class MarkedMerger extends ElementMerger {
  override def merge(elements: Seq[Element]): Seq[Element] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Element]
    var cur: Option[Element] = None
    for (e <- elements if !e.properties.contains("_drop")) {
      if (e.properties.contains("_break")) {
        cur.foreach(out += _)
        cur = Some(e.copy(properties = e.properties - "_break"))
      } else cur match {
        case Some(c) => cur = Some(fuse(c, e))
        case None => cur = Some(e)
      }
    }
    cur.foreach(out += _)
    out.toSeq
  }
}

/** Merge a table element with its continuation on the next page when the
  * caption/text matches a continuation pattern (reference:
  * merge_elements.py:424 TableMerger). */
final class TableMerger(continuationPattern: String = "(?i)continued") extends ElementMerger {
  private val re = continuationPattern.r
  override def merge(elements: Seq[Element]): Seq[Element] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Element]
    for (e <- elements) {
      val isTable = e.elementType.equalsIgnoreCase("table")
      val isCont = isTable && re.findFirstIn(e.text).isDefined
      if (isCont && out.nonEmpty && out.last.elementType.equalsIgnoreCase("table")) {
        val prev = out.remove(out.length - 1)
        out += prev.copy(
          textRepresentation = Some(prev.text + "\n" + e.text),
          tableCells = prev.tableCells ++ e.tableCells)
      } else out += e
    }
    out.toSeq
  }
}

/** Prepend the governing section header's text to each element
  * (reference: merge_elements.py:620 HeaderAugmenterMerger). */
final class HeaderAugmenterMerger(
    headingTypes: Set[String] = Set("Title", "Section-header")) extends ElementMerger {
  override def merge(elements: Seq[Element]): Seq[Element] = {
    var header: Option[String] = None
    elements.map { e =>
      if (headingTypes.contains(e.elementType)) { header = Some(e.text); e }
      else header match {
        case Some(h) if e.textRepresentation.isDefined =>
          e.withText(h + "\n" + e.text).withProps("_header" -> h)
        case _ => e
      }
    }
  }
}
