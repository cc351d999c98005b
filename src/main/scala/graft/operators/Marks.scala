package graft.operators

import graft.model.{Document, Element}

/**
 * The bbox/mark annotation passes feeding MarkedMerger — the
 * `mark_bbox_preset` pipeline (reference: lib/sycamore/sycamore/
 * transforms/mark_misc.py:15-126 and transforms/bbox_merge.py:106-176).
 * All pure geometry over the element array: perfectly parallel maps.
 */
object Marks {

  // toIntOption, not toInt: properties are free-form strings (JSON ingest
  // can carry anything), and a garbage page_number must degrade to the
  // default page rather than kill the task (the r16 unguarded-.toInt rule)
  private def page(e: Element): Int =
    e.properties.get("page_number").flatMap(_.toIntOption).getOrElse(1)

  /** Order elements by (page, y1, x1) (reference: bbox_merge.py SortByPageBbox). */
  def sortByPageBbox(d: Document): Document =
    d.copy(elements = d.elements.sortBy(e =>
        (page(e), e.bbox.map(_.y1).getOrElse(0.0), e.bbox.map(_.x1).getOrElse(0.0)))
      .zipWithIndex.map { case (e, i) => e.copy(elementIndex = i) })

  /** Mark elements with tiny bboxes `_drop` (reference: mark_misc.py MarkDropTiny). */
  def markDropTiny(minArea: Double = 0.0001)(d: Document): Document =
    mapEls(d) { e =>
      if (e.bbox.exists(_.area < minArea)) e.withProps("_drop" -> "true") else e
    }

  /** Mark header/footer bands `_drop` (reference: bbox_merge.py:106
    * MarkDropHeaderAndFooter — top/bottom fractions of the page). */
  def markDropHeaderFooter(top: Double = 0.05, bottom: Double = 0.95)(d: Document): Document =
    mapEls(d) { e =>
      if (e.bbox.exists(b => b.y2 < top || b.y1 > bottom)) e.withProps("_drop" -> "true") else e
    }

  /** Mark `_break` on page change (reference: mark_misc.py MarkBreakPage). */
  def markBreakPage(d: Document): Document = {
    var prev = Int.MinValue
    mapEls(d) { e =>
      val p = page(e)
      val out = if (p != prev && prev != Int.MinValue) e.withProps("_break" -> "true") else e
      prev = p
      out
    }
  }

  /** Mark `_break` when the x-extent shifts column (reference:
    * bbox_merge.py:135 MarkBreakByColumn — two-column layouts). */
  def markBreakByColumn(d: Document): Document = {
    var prevLeft = Double.NaN
    mapEls(d) { e =>
      val left = e.bbox.map(_.x1).getOrElse(Double.NaN)
      val out =
        if (!prevLeft.isNaN && !left.isNaN && math.abs(left - prevLeft) > 0.3)
          e.withProps("_break" -> "true")
        else e
      prevLeft = left
      out
    }
  }

  /** Mark `_break` when the running token count would exceed the budget
    * (reference: mark_misc.py:126 MarkBreakByTokens). */
  def markBreakByTokens(maxTokens: Int = 512)(d: Document): Document = {
    var acc = 0
    mapEls(d) { e =>
      val t = Tokens.count(e.text)
      if (acc + t > maxTokens) { acc = t; e.withProps("_break" -> "true") }
      else { acc += t; e }
    }
  }

  /** The preset pipeline (reference: docset.py:840 mark_bbox_preset). */
  def bboxPreset(maxTokens: Int = 512)(d: Document): Document =
    (sortByPageBbox _)
      .andThen(markDropTiny())
      .andThen(markDropHeaderFooter())
      .andThen(markBreakPage)
      .andThen(markBreakByColumn)
      .andThen(markBreakByTokens(maxTokens))(d)

  private def mapEls(d: Document)(f: Element => Element): Document =
    d.copy(elements = d.elements.map(f))
}
