package graft.operators

import graft.model.Element

/**
 * Recursively bisect over-long elements at sentence/clause/word boundaries
 * (reference: lib/sycamore/sycamore/transforms/split_elements.py:12,35-109 —
 * weighted split-point scoring: sentence end > clause punctuation > space,
 * closest to the midpoint wins).
 */
object SplitElements {

  def split(elements: Seq[Element], maxTokens: Int): Seq[Element] =
    elements.flatMap(e => splitOne(e, maxTokens))

  def splitOne(e: Element, maxTokens: Int): Seq[Element] = {
    // a budget under one token cannot terminate (a single unsplittable
    // token always "exceeds" it and splitAt(0) makes no progress)
    require(maxTokens >= 1, s"maxTokens must be >= 1, got $maxTokens")
    val text = e.text
    if (Tokens.count(text) <= maxTokens) Seq(e)
    else {
      val at = bestSplit(text)
      val (l, r) = text.splitAt(at)
      splitOne(e.withText(l.trim), maxTokens) ++
        splitOne(e.withText(r.trim).withProps("_split" -> "true"), maxTokens)
    }
  }

  /** Best split index: scan a window around the midpoint, score candidate
    * boundaries (sentence 3, clause 2, space 1) weighted by proximity to
    * the middle. */
  private[operators] def bestSplit(text: String): Int = {
    val mid = text.length / 2
    val window = math.max(text.length / 4, 1)
    var best = mid
    var bestScore = -1.0
    var i = math.max(1, mid - window)
    val end = math.min(text.length - 1, mid + window)
    while (i < end) {
      val c = text.charAt(i - 1)
      val kind =
        if ((c == '.' || c == '!' || c == '?') && text.charAt(i) == ' ') 3
        else if ((c == ';' || c == ':' || c == ',') && text.charAt(i) == ' ') 2
        else if (text.charAt(i) == ' ') 1
        else 0
      if (kind > 0) {
        val proximity = 1.0 - math.abs(i - mid).toDouble / window
        val score = kind * 10 + proximity
        if (score > bestScore) { bestScore = score; best = i }
      }
      i += 1
    }
    best
  }
}
